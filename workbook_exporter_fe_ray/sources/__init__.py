from .parquet import read_input, read_points_input, read_tier

__all__ = ["read_input", "read_points_input", "read_tier"]
