from .formats import read_auto
from .parquet import (
    good_num_blocks,
    normalize_schema,
    read_input,
    read_points_input,
    read_table,
    read_tier,
)

__all__ = [
    "good_num_blocks",
    "read_auto",
    "normalize_schema",
    "read_input",
    "read_points_input",
    "read_table",
    "read_tier",
]
