"""Parquet sources with projection pushdown.

Reference parity: ``read_input_file`` (``/root/reference/
workbook_exporter-fe.py:1703-1714``) reads the whole CSV/Excel file into
one in-memory DataFrame — and each of up to 21 exporters re-reads it.
Here a read is a lazy, streaming ``ray.data.Dataset`` of Arrow blocks,
and column pruning happens *at the read* so the wide ``tokens`` list
column never leaves storage unless a stage actually needs it.
"""

from __future__ import annotations

import ray.data


def read_input(paths: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the tokenized-sequence input table (full schema by default)."""
    return ray.data.read_parquet(paths, columns=columns)


def read_points_input(paths: str | list[str]) -> ray.data.Dataset:
    """Read only what point derivation needs: (doc_id, n_tok, source).

    The ``tokens`` column (≫99% of input bytes) is pruned at the
    row-group reader — this is the single biggest IO win at 100 TB.
    """
    return ray.data.read_parquet(paths, columns=["doc_id", "n_tok", "source"])


def read_tier(tier_dir: str) -> ray.data.Dataset:
    """Read a previously-materialized tier (cascade input / resume)."""
    return ray.data.read_parquet(tier_dir)
