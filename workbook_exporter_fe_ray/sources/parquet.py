"""Parquet sources with projection pushdown.

Reference parity: ``read_input_file`` (``/root/reference/
workbook_exporter-fe.py:1703-1714``) reads the whole CSV/Excel file into
one in-memory DataFrame — and each of up to 21 exporters re-reads it.
Here a read is a lazy, streaming ``ray.data.Dataset`` of Arrow blocks,
and column pruning happens *at the read* so the wide ``tokens`` list
column never leaves storage unless a stage actually needs it.
"""

from __future__ import annotations

import os

import ray
import ray.data

# ~128 MB compressed per block: big enough that per-task scheduling
# overhead is noise, small enough that a block × concurrency fits a
# worker heap and stragglers stay short.
TARGET_BLOCK_BYTES = 128 * 1024 * 1024
# never split below ~1 MB/block: a tiny table fanned out to 2×CPUs
# sub-10KB blocks is pure per-task overhead (measured 2.6 s → 0.5 s on
# a 2000-row ANN query at 32 CPUs)
MIN_BLOCK_BYTES = 1 * 1024 * 1024
# small-JOB split target: when the 128 MB sizing can't give every core
# ~8 waves of tasks, straggler skew dominates the wall (the post-shuffle
# reduce partitions inherit the read's block count, and group skew makes
# task durations vary ~2.6×) — split down to ~8 MB blocks instead.
# Measured on the 102M-point scaling corpus: 16→64 blocks took the
# 8-cpu flagship 60.7→48.8 s; at 100 TB bytes//128 MB ≫ 8×cores and
# this refinement is a dead branch.
SMALL_TARGET_BLOCK_BYTES = 8 * 1024 * 1024


def good_num_blocks(
    paths: str | list[str],
    min_per_cpu: int = 2,
    min_block_bytes: int = MIN_BLOCK_BYTES,
) -> int | None:
    """Size-aware block count:
    ``clamp(bytes/min_block_bytes)(min_per_cpu × CPUs .. bytes/128MB)``.

    On tiny inputs this stops Ray from fragmenting the read into
    dozens of sub-MB blocks (pure scheduling overhead); at 100 TB the
    bytes/128 MB term dominates and matches Ray's own sizing, so this
    is a no-op at scale. ``min_block_bytes`` trades scheduling overhead
    against parallelism: shuffle/aggregation-bound stages want the 1 MB
    default (per-row work is trivial), compute-bound stages (hashing,
    signatures, regex) want small blocks so every core gets work even
    on a small table. Returns None when sizes can't be determined
    (remote paths) — Ray's defaults apply.
    """
    if isinstance(paths, str):
        paths = [paths]
    total = 0
    try:
        for p in paths:
            if os.path.isdir(p):
                for f in os.listdir(p):
                    total += os.path.getsize(os.path.join(p, f))
            else:
                total += os.path.getsize(p)
    except OSError:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    parallel = max(min_per_cpu * cpus, total // TARGET_BLOCK_BYTES)
    if total // TARGET_BLOCK_BYTES < 8 * cpus:
        # small-job regime: the byte term can't feed 8 waves/core —
        # split to SMALL_TARGET blocks (capped at 8 waves) so reduce
        # partitions are fine-grained enough to average out skew
        parallel = max(
            parallel, min(8 * cpus, total // SMALL_TARGET_BLOCK_BYTES)
        )
    return max(1, min(parallel, total // min_block_bytes))


def read_input(paths: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the tokenized-sequence input table (full schema by default)."""
    return ray.data.read_parquet(paths, columns=columns)


def read_points_input(paths: str | list[str]) -> ray.data.Dataset:
    """Read only what point derivation needs: (doc_id, n_tok, source).

    The ``tokens`` column (≫99% of input bytes) is pruned at the
    row-group reader — this is the single biggest IO win at 100 TB.
    """
    nb = good_num_blocks(paths)
    kw = {"override_num_blocks": nb} if nb else {}
    return ray.data.read_parquet(paths, columns=["doc_id", "n_tok", "source"], **kw)


def read_table(
    path: str | list[str],
    columns: list[str] | None = None,
    compute_heavy: bool = False,
) -> ray.data.Dataset:
    """General parquet read with projection pushdown + sized blocks.

    ``compute_heavy=True``: downstream stages do real per-byte CPU work
    (signatures, regex, codecs), so split down to ~16 KB blocks if
    that's what it takes to feed every core — at 100 TB the 128 MB
    sizing term dominates either way and the flag is a no-op."""
    nb = good_num_blocks(
        path, min_block_bytes=16 * 1024 if compute_heavy else MIN_BLOCK_BYTES
    )
    kw = {"override_num_blocks": nb} if nb else {}
    return ray.data.read_parquet(path, columns=columns, **kw)


def normalize_schema(
    ds: ray.data.Dataset,
    schema: "pa.Schema",
    defaults: dict[str, object] | None = None,
) -> ray.data.Dataset:
    """Schema widening with default fill (reference F4: missing optional
    columns are materialized with defaults, ``/root/reference/
    workbook_exporter-fe.py:229-236``; null coalesce ``:200``):
    every field of ``schema`` exists afterwards — missing columns are
    appended as the default (or null), present columns are cast, and
    extra columns are dropped. Runs as one vectorized map_batches."""
    import pyarrow as pa

    defaults = defaults or {}

    def _norm(b: "pa.Table") -> "pa.Table":
        cols = {}
        for field in schema:
            if field.name in b.column_names:
                col = b[field.name].cast(field.type)
                if field.name in defaults:
                    import pyarrow.compute as pc

                    col = pc.fill_null(col, pa.scalar(defaults[field.name], field.type))
            else:
                d = defaults.get(field.name)
                col = (
                    pa.nulls(len(b), field.type)
                    if d is None
                    else pa.array([d] * len(b), field.type)
                )
            cols[field.name] = col
        return pa.table(cols, schema=schema)

    return ds.map_batches(_norm, batch_format="pyarrow", zero_copy_batch=True)


def read_tier(tier_dir: str) -> ray.data.Dataset:
    """Read a previously-materialized tier (cascade input / resume)."""
    return ray.data.read_parquet(tier_dir)


def parquet_rowgroup_audit(path: str, column: str = "event_id"):
    """Footer-only introspection of a Parquet file: per row group, the
    row count and the ``column``'s min/max statistics — the exact
    numbers the reader's predicate/row-group pruning consults, surfaced
    as a queryable audit ("can a ts/id range scan skip this group?").
    Reads ONLY the footer (metadata-sized — no data pages touched), so
    driver-side is the correct execution site at any corpus size; a
    directory of files maps this per file.

    Output: pa.Table (row_group_id, n_rows, min_val, max_val) int64.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
    gids, rows, mins, maxs = [], [], [], []
    for g in range(md.num_row_groups):
        col = md.row_group(g).column(idx)
        st = col.statistics
        gids.append(g)
        rows.append(md.row_group(g).num_rows)
        mins.append(int(st.min))
        maxs.append(int(st.max))
    return pa.table(
        {
            "row_group_id": pa.array(gids, pa.int64()),
            "n_rows": pa.array(rows, pa.int64()),
            "min_val": pa.array(mins, pa.int64()),
            "max_val": pa.array(maxs, pa.int64()),
        }
    )
