"""Chunk compression stage: raw point series → Gorilla-compressed chunks.

One chunk = one (source, chunk-window) slice of a series — default
window 1 day, the same semantic partitioning key as the rollup cascade,
so chunk boundaries are calendar-determined and chunk bytes are
bit-deterministic regardless of Ray block arrival order (points are
sorted by ts and deduplicated inside the chunk before encoding).

This is a stateful actor-pool stage per the north rule: the callable
class is instantiated once per actor (``concurrency=N``) and reused
across groups; codec scratch state lives per-chunk so actors never
share state and the pool scales elastically.

Reference parity: the reference has no compression; this stage is
mandated by BASELINE.json (north_rule). Its statefulness is the
done-right analog of the reference's process-global counter state
(``/root/reference/workbook_exporter-fe.py:1924``, SURVEY.md §2.3 ST1):
state is strictly per-key-partition, so parallel instances never share.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import gorilla
from ..schema import US, CHUNK_SCHEMA

DAY_S = 86_400


def merge_encode_chunk(group: pa.Table) -> pa.Table:
    """One (source, chunk-window) segment group → one chunk row. The
    group arrives PACKED (per-block delta-encoded segment fragments from
    the rollup combiner — see ``rollup._pack_day_segments``), so the
    exchange that fed this stage moved ~4-12 B/point in a handful of
    rows, not raw point rows. Groups are keyed by the int64 ``(skey,
    day)`` exchange key; a 64-bit hash collision can co-locate two
    sources — split exactly (almost always one sub-run)."""
    from .rollup import decode_segments

    src = group["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    uniq = pc.unique(src)
    parts = []
    for s in uniq.to_pylist() if len(uniq) > 1 else [None]:
        g = group if s is None else group.filter(pc.equal(src, s))
        ts, raw = decode_segments(g)
        val = raw.astype(np.float64)
        chunk_start = int(g["day"][0].as_py())
        parts.append(
            pa.table(
                {
                    "source": pa.array(
                        [g["source"][0].as_py() if s is None else s], pa.string()
                    ),
                    "chunk_start_ts": pa.array([chunk_start], pa.int64()).cast(
                        pa.timestamp("us")
                    ),
                    "n_points": pa.array([len(ts)], pa.int32()),
                    "ts_dod_bytes": pa.array([gorilla.encode_dod(ts)], pa.binary()),
                    "val_xor_bytes": pa.array([gorilla.encode_xor(val)], pa.binary()),
                    "first_ts": pa.array([int(ts[0])], pa.int64()),
                    "first_val": pa.array([float(val[0])], pa.float64()),
                },
                schema=CHUNK_SCHEMA,
            )
        )
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


class ChunkCompressor:
    """Actor-pool variant of :func:`merge_encode_chunk` — the template
    for stages with real once-per-actor setup (models, dictionaries).
    The Gorilla codec itself holds only per-chunk scratch state, so the
    default task-based path parallelizes better (tasks autoscale to all
    cores; a fixed pool caps the stage). Pass ``concurrency=`` to
    :func:`compress_chunks` to force the pool."""

    def __init__(self) -> None:
        pass

    def __call__(self, group: pa.Table) -> pa.Table:
        return merge_encode_chunk(group)


def compress_chunks(
    points: ray.data.Dataset,
    chunk_s: int = DAY_S,
    concurrency: int | tuple[int, int] | None = None,
    value_col: str = "n_tok",
) -> ray.data.Dataset:
    """Points (source, ts, <value_col>) → chunk rows (CHUNK_SCHEMA).

    Pipeline: per-block segment packing (combiner — the cheap exchange)
    → groupby (source, window) → merge + Gorilla encode (tasks by
    default; pass ``concurrency`` for an actor pool)."""
    from .rollup import _pack_day_segments

    chunk_us = chunk_s * US
    segs = points.map_batches(
        lambda b: _pack_day_segments(b, value_col, chunk_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    grouped = segs.groupby(["skey", "day"])  # int64 exchange sort keys
    if concurrency is None:
        return grouped.map_groups(merge_encode_chunk, batch_format="pyarrow")
    return grouped.map_groups(
        ChunkCompressor, batch_format="pyarrow", concurrency=concurrency
    )


def decompress_chunks_batch(batch: pa.Table) -> pa.Table:
    """Chunk rows → the exact original (source, ts, n_tok-as-float) points.

    Verification / read path; vectorizes across chunks in the batch.
    """
    sources: list[str] = []
    ts_all: list[np.ndarray] = []
    val_all: list[np.ndarray] = []
    n_col = batch["n_points"].to_pylist()
    for i in range(len(batch)):
        n = n_col[i]
        ts = gorilla.decode_dod(
            batch["ts_dod_bytes"][i].as_py(), n, batch["first_ts"][i].as_py()
        )
        val = gorilla.decode_xor(
            batch["val_xor_bytes"][i].as_py(), n, batch["first_val"][i].as_py()
        )
        sources.extend([batch["source"][i].as_py()] * n)
        ts_all.append(ts)
        val_all.append(val)
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "ts": pa.array(
                np.concatenate(ts_all) if ts_all else np.array([], np.int64)
            ).cast(pa.timestamp("us")),
            "value": pa.array(
                np.concatenate(val_all) if val_all else np.array([], np.float64)
            ),
        }
    )


def decompress_chunks(chunks: ray.data.Dataset) -> ray.data.Dataset:
    return chunks.map_batches(decompress_chunks_batch, batch_format="pyarrow")
