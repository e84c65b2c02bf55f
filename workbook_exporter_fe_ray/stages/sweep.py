"""Coarse-partition grouped execution: the scale-safe replacement for
per-key ``groupby(key).map_groups(fn)``.

Ray Data's ``map_groups`` invokes the UDF once per distinct key — fine
for dozens of keys, catastrophic for millions (one Python call + one
tiny Arrow table per key). The pattern here (same as the LSH bucket
sweep in ``stages/dedup.py``) keeps the exchange keyed on a COARSE
partition ``hash(key) % num_partitions`` so the engine runs
``num_partitions`` vectorized group tasks total; inside a partition,
keys are contiguous runs of one sort and are swept with NumPy
``reduceat``-style kernels. Each operator's output is identical to the
per-key formulation (pure refactoring of the execution shape).

Partition count trades per-task memory for parallelism: a partition
holds ~``rows / num_partitions`` rows, so size it such that one
partition's rows fit a worker heap (for billions of keys, raise it —
the shuffle cost is unchanged, it's the same rows either way).

Key hashing: int keys use splitmix64; string keys use pandas'
``hash_array`` (vectorized siphash-ish, deterministic across runs and
machines for a fixed hash key, which pandas guarantees by default).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _GOLD) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash_part(
    batch: pa.Table, key_cols: list[str], num_partitions: int
) -> pa.Array:
    """int32 partition id per row: combined hash of ``key_cols`` mod P."""
    acc = np.zeros(len(batch), dtype=np.uint64)
    for c in key_cols:
        col = batch[c]
        if pa.types.is_integer(col.type):
            h = _splitmix64(
                pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
            )
        else:
            import pandas as pd

            h = pd.util.hash_array(
                col.to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
        with np.errstate(over="ignore"):
            acc = _splitmix64(acc * np.uint64(0xC2B2AE3D27D4EB4F) ^ h)
    return pa.array((acc % np.uint64(num_partitions)).astype(np.int32))


def with_part(
    batch: pa.Table, key_cols: list[str], num_partitions: int
) -> pa.Table:
    return batch.append_column("__part", hash_part(batch, key_cols, num_partitions))


def run_starts_table(g: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Indices where a new key run begins in a table already sorted by
    ``key_cols`` (vectorized adjacent-row comparison per key column)."""
    n = len(g)
    if n == 0:
        return np.array([], dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in key_cols:
        arr = g[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        change[1:] |= neq.to_numpy(zero_copy_only=False)
    return np.flatnonzero(change)


def sorted_probe(
    keys: np.ndarray, probe: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Membership probe against a SORTED key array: returns
    ``(hit, pos)`` where ``hit[i]`` says ``probe[i]`` is present and
    ``pos[i]`` is its (clamped) index.  The one place the
    searchsorted+clamp+equality idiom lives — the hand-rolled copies
    diverged on the empty-keys guard twice (r4s review), so every
    broadcast-dim lookup routes through here."""
    if len(keys) == 0:
        return (
            np.zeros(len(probe), dtype=bool),
            np.zeros(len(probe), dtype=np.int64),
        )
    pos = np.searchsorted(keys, probe)
    posc = np.minimum(pos, len(keys) - 1)
    return keys[posc] == probe, posc
