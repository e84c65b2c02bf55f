"""Cascading continuous aggregates (1m→5m→1h→1d) over point streams.

Two execution strategies, both exact:

1. :func:`cascade_rollup` — the flagship path for the authoritative
   tokenized-sequence input. ONE all-to-all shuffle total: points are
   grouped by ``(source, day)`` and a vectorized ``map_groups`` kernel
   performs exact dedup on ``(source, ts)`` plus the entire 4-tier
   cascade locally (tier t+1 is genuinely computed from tier t's
   partials — count/sum/min/max re-aggregate associatively, mean is a
   single ``sum/count`` division at the end, so every float is
   bit-deterministic regardless of block arrival order).

   Skew note (north rule): the hot ``source`` key (~30% of rows) is
   spread across its time axis by including the day bucket in the
   shuffle key — every group is bounded at ≤1440 raw points, so no
   reducer can straggle no matter how skewed ``source`` is. This is
   salting with a semantic salt (the day) instead of a random one,
   which lets dedup/gap-fill/compression reuse the same partitioning.

2. :func:`rollup_tier` / :func:`cascade_from_tier` — generic two-phase
   salted aggregation for arbitrary (possibly float-valued) point
   streams: per-block partial aggregation inside ``map_batches``
   (the combiner — collapses each block to its distinct keys *before*
   the exchange, which is what makes the shuffle cheap at 100 TB),
   optionally an explicit salted intermediate ``groupby`` for
   pathological per-key bucket cardinality, then a final small
   ``groupby`` merge of partials.

Reference parity: the reference folds rows into nested dicts keyed by
hostname (``/root/reference/workbook_exporter-fe.py:125-129,196-205``,
SURVEY.md §2.5 A1) — a sequential group-by-key aggregate; its "run all"
cascade re-reads shared outputs (``:1803-1805``). Here the cascade is a
real partial/final aggregation tree.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..schema import DEFAULT_TIERS, US, TierSpec

DAY_US = 86_400 * US


def _source_hash64(names: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash per source name (vectorized over the
    block's DICTIONARY — one digest per distinct source, not per row).
    Used as the exchange sort key so the all-to-all compares int64s
    instead of strings; the string column still rides along and the
    merge splits hash collisions exactly, so collisions cost only a
    shared reducer, never correctness."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
            )
            - (1 << 63)
            for s in names.to_pylist()
        ),
        dtype=np.int64,
        count=len(names),
    )


# ---------------------------------------------------------------------------
# Strategy 1: single-shuffle cascade (authoritative input)
# ---------------------------------------------------------------------------


def _add_day(batch: pa.Table) -> pa.Table:
    ts_us = pc.cast(batch["ts"], pa.int64())
    day = pc.multiply(pc.divide(ts_us, DAY_US), DAY_US)  # floor: ts_us >= 0
    return batch.append_column("day", pc.cast(day, pa.int64()))


def _cascade_group(
    group: pa.Table,
    tiers: Sequence[TierSpec],
    value_col: str = "n_tok",
    dedup: bool = True,
) -> pa.Table:
    """Dedup + full tier cascade for one (source, day) group. Vectorized.

    Integer value columns aggregate exactly in int64 (sum) with the input
    dtype preserved for min/max; float columns aggregate in float64 (sums
    are computed in a deterministic order — ts-sorted reduceat — so the
    result is still reproducible run-to-run).
    """
    ts = pc.cast(group["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    raw = group[value_col].to_numpy(zero_copy_only=False)
    is_int = np.issubdtype(raw.dtype, np.integer)
    val = raw.astype(np.int64 if is_int else np.float64)
    minmax_type = pa.int32() if is_int else pa.float64()
    sum_type = pa.int64() if is_int else pa.float64()

    order = np.argsort(ts, kind="stable")
    ts, val = ts[order], val[order]
    if dedup:
        # exact dedup on (source, ts): first occurrence wins (duplicate rows
        # in the authoritative input are byte-identical, so "first" == "any")
        keep = np.ones(len(ts), dtype=bool)
        keep[1:] = ts[1:] != ts[:-1]
        ts, val = ts[keep], val[keep]

    source = group["source"][0].as_py()

    out_tier: list[str] = []
    out_bucket: list[np.ndarray] = []
    out_count: list[np.ndarray] = []
    out_sum: list[np.ndarray] = []
    out_min: list[np.ndarray] = []
    out_max: list[np.ndarray] = []

    # tier 0 partials start as the raw points themselves
    p_bucket, p_count, p_sum, p_min, p_max = (
        ts,
        np.ones(len(ts), dtype=np.int64),
        val,
        val,
        val,
    )
    for spec in tiers:
        b = (p_bucket // spec.bucket_us) * spec.bucket_us
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        p_bucket = b[starts]
        p_count = np.add.reduceat(p_count, starts)
        p_sum = np.add.reduceat(p_sum, starts)
        p_min = np.minimum.reduceat(p_min, starts)
        p_max = np.maximum.reduceat(p_max, starts)
        out_tier.append(spec.name)
        out_bucket.append(p_bucket)
        out_count.append(p_count)
        out_sum.append(p_sum)
        out_min.append(p_min)
        out_max.append(p_max)

    n_rows = [len(b) for b in out_bucket]
    tier_col = pa.array(
        np.repeat(np.arange(len(tiers)), n_rows),
    ).cast(pa.int8())
    tier_names = pa.DictionaryArray.from_arrays(
        tier_col, pa.array([t.name for t in tiers])
    ).cast(pa.string())
    bucket = np.concatenate(out_bucket)
    cnt = np.concatenate(out_count)
    s = np.concatenate(out_sum)
    return pa.table(
        {
            "tier": tier_names,
            "source": pa.array([source] * int(sum(n_rows)), pa.string()),
            "bucket_ts": pa.array(bucket).cast(pa.timestamp("us")),
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s, sum_type),
            "min": pa.array(np.concatenate(out_min), minmax_type),
            "max": pa.array(np.concatenate(out_max), minmax_type),
            # the ONLY float op: one division of exact int64s → bit-deterministic
            "mean": pa.array(s.astype(np.float64) / cnt.astype(np.float64)),
        }
    )


def _cascade_arrays(
    ts: np.ndarray,
    val: np.ndarray,
    source: str,
    tiers: Sequence[TierSpec],
    minmax_type: pa.DataType,
    sum_type: pa.DataType,
) -> pa.Table:
    """Tier cascade over one group's deduplicated ts-sorted arrays."""
    out_tier: list[str] = []
    out_bucket: list[np.ndarray] = []
    out_count: list[np.ndarray] = []
    out_sum: list[np.ndarray] = []
    out_min: list[np.ndarray] = []
    out_max: list[np.ndarray] = []

    p_bucket, p_count, p_sum, p_min, p_max = (
        ts,
        np.ones(len(ts), dtype=np.int64),
        val,
        val,
        val,
    )
    for spec in tiers:
        b = (p_bucket // spec.bucket_us) * spec.bucket_us
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        p_bucket = b[starts]
        p_count = np.add.reduceat(p_count, starts)
        p_sum = np.add.reduceat(p_sum, starts)
        p_min = np.minimum.reduceat(p_min, starts)
        p_max = np.maximum.reduceat(p_max, starts)
        out_tier.append(spec.name)
        out_bucket.append(p_bucket)
        out_count.append(p_count)
        out_sum.append(p_sum)
        out_min.append(p_min)
        out_max.append(p_max)

    n_rows = [len(b) for b in out_bucket]
    tier_col = pa.array(np.repeat(np.arange(len(tiers)), n_rows)).cast(pa.int8())
    tier_names = pa.DictionaryArray.from_arrays(
        tier_col, pa.array([t.name for t in tiers])
    ).cast(pa.string())
    bucket = np.concatenate(out_bucket)
    cnt = np.concatenate(out_count)
    s = np.concatenate(out_sum)
    return pa.table(
        {
            "tier": tier_names,
            "source": pa.array([source] * int(sum(n_rows)), pa.string()),
            "bucket_ts": pa.array(bucket).cast(pa.timestamp("us")),
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s, sum_type),
            "min": pa.array(np.concatenate(out_min), minmax_type),
            "max": pa.array(np.concatenate(out_max), minmax_type),
            # the ONLY float op: one division of exact int64s → bit-deterministic
            "mean": pa.array(s.astype(np.float64) / cnt.astype(np.float64)),
        }
    )


def _pack_day_segments(
    batch: pa.Table, value_col: str, window_us: int = DAY_US, dedup: bool = True
) -> pa.Table:
    """Per-block combiner: pack the block's points into one row per
    (source, day) — ``first_ts`` + delta-encoded timestamps + raw values
    as list columns. In-block duplicates on (source, ts) are dropped
    (duplicate rows are byte-identical, so block-local dedup is exact;
    cross-block dups fall out in the merge).

    This is what makes the flagship's single exchange cheap at 100 TB:
    ~12 B/point in a few segment rows per block instead of ~31 B/point
    in one row per point, so the all-to-all moves 2.5× fewer bytes and
    ~1000× fewer rows.

    Constant-delta elision (the Gorilla paper's core timestamp
    observation — telemetry grids are overwhelmingly regular): a run
    whose deltas are all equal ships an EMPTY ``ts_deltas`` list plus
    its ``const_delta``; only irregular runs carry the full delta
    list. On a regular corpus this removes the 8 B/point timestamp
    payload from the exchange entirely (≈60%% fewer exchange bytes);
    decode is exact in both paths."""
    if len(batch) == 0:
        return pa.table(
            {
                "skey": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int32()),
                "first_ts": pa.array([], pa.int64()),
                "const_delta": pa.array([], pa.int64()),
                "ts_deltas": pa.array([], pa.list_(pa.int64())),
                "vals": pa.array([], pa.list_(batch.schema.field(value_col).type)),
            }
        )
    idx = pc.sort_indices(
        batch.select(["source", "ts"]),
        sort_keys=[("source", "ascending"), ("ts", "ascending")],
    )
    sorted_b = batch.take(idx)
    ts = pc.cast(sorted_b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    val = sorted_b[value_col].to_numpy(zero_copy_only=False)
    src = sorted_b["source"]

    # block-local exact dedup on (source, ts)
    src_codes = pc.dictionary_encode(
        src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    )
    codes = np.asarray(src_codes.indices)
    if dedup:
        keep = np.ones(len(ts), dtype=bool)
        keep[1:] = (ts[1:] != ts[:-1]) | (codes[1:] != codes[:-1])
        ts, val, codes = ts[keep], val[keep], codes[keep]

    day = (ts // window_us) * window_us
    starts = np.flatnonzero(np.r_[True, (codes[1:] != codes[:-1]) | (day[1:] != day[:-1])])
    n = np.diff(np.r_[starts, len(ts)]).astype(np.int32)

    # first element of each run carries its ts in first_ts; its delta slot is 0
    first_ts = ts[starts]
    deltas_full = np.empty(len(ts), dtype=np.int64)
    deltas_full[0] = 0
    deltas_full[1:] = np.diff(ts)
    deltas_full[starts] = 0

    # constant-delta detection: copy each multi-point run's first REAL
    # delta into its zero slot so min==max identifies a constant run
    adj = deltas_full.copy()
    multi = n > 1
    adj[starts[multi]] = deltas_full[starts[multi] + 1]
    mins = np.minimum.reduceat(adj, starts)
    maxs = np.maximum.reduceat(adj, starts)
    reg = mins == maxs  # single-point runs: 0 == 0 → const_delta 0
    const = np.where(reg, mins, -1)
    lens_out = np.where(reg, 0, n.astype(np.int64))
    d_offsets = pa.array(np.r_[0, np.cumsum(lens_out)].astype(np.int32))
    flat_keep = deltas_full[np.repeat(~reg, n)]

    offsets = pa.array(np.r_[starts, len(ts)].astype(np.int32))
    src_names = src_codes.dictionary.take(pa.array(codes[starts])).cast(pa.string())
    # int64 exchange key: the shuffle sorts (skey, day) as integers —
    # measurably cheaper than string comparisons at the sort-map side —
    # while the string column rides along for reconstruction
    dict_hash = _source_hash64(src_codes.dictionary)
    return pa.table(
        {
            "skey": pa.array(dict_hash[codes[starts]], pa.int64()),
            "source": src_names,
            "day": pa.array(day[starts], pa.int64()),
            "n": pa.array(n, pa.int32()),
            "first_ts": pa.array(first_ts, pa.int64()),
            "const_delta": pa.array(const, pa.int64()),
            "ts_deltas": pa.ListArray.from_arrays(
                d_offsets, pa.array(flat_keep, pa.int64())
            ),
            "vals": pa.ListArray.from_arrays(offsets, pa.array(val)),
        }
    )


def decode_segments(
    group: pa.Table, dedup: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one group's segment fragments (vectorized cumsum over the
    flattened delta lists), merge fragments, exact-dedup on ts (unless
    ``dedup=False``). Returns (ts µs int64 sorted, raw values)."""
    vl = group["vals"]
    if isinstance(vl, pa.ChunkedArray):
        vl = vl.combine_chunks()
    first_ts = group["first_ts"].to_numpy(zero_copy_only=False)
    const = group["const_delta"].to_numpy(zero_copy_only=False)
    lens = np.diff(vl.offsets.to_numpy(zero_copy_only=False))
    total = int(lens.sum())
    if total == 0:
        return np.array([], np.int64), vl.flatten().to_numpy(zero_copy_only=False)

    # regular fragments: first_ts + pos * const_delta (no delta payload)
    row_base = np.r_[0, np.cumsum(lens)[:-1]]
    pos = np.arange(total, dtype=np.int64) - np.repeat(row_base, lens)
    ts = np.repeat(first_ts, lens) + pos * np.repeat(np.maximum(const, 0), lens)

    irr = const < 0
    if irr.any():
        # irregular fragments carry explicit delta lists: within-
        # fragment cumsum with per-fragment base, vectorized
        td = group["ts_deltas"]
        if isinstance(td, pa.ChunkedArray):
            td = td.combine_chunks()
        flat_d = td.flatten().to_numpy(zero_copy_only=False)
        offs = td.offsets.to_numpy(zero_copy_only=False)
        si = offs[:-1][irr]
        li = np.diff(offs)[irr]
        cum = np.cumsum(flat_d)
        ts_ir = cum - np.repeat(cum[si], li) + np.repeat(first_ts[irr], li)
        ts[np.repeat(irr, lens)] = ts_ir
    raw = vl.flatten().to_numpy(zero_copy_only=False)

    order = np.argsort(ts, kind="stable")
    ts, raw = ts[order], raw[order]
    if dedup:
        keep = np.ones(len(ts), dtype=bool)
        keep[1:] = ts[1:] != ts[:-1]
        ts, raw = ts[keep], raw[keep]
    return ts, raw


def _merge_cascade_group(
    group: pa.Table, tiers: Sequence[TierSpec], dedup: bool = True
) -> pa.Table:
    """Reduce side of the packed cascade: decode + merge + tier cascade.

    Groups arrive keyed by ``(skey, day)`` — the int64 hash exchange
    key — so a 64-bit collision can legally co-locate two sources in
    one group; split into per-source sub-runs first (almost always
    exactly one) and cascade each exactly."""
    src = group["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    uniq = pc.unique(src)
    parts = []
    for s in uniq.to_pylist() if len(uniq) > 1 else [None]:
        g = group if s is None else group.filter(pc.equal(src, s))
        ts, raw = decode_segments(g, dedup=dedup)
        is_int = np.issubdtype(raw.dtype, np.integer)
        val = raw.astype(np.int64 if is_int else np.float64)
        minmax_type = pa.from_numpy_dtype(raw.dtype) if is_int else pa.float64()
        sum_type = pa.int64() if is_int else pa.float64()
        source = g["source"][0].as_py() if s is None else s
        parts.append(_cascade_arrays(ts, val, source, tiers, minmax_type, sum_type))
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def cascade_rollup(
    points: ray.data.Dataset,
    tiers: Sequence[TierSpec] = DEFAULT_TIERS,
    value_col: str = "n_tok",
    packed: bool = True,
    dedup: bool = True,
) -> ray.data.Dataset:
    """Points → all-tier rollup rows (tier, source, bucket_ts, count, sum,
    min, max, mean) in one shuffle.

    ``dedup=True`` (default) exact-dedups on (source, ts) — correct for
    the authoritative tokenized-sequence input, whose contract is that
    duplicate (source, ts) rows are byte-identical re-deliveries.
    Point streams WITHOUT that contract (e.g. the raw events table,
    where two distinct events could legally share (event_type, ts))
    must pass ``dedup=False`` so every point is aggregated.

    ``packed=True`` (default) runs the per-block segment-packing combiner
    before the exchange; ``packed=False`` shuffles raw point rows (kept
    for A/B testing and as the semantics oracle)."""
    if not tiers:
        raise ValueError("cascade_rollup requires at least one TierSpec")
    if packed:
        segs = points.map_batches(
            lambda b: _pack_day_segments(b, value_col, dedup=dedup),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # the ONE all-to-all sorts int64 (skey, day) — not strings —
        # and the merge splits any 64-bit collision exactly
        return segs.groupby(["skey", "day"]).map_groups(
            lambda g: _merge_cascade_group(g, tiers, dedup=dedup),
            batch_format="pyarrow",
        )
    with_day = points.map_batches(_add_day, batch_format="pyarrow", zero_copy_batch=True)
    return with_day.groupby(["source", "day"]).map_groups(
        lambda g: _cascade_group(g, tiers, value_col, dedup=dedup),
        batch_format="pyarrow",
    )


def split_tiers(
    rollup: ray.data.Dataset, tiers: Sequence[TierSpec] = DEFAULT_TIERS
) -> dict[str, ray.data.Dataset]:
    """Split the tagged cascade output into one Dataset per tier."""
    out = {}
    for spec in tiers:
        name = spec.name
        out[name] = rollup.filter(
            expr=f"tier == '{name}'"
        ).drop_columns(["tier"])
    return out


# ---------------------------------------------------------------------------
# Strategy 2: generic two-phase (partial/final) salted rollup
# ---------------------------------------------------------------------------


def _partial_agg_batch(
    batch: pa.Table, bucket_us: int, value_col: str, ts_col: str, key_col: str
) -> pa.Table:
    """Per-block combiner: collapse a block to per-(key, bucket) partials."""
    ts_us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
    bucket = pc.multiply(pc.divide(ts_us, bucket_us), bucket_us)
    t = pa.table(
        {
            "source": batch[key_col],
            "bucket_ts": bucket,
            "v": batch[value_col],
        }
    )
    g = t.group_by(["source", "bucket_ts"]).aggregate(
        [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
    )
    return pa.table(
        {
            "source": g["source"],
            "bucket_ts": g["bucket_ts"],
            "count": pc.cast(g["v_count"], pa.int64()),
            "sum": g["v_sum"],
            "min": g["v_min"],
            "max": g["v_max"],
        }
    )


def _merge_partials(ds: ray.data.Dataset, salt_mod: int | None) -> ray.data.Dataset:
    """groupby-(source,bucket) merge of partial rows; optional explicit
    salted pre-merge for pathological key cardinality."""
    aggs = [Sum("count"), Sum("sum"), Min("min"), Max("max")]

    if salt_mod is not None and salt_mod > 1:
        def _salt(b: pa.Table) -> pa.Table:
            # row-position salt: spreads rows of the SAME hot key across
            # reducers in the pre-merge. Routing-only — the merge is an
            # exact associative combine, so output is salt-invariant.
            salt = pa.array(np.arange(len(b), dtype=np.int32) % salt_mod)
            return b.append_column("salt", salt)

        salted = ds.map_batches(_salt, batch_format="pyarrow")
        pre = salted.groupby(["source", "bucket_ts", "salt"]).aggregate(*aggs)
        ds = pre.map_batches(
            lambda b: _rename_merged(b).drop_columns(["salt"]), batch_format="pyarrow"
        )

    merged = ds.groupby(["source", "bucket_ts"]).aggregate(*aggs)
    return merged.map_batches(_rename_merged, batch_format="pyarrow")


def _rename_merged(batch: pa.Table) -> pa.Table:
    mapping = {
        "sum(count)": "count",
        "sum(sum)": "sum",
        "min(min)": "min",
        "max(max)": "max",
    }
    return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])


def _finalize_mean(batch: pa.Table) -> pa.Table:
    mean = pc.divide(
        pc.cast(batch["sum"], pa.float64()), pc.cast(batch["count"], pa.float64())
    )
    bucket = pc.cast(batch["bucket_ts"], pa.timestamp("us"))
    return (
        batch.set_column(batch.schema.get_field_index("bucket_ts"), "bucket_ts", bucket)
        .append_column("mean", mean)
    )


def rollup_tier(
    points: ray.data.Dataset,
    bucket_s: int,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "source",
    salt_mod: int | None = None,
) -> ray.data.Dataset:
    """Generic single-tier rollup of an arbitrary point stream:
    per-block partial agg (combiner) → [salted merge] → final merge → mean."""
    bucket_us = bucket_s * US
    partials = points.map_batches(
        lambda b: _partial_agg_batch(b, bucket_us, value_col, ts_col, key_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = _merge_partials(partials, salt_mod)
    return merged.map_batches(_finalize_mean, batch_format="pyarrow")


def cascade_from_tier(
    tier: ray.data.Dataset, coarser_bucket_s: int, salt_mod: int | None = None
) -> ray.data.Dataset:
    """Continuous-aggregate step: build a coarser tier from a finer tier's
    partials (count/sum/min/max re-aggregate; mean re-derived)."""
    bucket_us = coarser_bucket_s * US

    def _rebucket(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(b["bucket_ts"], pa.timestamp("us")), pa.int64())
        bucket = pc.multiply(pc.divide(ts_us, bucket_us), bucket_us)
        cols = {
            "source": b["source"],
            "bucket_ts": bucket,
            "count": b["count"],
            "sum": b["sum"],
            "min": b["min"],
            "max": b["max"],
        }
        t = pa.table(cols)
        g = t.group_by(["source", "bucket_ts"]).aggregate(
            [("count", "sum"), ("sum", "sum"), ("min", "min"), ("max", "max")]
        )
        return pa.table(
            {
                "source": g["source"],
                "bucket_ts": g["bucket_ts"],
                "count": g["count_sum"],
                "sum": g["sum_sum"],
                "min": g["min_min"],
                "max": g["max_max"],
            }
        )

    partials = tier.map_batches(_rebucket, batch_format="pyarrow", zero_copy_batch=True)
    merged = _merge_partials(partials, salt_mod)
    return merged.map_batches(_finalize_mean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fused flagship: rollup cascade + Gorilla compression in ONE exchange
# ---------------------------------------------------------------------------


def _fused_merge_group(
    group: pa.Table, tiers: Sequence[TierSpec], dedup: bool = True
) -> pa.Table:
    """Reduce side of the fused flagship: decode each (source, day)
    group's packed segments ONCE, then emit BOTH the tier-cascade rows
    and the Gorilla chunk row from the same decoded arrays.

    Output is the union schema (``kind`` = 'tier' | 'chunk'); columns
    belonging to the other kind are null. Same collision discipline as
    :func:`_merge_cascade_group`: the int64 exchange key can co-locate
    two sources — split into per-source sub-runs first."""
    from ..functions import gorilla

    src = group["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    uniq = pc.unique(src)
    tier_parts: list[pa.Table] = []
    chunk_parts: list[pa.Table] = []
    for s in uniq.to_pylist() if len(uniq) > 1 else [None]:
        g = group if s is None else group.filter(pc.equal(src, s))
        ts, raw = decode_segments(g, dedup=dedup)
        source = g["source"][0].as_py() if s is None else s
        is_int = np.issubdtype(raw.dtype, np.integer)
        val = raw.astype(np.int64 if is_int else np.float64)
        minmax_type = pa.from_numpy_dtype(raw.dtype) if is_int else pa.float64()
        sum_type = pa.int64() if is_int else pa.float64()
        tier_parts.append(
            _cascade_arrays(ts, val, source, tiers, minmax_type, sum_type)
        )
        fval = raw.astype(np.float64)
        chunk_parts.append(
            pa.table(
                {
                    "source": pa.array([source], pa.string()),
                    "chunk_start_ts": pa.array(
                        [int(g["day"][0].as_py())], pa.int64()
                    ).cast(pa.timestamp("us")),
                    "n_points": pa.array([len(ts)], pa.int32()),
                    "ts_dod_bytes": pa.array([gorilla.encode_dod(ts)], pa.binary()),
                    "val_xor_bytes": pa.array([gorilla.encode_xor(fval)], pa.binary()),
                    "first_ts": pa.array([int(ts[0])], pa.int64()),
                    "first_val": pa.array([float(fval[0])], pa.float64()),
                }
            )
        )
    tier_tbl = tier_parts[0] if len(tier_parts) == 1 else pa.concat_tables(tier_parts)
    chunk_tbl = (
        chunk_parts[0] if len(chunk_parts) == 1 else pa.concat_tables(chunk_parts)
    )
    n_t, n_c = len(tier_tbl), len(chunk_tbl)
    tier_tbl = tier_tbl.append_column("kind", pa.array(["tier"] * n_t, pa.string()))
    chunk_tbl = chunk_tbl.append_column("kind", pa.array(["chunk"] * n_c, pa.string()))
    # union by name, null-filling the other kind's columns; tier table
    # first so the fused schema's column order is deterministic
    return pa.concat_tables([tier_tbl, chunk_tbl], promote_options="default")


def fused_rollup_compress(
    points: ray.data.Dataset,
    tiers: Sequence[TierSpec] = DEFAULT_TIERS,
    value_col: str = "n_tok",
    dedup: bool = True,
) -> ray.data.Dataset:
    """Tier cascade AND Gorilla chunk store in ONE pass / ONE exchange.

    :func:`cascade_rollup` and ``compress.compress_chunks`` share the
    identical per-block combiner (:func:`_pack_day_segments`) and the
    identical int64 ``(skey, day)`` exchange key — running them as two
    jobs reads + derives + packs + shuffles the corpus twice and decodes
    every segment group twice. This fused plan does each exactly once:
    points → pack → groupby(skey, day) → per-group decode → (cascade
    rows + chunk row), emitted in a union schema discriminated by
    ``kind``. Consumers filter ``kind == 'tier'`` / ``kind == 'chunk'``;
    the sub-tables are bit-identical to the two separate pipelines'
    outputs (pytest-pinned).

    At 100 TB this halves the dominant costs of the flagship — one scan
    of the input instead of two and one all-to-all instead of two — and
    is the repo's canonical example of "pick ONE partitioning key and
    reuse it across stages"."""
    if not tiers:
        raise ValueError("fused_rollup_compress requires at least one TierSpec")
    segs = points.map_batches(
        lambda b: _pack_day_segments(b, value_col, dedup=dedup),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return segs.groupby(["skey", "day"]).map_groups(
        lambda g: _fused_merge_group(g, tiers, dedup=dedup),
        batch_format="pyarrow",
    )
