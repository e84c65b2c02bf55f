"""Sketch-style distributive operators for the 100 TB scale path.

The reference has only exact, single-process aggregation (SURVEY §2.5);
these add the bounded-state summaries a web-scale training-data pipeline
needs, each designed so the exchange moves a FIXED number of bytes per
key/block instead of the raw stream:

- :func:`grouped_quantiles` — EXACT grouped discrete quantiles via a
  value-histogram: per batch, rows pre-aggregate to ``(key, value,
  cnt)``; the shuffle moves only distinct (key, value) pairs (bounded
  by value cardinality, not row count). Index convention =
  ``ceil(q*n) - 1`` computed in integer arithmetic — empirically
  matched to DuckDB ``quantile_disc`` (so the driver's SQL oracle is
  bit-exact, no float index drift at rational boundaries).
- :func:`hll_distinct` — HyperLogLog distinct-count per key: each
  batch emits one ``2^p``-byte register row per key present; merge is
  an elementwise max. Approximate by design → rows-only driver check;
  the pytest asserts relative error vs the exact distinct count.
- :func:`heavy_hitters` — Misra-Gries candidates + exact rescore.
  The MG merge guarantees no item with true frequency > n/k is
  dropped, so after the broadcast rescore the output is EXACTLY the
  items with ``count > phi*n`` — an approximate sketch that still
  passes a strict SQL value-hash oracle, without ever shuffling the
  full per-item count table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# ---------------------------------------------------------------------------
# exact grouped quantiles (histogram exchange)
# ---------------------------------------------------------------------------


def _warn_cardinality(op: str, max_seen: int, threshold: int) -> None:
    """Loud no-silent-degradation guard (the LSH ``max_bucket`` policy):
    fires when a key's distinct-value count breaks the histogram-
    exchange design envelope."""
    if max_seen > threshold:
        import logging

        logging.getLogger(__name__).warning(
            "%s: a key has %d distinct values (> max_distinct_per_key=%d) "
            "— the histogram exchange is degrading toward row count; use "
            "grouped_quantiles_sketch for float-like/near-unique value "
            "domains",
            op,
            max_seen,
            threshold,
        )


def grouped_quantiles(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    percents: tuple[int, ...] = (50, 90),
    max_distinct_per_key: int = 1_000_000,
) -> ray.data.Dataset:
    """Exact per-key discrete quantiles of an integer column.

    ``percents`` are integer percentiles; the selected element is the
    one at sorted index ``ceil(p*n/100) - 1`` (DuckDB
    ``quantile_disc`` convention), computed as
    ``(p*n + 99) // 100 - 1`` so boundaries are exact.

    Design envelope: the exchange is a (key, value, count) histogram,
    so its size is bounded by VALUE CARDINALITY, not row count. For
    float-like / near-unique value domains that bound degrades toward
    the raw row count — the reduce logs a loud warning when any key
    exceeds ``max_distinct_per_key`` distinct values (no silent
    degradation, mirroring the LSH ``max_bucket`` policy) and the
    caller should switch to :func:`grouped_quantiles_sketch`, the
    documented unbounded-domain fallback.
    """

    # reduce: coarse-partition sweep — partial (key, value, cnt)
    # histogram rows are routed straight to ``hash(key) % P``; each
    # partition merges duplicate pairs AND computes every key's
    # quantiles in ONE vectorized group call (per-run local cumsums +
    # a single flat searchsorted with per-run offsets). No per-key UDF
    # calls, and no sort-shuffle keyed on the (key, value) pair space —
    # the only exchange is the 64-valued ``__part`` groupby.
    from .sweep import run_starts_table, with_part

    num_partitions = 64

    def _hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value_col: pc.cast(b[value_col], pa.int64())})
        g = t.group_by([key, value_col]).aggregate([([], "count_all")])
        g = g.rename_columns([key, value_col, "cnt"])
        return with_part(g, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        g = g.take(idx)
        if len(g) == 0:
            cols: dict[str, pa.Array] = {key: g[key]}
            for p in percents:
                cols[f"p{p}"] = pa.array([], pa.int64())
            cols["n_rows"] = pa.array([], pa.int64())
            return pa.table(cols)
        # merge duplicate (key, value) pairs from different blocks
        pair_starts = run_starts_table(g, [key, value_col])
        c = np.add.reduceat(
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pair_starts
        )
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[pair_starts]
        keys_arr = g[key].take(pa.array(pair_starts))
        dedup = pa.table({key: keys_arr})
        starts = run_starts_table(dedup, [key])
        k = len(starts)
        nrows = len(v)
        lens = np.diff(np.r_[starts, nrows])
        _warn_cardinality("grouped_quantiles", int(lens.max()), max_distinct_per_key)
        cum = np.cumsum(c)
        base = cum[starts] - c[starts]  # cumsum just before each run
        local_cum = cum - np.repeat(base, lens)
        n_per_key = local_cum[starts + lens - 1]
        big = int(local_cum.max()) + 1
        run_of_row = np.repeat(np.arange(k), lens)
        mono = local_cum + run_of_row * big
        cols = {key: keys_arr.take(pa.array(starts))}
        for p in percents:
            kidx = np.maximum((p * n_per_key + 99) // 100 - 1, 0)
            tgt = (kidx + 1) + np.arange(k) * big
            pos = np.searchsorted(mono, tgt, side="left")
            cols[f"p{p}"] = pa.array(v[pos], pa.int64())
        cols["n_rows"] = pa.array(n_per_key, pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct count per key
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the standard public-domain 64-bit mixer."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hll_distinct(
    ds: ray.data.Dataset,
    key: str = "event_type",
    value_col: str = "user_id",
    p: int = 12,
) -> ray.data.Dataset:
    """Approximate distinct ``value_col`` per ``key`` via HyperLogLog
    (Flajolet et al. 2007, with the small-range linear-counting
    correction). Fixed ``2^p`` bytes per (key, block) cross the
    exchange regardless of row count — the 100 TB COUNT DISTINCT."""
    m = 1 << p
    low_bits = 64 - p
    low_mask = np.uint64((1 << low_bits) - 1)

    def _partial(b: pa.Table) -> pa.Table:
        vals = pc.cast(b[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        h = _splitmix64(vals.view(np.uint64))
        idx = (h >> np.uint64(low_bits)).astype(np.int64)
        w = h & low_mask
        # rank = leading zeros of the low bits + 1 = low_bits - bit_length(w) + 1;
        # bit_length via frexp exponent (w < 2^52 for p >= 12 → exact in float64)
        bl = np.frexp(w.astype(np.float64))[1]
        rank = (low_bits - bl + 1).astype(np.uint8)
        ks = b[key].to_numpy(zero_copy_only=False)
        out_k, out_regs = [], []
        for k in np.unique(ks):
            regs = np.zeros(m, dtype=np.uint8)
            sel = ks == k
            np.maximum.at(regs, idx[sel], rank[sel])
            out_k.append(k)
            out_regs.append(regs.tobytes())
        return pa.table(
            {key: pa.array(out_k, pa.string()), "regs": pa.array(out_regs, pa.binary())}
        )

    # merge: coarse-partition sweep — a partition's register rows are
    # stacked into one (rows, m) uint8 matrix, per-key elementwise max
    # is one ``np.maximum.reduceat``, and the HLL estimate (+ the
    # linear-counting correction) evaluates vectorized across all keys
    # in the partition. One group call per partition, not per key.
    from .sweep import run_starts_table, with_part

    num_partitions = 64

    def _route(b: pa.Table) -> pa.Table:
        return with_part(b, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending")])
        g = g.take(idx)
        starts = run_starts_table(g, [key])
        if len(starts) == 0:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "approx_distinct": pa.array([], pa.int64()),
                }
            )
        mat = np.frombuffer(
            b"".join(g["regs"].to_pylist()), dtype=np.uint8
        ).reshape(len(g), m)
        regs = np.maximum.reduceat(mat, starts, axis=0)  # (n_keys, m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
        zeros = np.count_nonzero(regs == 0, axis=1)
        lc = zeros > 0
        with np.errstate(divide="ignore"):
            linear = m * np.log(np.where(lc, m / np.maximum(zeros, 1), 1.0))
        est = np.where((est <= 2.5 * m) & lc, linear, est)
        return pa.table(
            {
                key: g[key].take(pa.array(starts)),
                "approx_distinct": pa.array(np.round(est).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .map_batches(_route, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# heavy hitters: Misra-Gries candidates + exact rescore
# ---------------------------------------------------------------------------


def _mg_summarize(vals: np.ndarray, cnts: np.ndarray, k: int):
    """Reduce exact (value, count) pairs to a Misra-Gries summary of at
    most ``k`` counters: subtract the (k+1)-th largest count from all
    and drop the non-positive. Classic guarantee: every item keeps
    ``count - true_count <= 0`` and loses at most total/(k+1)."""
    if len(vals) <= k:
        return vals, cnts
    order = np.argsort(cnts, kind="stable")[::-1]
    dec = cnts[order[k]]
    keep = cnts > dec
    return vals[keep], cnts[keep] - dec


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str = "lang",
    phi: float = 0.2,
) -> ray.data.Dataset:
    """Items of ``col`` with frequency > ``phi`` of all rows, EXACT.

    Pass 1 streams batches into per-block Misra-Gries summaries with
    ``k = ceil(1/phi)`` counters (per-batch exact counts via one sort,
    then the MG decrement); the union of summaries (≤ k rows per
    block) reduces in a tiny groupby. MG's deficit bound means any
    item with true count > n/k survives into the candidate set.
    Pass 2 broadcasts the candidates (``ray.put`` once) and computes
    their EXACT counts with per-batch partials, then filters
    ``count > phi * n`` — so the result is identical to the full
    groupby answer while the exchange stays O(k) per block.
    """
    k = int(np.ceil(1.0 / phi))

    def _mg_partial(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(b[col].to_numpy(zero_copy_only=False), return_counts=True)
        vals, cnts = _mg_summarize(vals, cnts, k)
        return pa.table(
            {col: pa.array(vals, pa.string()), "mg": pa.array(cnts, pa.int64())}
        )

    merged = (
        ds.map_batches(_mg_partial, batch_format="pyarrow").groupby(col).sum("mg")
    )
    # bounded: Misra-Gries keeps <= k counters per block partial, so the
    # merged candidate domain is <= k * n_blocks (sketch-capacity-sized)
    cand = {r[col] for r in merged.take_all()}
    n_total = ds.count()
    cand_ref = ray.put(cand)

    class _Rescore:
        def __init__(self, ref):
            self.cand = np.array(sorted(ray.get(ref)), dtype=object)

        def __call__(self, b: pa.Table) -> pa.Table:
            vals, cnts = np.unique(
                b[col].to_numpy(zero_copy_only=False), return_counts=True
            )
            keep = np.isin(vals, self.cand)
            return pa.table(
                {
                    col: pa.array(vals[keep], pa.string()),
                    "c": pa.array(cnts[keep], pa.int64()),
                }
            )

    exact = (
        ds.map_batches(
            _Rescore,
            fn_constructor_args=(cand_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby(col)
        .sum("c")
    )

    def _filter(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b["sum(c)"], pa.int64())
        keep = pc.greater(pc.cast(cnt, pa.float64()), phi * n_total)
        t = pa.table({col: b[col], "n_rows": cnt})
        return t.filter(keep)

    return exact.map_batches(_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# approximate grouped quantiles for UNBOUNDED value cardinality
# ---------------------------------------------------------------------------


def grouped_quantiles_sketch(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    percents: tuple[int, ...] = (50, 90),
    m: int = 256,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Approximate per-key quantiles via a mergeable weighted rank
    sample — the complement of :func:`grouped_quantiles` for value
    domains too wide for the exact histogram exchange (floats, unique
    ids): the exchange carries at most ``m`` (value, weight) rows per
    (key, block) regardless of value cardinality.

    Per block and key, the sorted values are subsampled every
    ``stride = ceil(n/m)`` ranks (each sample carries its stride as
    weight, remainder on the last); merged samples reproduce any rank
    within ``stride`` per contributing block, so the rank error is
    ≤ Σ_blocks n_b/m = n/m — a 1/m relative-rank guarantee (~0.4% at
    m=256), asserted by the pytest. Deterministic: pure rank
    arithmetic, no RNG.
    """
    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value_col: pc.cast(b[value_col], pa.float64())})
        idx = pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        t = t.take(idx)
        n = len(t)
        if n == 0:
            out = pa.table(
                {
                    key: t[key],
                    value_col: t[value_col],
                    "w": pa.array([], pa.int64()),
                }
            )
            return with_part(out, [key], num_partitions)
        starts = run_starts_table(t, [key])
        lens = np.diff(np.r_[starts, n])
        vals = t[value_col].to_numpy(zero_copy_only=False)
        sel: list[np.ndarray] = []
        weights: list[np.ndarray] = []
        for s, ln in zip(starts, lens):
            stride = -(-int(ln) // m)  # ceil
            # ranks stride-1, 2*stride-1, ... (the max of each stride
            # bucket) + always the last element (exact max)
            ranks = np.arange(stride - 1, ln, stride)
            if ranks[-1] != ln - 1:
                ranks = np.r_[ranks, ln - 1]
            w = np.diff(np.r_[-1, ranks])
            sel.append(s + ranks)
            weights.append(w)
        sel_all = np.concatenate(sel)
        out = pa.table(
            {
                key: t[key].take(pa.array(sel_all)),
                value_col: pa.array(vals[sel_all], pa.float64()),
                "w": pa.array(np.concatenate(weights), pa.int64()),
            }
        )
        return with_part(out, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        g = g.take(idx)
        n = len(g)
        cols: dict[str, pa.Array] = {}
        if n == 0:
            cols[key] = g[key]
            for p in percents:
                cols[f"p{p}"] = pa.array([], pa.float64())
            cols["n_rows"] = pa.array([], pa.int64())
            return pa.table(cols)
        starts = run_starts_table(g, [key])
        k = len(starts)
        lens = np.diff(np.r_[starts, n])
        v = g[value_col].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(w)
        base = cum[starts] - w[starts]
        local_cum = cum - np.repeat(base, lens)
        n_per_key = local_cum[starts + lens - 1]
        big = int(local_cum.max()) + 1
        mono = local_cum + np.repeat(np.arange(k), lens) * big
        cols[key] = g[key].take(pa.array(starts))
        for p in percents:
            kidx = np.maximum((p * n_per_key + 99) // 100 - 1, 0)
            tgt = (kidx + 1) + np.arange(k) * big
            pos = np.searchsorted(mono, tgt, side="left")
            cols[f"p{p}"] = pa.array(v[pos], pa.float64())
        cols["n_rows"] = pa.array(n_per_key, pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# quantile binning (discretize) over the value-histogram exchange
# ---------------------------------------------------------------------------


def quantile_bin_counts(
    events: ray.data.Dataset, n_bins: int = 10
) -> ray.data.Dataset:
    """Global quantile binning (discretize): every event's value-cents
    is assigned to the decile it falls in, and the output is the
    per-bin population — the feature-bucketing primitive (equi-depth
    histograms, monotone-feature quantization) at bounded exchange
    cost.

    Two bounded passes, neither touching raw rows twice:

    1. EXACT global value histogram — per-block ``(value, cnt)``
       partials (one Arrow ``group_by`` per batch) folded by an
       associative groupby-sum; the exchange is bounded by value
       cardinality (integer cents here), not row count.  Bin edges are
       the ``ceil(q*n) - 1`` elements (DuckDB ``quantile_disc``
       convention, integer arithmetic) read off the histogram cumsum
       driver-side.  For unbounded-cardinality (real-valued) columns
       use :func:`grouped_quantiles_sketch` to pick approximate edges
       instead — the binning pass is unchanged.
    2. Edges broadcast once; each batch bins with one vectorized
       ``searchsorted`` (bin = count of edges strictly below the
       value) and pre-counts per bin, so the final groupby folds
       ≤ ``n_bins`` partial rows per block.

    Output: (decile, n_points) for non-empty bins — identical to the
    SQL ``GROUP BY len(list_filter(edges, e -> e < c))``.
    """
    from ray.data.aggregate import Sum

    def _hist(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        g = pa.table({"c": c}).group_by("c").aggregate([([], "count_all")])
        return g.rename_columns(["c", "cnt"])

    hist = (
        events.map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c")
        .aggregate(Sum("cnt"))
    )
    vs, cs = [], []
    for b in hist.iter_batches(batch_size=None, batch_format="pyarrow"):
        vs.append(b["c"].to_numpy(zero_copy_only=False))
        cs.append(b["sum(cnt)"].to_numpy(zero_copy_only=False))
    v = np.concatenate(vs or [np.array([], np.int64)]).astype(np.int64)
    cnt = np.concatenate(cs or [np.array([], np.int64)]).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, cnt = v[order], cnt[order]
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    # rank of the q=k/n_bins quantile element: ceil(q*n) - 1, integer math
    ranks = np.array(
        [(k * n + n_bins - 1) // n_bins - 1 for k in range(1, n_bins)], np.int64
    )
    ranks = np.maximum(ranks, 0)
    edges = v[np.searchsorted(cum, ranks + 1, side="left")] if n else np.array([], np.int64)
    ref = ray.put(edges)

    class _Bin:
        def __init__(self, ref):
            self.edges = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            c = (
                pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            bins = np.searchsorted(self.edges, c, side="left").astype(np.int64)
            g = (
                pa.table({"decile": pa.array(bins, pa.int64())})
                .group_by("decile")
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["decile", "np"])

    agg = (
        events.map_batches(
            _Bin,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .groupby("decile")
        .aggregate(Sum("np"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "decile": b["decile"],
                "n_points": pc.cast(b["sum(np)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def median_interp(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exact per-key INTERPOLATED median (``percentile_cont(0.5)``) of
    an integer column — the continuous sibling of
    :func:`grouped_quantiles` (which is ``quantile_disc``).

    Same bounded exchange: per-block (key, value, cnt) histogram
    partials, coarse-partition sweep, per-run local cumsums picking the
    two order statistics ``lo = v[(n-1)//2]`` and ``hi = v[n//2]`` with
    one flat searchsorted each; the single float expression is pinned —
    ``median = f8(lo) + (f8(hi) − f8(lo)) · 0.5`` — so the value is
    bit-identical to the SQL oracle that uses the same formula.

    Output: (key, n_rows, median).
    """
    from .sweep import run_starts_table, with_part

    def _hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value_col: pc.cast(b[value_col], pa.int64())})
        g = t.group_by([key, value_col]).aggregate([([], "count_all")])
        g = g.rename_columns([key, value_col, "cnt"])
        return with_part(g, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        g = g.take(idx)
        if len(g) == 0:
            return pa.table(
                {
                    key: g[key],
                    "n_rows": pa.array([], pa.int64()),
                    "median": pa.array([], pa.float64()),
                }
            )
        pair_starts = run_starts_table(g, [key, value_col])
        c = np.add.reduceat(
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pair_starts
        )
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[pair_starts]
        keys_arr = g[key].take(pa.array(pair_starts))
        dedup = pa.table({key: keys_arr})
        starts = run_starts_table(dedup, [key])
        k = len(starts)
        lens = np.diff(np.r_[starts, len(v)])
        cum = np.cumsum(c)
        base = cum[starts] - c[starts]
        local_cum = cum - np.repeat(base, lens)
        n_per_key = local_cum[starts + lens - 1]
        big = int(local_cum.max()) + 1
        mono = local_cum + np.repeat(np.arange(k), lens) * big

        def pick(kidx: np.ndarray) -> np.ndarray:
            tgt = (kidx + 1) + np.arange(k) * big
            return v[np.searchsorted(mono, tgt, side="left")]

        lo = pick((n_per_key - 1) // 2).astype(np.float64)
        hi = pick(n_per_key // 2).astype(np.float64)
        med = lo + (hi - lo) * np.float64(0.5)
        return pa.table(
            {
                key: keys_arr.take(pa.array(starts)),
                "n_rows": pa.array(n_per_key, pa.int64()),
                "median": pa.array(med, pa.float64()),
            }
        )

    return (
        ds.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


def mode_per_group(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key MODE — the most frequent value, smallest value on tie —
    with its frequency.  Same bounded histogram exchange as
    :func:`grouped_quantiles`: per-block (key, value, cnt) partials,
    coarse-partition sweep merges duplicate pairs, then ONE sort by
    (key, cnt desc, value asc) and a run-start take picks every key's
    mode — no per-key UDF.  Output: (key, mode_<value_col>, n_rows).
    """
    from .sweep import run_starts_table, with_part

    mode_name = f"mode_{value_col}"

    def _hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value_col: pc.cast(b[value_col], pa.int64())})
        g = t.group_by([key, value_col]).aggregate([([], "count_all")])
        g = g.rename_columns([key, value_col, "cnt"])
        return with_part(g, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        g = g.take(idx)
        if len(g) == 0:
            return pa.table(
                {
                    key: g[key],
                    mode_name: pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        pair_starts = run_starts_table(g, [key, value_col])
        c = np.add.reduceat(
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pair_starts
        )
        merged = pa.table(
            {
                key: g[key].take(pa.array(pair_starts)),
                value_col: g[value_col].take(pa.array(pair_starts)),
                "cnt": pa.array(c, pa.int64()),
            }
        )
        idx2 = pc.sort_indices(
            merged,
            sort_keys=[
                (key, "ascending"),
                ("cnt", "descending"),
                (value_col, "ascending"),
            ],
        )
        merged = merged.take(idx2)
        top = merged.take(pa.array(run_starts_table(merged, [key])))
        return pa.table(
            {
                key: top[key],
                mode_name: top[value_col],
                "n_rows": top["cnt"],
            }
        )

    return (
        ds.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


def mad_per_group(
    ds: ray.data.Dataset,
    key: str = "source",
    value_col: str = "n_chars",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Median absolute deviation per key — the robust dispersion
    statistic — as a TWO-PHASE composition of :func:`median_interp`:
    phase 1 computes each key's interpolated median; phase 2 re-streams
    the column against the broadcast medians and takes the median of
    the absolute deviations.

    Bit-exactness across both phases via the doubling trick: the phase-1
    median may be k/2, so deviations are kept as the exact INTEGER
    ``|2·v − (lo+hi)|`` and every float op happens once at the end —
    ``mad = (f8(dlo) + (f8(dhi) − f8(dlo))·0.5) · 0.5`` — the same
    pinned expression as the SQL oracle.  Both exchanges are the
    bounded histogram-partial sweep.  Output: (key, n_rows, mad).
    """
    from .sweep import run_starts_table, with_part

    # ---- phase 1: per-key doubled median (lo + hi), exact int -------
    med = median_interp(ds, key=key, value_col=value_col,
                        num_partitions=num_partitions)
    ks: list = []
    m2s: list[int] = []
    for row in med.iter_rows():
        ks.append(row[key])
        m2s.append(int(round(row["median"] * 2)))
    order = np.argsort(np.asarray(ks, dtype=object), kind="stable")
    keys_arr = np.asarray(ks, dtype=object)[order]
    m2_arr = np.asarray(m2s, dtype=np.int64)[order]
    ref = ray.put((keys_arr, m2_arr))

    _cache: dict = {}

    def _dev_partial(b: pa.Table) -> pa.Table:
        got = _cache.get("m")
        if got is None:
            got = ray.get(ref)
            _cache["m"] = got
        kk, m2 = got
        src = np.asarray(b[key].to_pylist(), dtype=object)
        v = pc.cast(b[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, src)
        dev = np.abs(2 * v - m2[pos])
        t = pa.table({key: b[key], "dev": pa.array(dev, pa.int64())})
        g = t.group_by([key, "dev"]).aggregate([([], "count_all")])
        g = g.rename_columns([key, "dev", "cnt"])
        return with_part(g, [key], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("dev", "ascending")]
        )
        g = g.take(idx)
        if len(g) == 0:
            return pa.table(
                {
                    key: g[key],
                    "n_rows": pa.array([], pa.int64()),
                    "mad": pa.array([], pa.float64()),
                }
            )
        pair_starts = run_starts_table(g, [key, "dev"])
        c = np.add.reduceat(
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pair_starts
        )
        v = g["dev"].to_numpy(zero_copy_only=False).astype(np.int64)[pair_starts]
        keys_t = g[key].take(pa.array(pair_starts))
        starts = run_starts_table(pa.table({key: keys_t}), [key])
        k = len(starts)
        lens = np.diff(np.r_[starts, len(v)])
        cum = np.cumsum(c)
        base = cum[starts] - c[starts]
        local_cum = cum - np.repeat(base, lens)
        n_per_key = local_cum[starts + lens - 1]
        big = int(local_cum.max()) + 1
        mono = local_cum + np.repeat(np.arange(k), lens) * big

        def pick(kidx: np.ndarray) -> np.ndarray:
            tgt = (kidx + 1) + np.arange(k) * big
            return v[np.searchsorted(mono, tgt, side="left")]

        dlo = pick((n_per_key - 1) // 2).astype(np.float64)
        dhi = pick(n_per_key // 2).astype(np.float64)
        mad = (dlo + (dhi - dlo) * np.float64(0.5)) * np.float64(0.5)
        return pa.table(
            {
                key: keys_t.take(pa.array(starts)),
                "n_rows": pa.array(n_per_key, pa.int64()),
                "mad": pa.array(mad, pa.float64()),
            }
        )

    return (
        ds.map_batches(_dev_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )


def winsorized_stats(
    events: ray.data.Dataset,
    p_lo: int = 5,
    p_hi: int = 95,
) -> pa.Table:
    """Winsorization audit — the feature-engineering clamp: per source,
    the exact p_lo/p_hi cents fences (``quantile_disc`` convention via
    :func:`grouped_quantiles` — value-cardinality-bounded exchange, not
    row-bounded), how many events each fence clips, and the clamped
    int64 sum.  Two streaming passes over events (fences, then clamp) —
    recomputing the cents beats materializing them, and the fence table
    is source-domain-sized so it broadcasts via ``ray.put`` once.

    Output: (source, p_lo_cents, p_hi_cents, n_events, n_clamped_lo,
    n_clamped_hi, sum_winsorized_cents) — all int64, hash-exact.
    """
    import ray

    from ray.data.aggregate import Sum

    def _cents_tbl(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "c": pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64()),
            }
        )

    cents = events.map_batches(
        _cents_tbl, batch_format="pyarrow", zero_copy_batch=True
    )
    # bounded: key-domain-sized (two fence values per source)
    fences = grouped_quantiles(
        cents, key="source", value_col="c", percents=(p_lo, p_hi)
    ).to_pandas()
    fmap = {
        s: (int(lo), int(hi))
        for s, lo, hi in zip(
            fences["source"], fences[f"p{p_lo}"], fences[f"p{p_hi}"]
        )
    }
    fref = ray.put(fmap)

    class _Clamp:
        def __init__(self, ref):
            fm = ray.get(ref)
            self.keys = sorted(fm)
            self.lo = np.array([fm[k][0] for k in self.keys], np.int64)
            self.hi = np.array([fm[k][1] for k in self.keys], np.int64)

        def __call__(self, b: pa.Table) -> pa.Table:
            t = _cents_tbl(b)
            src = t["source"].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            ki = np.searchsorted(np.array(self.keys), src)
            lo, hi = self.lo[ki], self.hi[ki]
            part = pa.table(
                {
                    "source": t["source"],
                    "n_events": pa.array(np.ones(len(c), np.int64)),
                    "n_clamped_lo": pa.array((c < lo).astype(np.int64)),
                    "n_clamped_hi": pa.array((c > hi).astype(np.int64)),
                    "sum_winsorized_cents": pa.array(np.clip(c, lo, hi)),
                }
            )
            g = part.group_by("source").aggregate(
                [
                    ("n_events", "sum"),
                    ("n_clamped_lo", "sum"),
                    ("n_clamped_hi", "sum"),
                    ("sum_winsorized_cents", "sum"),
                ]
            )
            return g.rename_columns(
                [
                    "source",
                    "n_events",
                    "n_clamped_lo",
                    "n_clamped_hi",
                    "sum_winsorized_cents",
                ]
            )

    agg = (
        events.map_batches(_Clamp(fref), batch_format="pyarrow", concurrency=4)
        .groupby("source")
        .aggregate(
            Sum("n_events"),
            Sum("n_clamped_lo"),
            Sum("n_clamped_hi"),
            Sum("sum_winsorized_cents"),
        )
        .to_pandas()  # bounded: key-domain-sized (4 sums per source)
        .sort_values("source")
    )
    los = [fmap[s][0] for s in agg["source"]]
    his = [fmap[s][1] for s in agg["source"]]
    return pa.table(
        {
            "source": pa.array(list(agg["source"]), pa.string()),
            "p_lo_cents": pa.array(los, pa.int64()),
            "p_hi_cents": pa.array(his, pa.int64()),
            "n_events": pa.array(
                agg["sum(n_events)"].to_numpy(np.int64)
            ),
            "n_clamped_lo": pa.array(
                agg["sum(n_clamped_lo)"].to_numpy(np.int64)
            ),
            "n_clamped_hi": pa.array(
                agg["sum(n_clamped_hi)"].to_numpy(np.int64)
            ),
            "sum_winsorized_cents": pa.array(
                agg["sum(sum_winsorized_cents)"].to_numpy(np.int64)
            ),
        }
    )


def weighted_median_price(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Per-returnflag WEIGHTED median: the smallest price whose
    quantity-weighted cumulative mass reaches half the flag's total
    quantity (lower weighted median, ``2·cumw ≥ total`` in exact
    ints) — the order statistic where every row counts ``l_quantity``
    times, so a plain median sketch is wrong by construction.

    Scale shape: rows collapse block-side to a (flag, price-cents) →
    sum(qty) HISTOGRAM partial, so the ONE exchange is keyed on the
    composite (flag, cents) — high-cardinality, skew-safe — and the
    per-flag reduce that follows walks only DISTINCT prices (price
    domain ≤ ~1e5 values per flag: bounded per-task memory regardless
    of row count; documented assumption — a truly unbounded value
    domain would take the rank-sample sketch path instead).  The final
    cumsum+argmax per flag is one numpy pass over that histogram.

    Output: (l_returnflag, total_qty, wmedian_cents).
    """
    from ray.data.aggregate import Sum

    def _hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["l_extendedprice"], 100.0)),
                    pa.int64(),
                ),
                "w": pc.cast(b["l_quantity"], pa.int64()),
            }
        )
        g = t.group_by(["l_returnflag", "cents"]).aggregate([("w", "sum")])
        return g.rename_columns(["l_returnflag", "cents", "w"])

    hist = (
        lineitem.map_batches(
            _hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["l_returnflag", "cents"])
        .aggregate(Sum("w"))
    )

    def _flag_reduce(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "total_qty": pa.array([], pa.int64()),
                    "wmedian_cents": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(g, sort_keys=[("cents", "ascending")])
        g = g.take(idx)
        w = pc.cast(g["sum(w)"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        cw = np.cumsum(w)
        tot = int(cw[-1])
        pos = int(np.argmax(2 * cw >= tot))  # first True: lower w-median
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"].slice(0, 1),
                "total_qty": pa.array([tot], pa.int64()),
                "wmedian_cents": pa.array([int(cents[pos])], pa.int64()),
            }
        )

    return hist.groupby("l_returnflag").map_groups(
        _flag_reduce, batch_format="pyarrow"
    )


def two_sample_drift(
    events: ray.data.Dataset,
    source_a: str,
    source_b: str,
) -> ray.data.Dataset:
    """EXACT two-sample distribution-drift tests between two sources'
    value distributions: the Kolmogorov–Smirnov statistic
    ``max |ECDF_a − ECDF_b|`` and the Mann–Whitney rank-sum U — the
    pair of classics an A/B value-drift monitor runs, both usually
    quoted as approximations, here exact.

    Neither needs the raw rows co-located: both are functionals of the
    per-value HISTOGRAM (n_a(v), n_b(v)).  Rows collapse block-side to
    (cents → count_a, count_b) partials, ONE exchange keyed on the
    high-cardinality cents domain sums them, and a single bounded
    stitch task (value-domain-sized — distinct cents, not rows;
    documented assumption, same as :func:`weighted_median_price`) runs
    the ordered cumsums.  All comparisons in exact int64: the KS sup
    is ``max |cum_a·n_b − cum_b·n_a|`` (ONE pinned division by
    ``n_a·n_b`` at the end), ties in MWU counted at half weight by
    emitting ``2·U`` as an integer.  Loud guard when ``n_a·n_b``
    exceeds int64 headroom.

    Output: 1 row (source_a, source_b, n_a, n_b, d_num_max, ks_stat,
    u2_a) — u2_a = 2·Σ[a>b] + Σ[a=b] over all cross pairs.
    """
    from ray.data.aggregate import Sum

    def _hist_partial(b: pa.Table) -> pa.Table:
        src = b["event_type"]
        is_a = pc.equal(src, source_a).to_numpy(zero_copy_only=False)
        is_b = pc.equal(src, source_b).to_numpy(zero_copy_only=False)
        keep = is_a | is_b
        if not keep.any():
            return pa.table(
                {
                    "cents": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        sub = b.filter(pa.array(keep))
        cents = pc.cast(
            pc.round(pc.multiply(sub["value"], 100.0)), pa.int64()
        )
        t = pa.table(
            {
                "cents": cents,
                "na": pa.array(is_a[keep].astype(np.int64)),
                "nb": pa.array(is_b[keep].astype(np.int64)),
            }
        )
        g = t.group_by("cents").aggregate([("na", "sum"), ("nb", "sum")])
        return g.rename_columns(["cents", "na", "nb"])

    hist = (
        events.map_batches(
            _hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cents")
        .aggregate(Sum("na"), Sum("nb"))
        .map_batches(
            lambda b: pa.table(
                {
                    "cents": b["cents"],
                    "na": pc.cast(b["sum(na)"], pa.int64()),
                    "nb": pc.cast(b["sum(nb)"], pa.int64()),
                    "__one": pa.array(np.zeros(len(b), np.int32)),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def _stitch(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("cents", "ascending")])
        g = g.take(idx)
        na = g["na"].to_numpy(zero_copy_only=False)
        nb = g["nb"].to_numpy(zero_copy_only=False)
        ta, tb = int(na.sum()), int(nb.sum())
        if ta * tb >= (1 << 62):
            raise ValueError(
                "two_sample_drift: n_a*n_b exceeds int64 headroom — "
                "use the rank-sample sketch path"
            )
        ca, cb = np.cumsum(na), np.cumsum(nb)
        d_num = (
            int(np.abs(ca * tb - cb * ta).max()) if len(g) else 0
        )
        # u2_a: each a-value v beats cb_{<v} b's (weight 2) and ties
        # nb(v) b's (weight 1)
        u2 = int((na * (2 * (cb - nb) + nb)).sum())
        return pa.table(
            {
                "source_a": pa.array([source_a], pa.string()),
                "source_b": pa.array([source_b], pa.string()),
                "n_a": pa.array([ta], pa.int64()),
                "n_b": pa.array([tb], pa.int64()),
                "d_num_max": pa.array([d_num], pa.int64()),
                "ks_stat": pa.array(
                    [d_num / (ta * tb) if ta and tb else 0.0], pa.float64()
                ),
                "u2_a": pa.array([u2], pa.int64()),
            }
        )

    return hist.groupby("__one").map_groups(
        lambda g: _stitch(g.drop_columns(["__one"])), batch_format="pyarrow"
    )


def revenue_pareto_deciles(
    orders: ray.data.Dataset,
    n_tiles: int = 10,
) -> ray.data.Dataset:
    """Revenue CONCENTRATION curve: customers ranked by total spend,
    split into NTILE(``n_tiles``) equal-count bands (SQL tie order
    ``total DESC, custkey``), each band's customer count, revenue and
    cumulative revenue share — "the top 10% of customers carry X% of
    revenue".

    No global sort and no per-customer rank ever happens: the curve is
    a functional of the (total_cents → n_customers) HISTOGRAM, because
    tied customers are revenue-identical — whichever of them NTILE
    pushes across a band boundary, the band AGGREGATES are the same.
    So: per-customer totals (ONE custkey exchange), block-side
    histogram partials, ONE value-domain exchange, and a bounded
    stitch that walks the descending histogram allocating counts
    across band boundaries (10 × |distinct totals| numpy ops).  Every
    share is ONE pinned int/int double division.

    Output: (tile, n_customers, revenue_cents, cum_revenue_cents,
    cum_share), tile 1 = biggest spenders.
    """
    from ray.data.aggregate import Sum

    def _cust_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by("c_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["c_custkey", "cents"])

    totals = (
        orders.map_batches(
            _cust_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("c_custkey")
        .aggregate(Sum("cents"))
    )

    def _hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "total": pc.cast(b["sum(cents)"], pa.int64()),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        g = t.group_by("total").aggregate([("n", "sum")])
        return g.rename_columns(["total", "n"])

    hist = (
        totals.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("total")
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "total": b["total"],
                    "n": pc.cast(b["sum(n)"], pa.int64()),
                    "__one": pa.array(np.zeros(len(b), np.int32)),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def _stitch(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "tile": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "cum_revenue_cents": pa.array([], pa.int64()),
                    "cum_share": pa.array([], pa.float64()),
                }
            )
        idx = pc.sort_indices(g, sort_keys=[("total", "descending")])
        g = g.take(idx)
        v = g["total"].to_numpy(zero_copy_only=False)
        c = g["n"].to_numpy(zero_copy_only=False)
        n = int(c.sum())
        q, r = divmod(n, n_tiles)
        sizes = np.full(n_tiles, q, np.int64)
        sizes[:r] += 1  # SQL NTILE: first r tiles get the extra row
        bnd = np.r_[0, np.cumsum(sizes)]  # tile d covers (bnd[d], bnd[d+1]]
        C = np.r_[0, np.cumsum(c)]  # value bucket i covers (C[i], C[i+1]]
        rev = np.zeros(n_tiles, np.int64)
        cnt = np.zeros(n_tiles, np.int64)
        for d in range(n_tiles):
            lo, hi = bnd[d], bnd[d + 1]
            take = np.clip(np.minimum(C[1:], hi) - np.maximum(C[:-1], lo),
                           0, None)
            cnt[d] = int(take.sum())
            rev[d] = int((v * take).sum())
        grand = int(rev.sum())
        cum = np.cumsum(rev)
        share = (
            cum.astype(np.float64) / np.float64(grand)
            if grand
            else np.zeros(n_tiles)
        )
        keep = cnt > 0
        return pa.table(
            {
                "tile": pa.array(
                    (np.arange(n_tiles, dtype=np.int64) + 1)[keep]
                ),
                "n_customers": pa.array(cnt[keep]),
                "revenue_cents": pa.array(rev[keep]),
                "cum_revenue_cents": pa.array(cum[keep]),
                "cum_share": pa.array(share[keep]),
            }
        )

    return hist.groupby("__one").map_groups(
        lambda g: _stitch(g.drop_columns(["__one"])), batch_format="pyarrow"
    )
