"""Events-table pipeline: the driver's `events` stream mapped onto the
point schema (source=event_type, ts, value) and run through the same
rollup / cascade / gap-fill / compression machinery.

Float policy for oracle-checked results: ``value`` is scaled to exact
integer cents (``round(value * 100)`` — the corpus is 2-decimal) so
every sum is an exact int64 and every mean is a single int→float
division; this makes the Ray results hash-identical to the DuckDB
oracle regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources import read_table
from ..stages.compress import compress_chunks
from ..stages.gapfill import gapfill
from ..stages.rollup import cascade_from_tier, rollup_tier

FINAL_COLS = ["source", "bucket_ts", "n_points", "sum_cents", "min_cents", "max_cents", "mean_cents"]


def read_event_points(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def _derive(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table(
            {"source": b["event_type"], "ts": b["ts"], "value_cents": cents}
        )

    return ds.map_batches(_derive, batch_format="pyarrow", zero_copy_batch=True)


def _to_final(tier: ray.data.Dataset) -> ray.data.Dataset:
    """Rename engine rollup columns to the oracle-shared names and derive
    mean_cents = CAST(sum AS DOUBLE)/count (identical op on both sides)."""

    def _f(b: pa.Table) -> pa.Table:
        s = b["sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": pc.cast(b["bucket_ts"], pa.timestamp("us")),
                "n_points": b["count"],
                "sum_cents": pa.array(s, pa.int64()),
                "min_cents": pc.cast(b["min"], pa.int64()),
                "max_cents": pc.cast(b["max"], pa.int64()),
                "mean_cents": pa.array(s.astype(np.float64) / c.astype(np.float64)),
            }
        )

    return tier.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def rollup_events(sf_dir: str, bucket_s: int, salt_mod: int | None = None) -> ray.data.Dataset:
    pts = read_event_points(sf_dir)
    return _to_final(rollup_tier(pts, bucket_s, value_col="value_cents", salt_mod=salt_mod))


def rollup_events_cascade(sf_dir: str, fine_bucket_s: int, coarse_bucket_s: int) -> ray.data.Dataset:
    """Coarse tier genuinely built from the fine tier's partials."""
    pts = read_event_points(sf_dir)
    fine = rollup_tier(pts, fine_bucket_s, value_col="value_cents")
    return _to_final(cascade_from_tier(fine, coarse_bucket_s))


def gapfill_events_1h(sf_dir: str, strategy: str = "locf") -> ray.data.Dataset:
    # windowed (unbounded-series) plan, one-week windows — bit-identical
    # to the per-source plan (tests/test_gapfill_compress.py) and kept
    # under the SQL oracle so the driver gate proves the windowed path
    t1h = rollup_events(sf_dir, 3600)
    return gapfill(
        t1h, 3600, strategy=strategy, value_col="mean_cents", window_buckets=168
    )


def events_flagship(sf_dir: str) -> ray.data.Dataset:
    """Full cascade 1m→5m→1h→1d over events, all tiers tagged + unioned
    (the smoke-check pipeline for entry()).

    Runs on the single packed exchange (`cascade_rollup`): tier t+1 is
    still genuinely built from tier t's partials, but inside one reduce
    task per (source, day) instead of four chained shuffles. The
    four-shuffle variant survives as `rollup_events` /
    `rollup_events_cascade` (oracle-checked per tier).

    ``dedup=False``: the events stream has no byte-identical-duplicate
    contract — two distinct events may legally share (event_type, ts) —
    so every point is aggregated, matching the per-tier SQL oracles."""
    from ..stages.rollup import cascade_rollup

    pts = read_event_points(sf_dir)
    rolled = cascade_rollup(pts, value_col="value_cents", dedup=False)

    def _final_tagged(b: pa.Table) -> pa.Table:
        s = b["sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": pc.cast(b["bucket_ts"], pa.timestamp("us")),
                "n_points": b["count"],
                "sum_cents": pa.array(s, pa.int64()),
                "min_cents": pc.cast(b["min"], pa.int64()),
                "max_cents": pc.cast(b["max"], pa.int64()),
                "mean_cents": pa.array(s.astype(np.float64) / c.astype(np.float64)),
                "tier": b["tier"],
            }
        )

    return rolled.map_batches(_final_tagged, batch_format="pyarrow", zero_copy_batch=True)


def compress_events(sf_dir: str) -> ray.data.Dataset:
    """Gorilla chunks over the raw event value series (per event_type/day)."""
    pts = read_event_points(sf_dir)
    return compress_chunks(pts, value_col="value_cents")


def retention_apply_events(
    sf_dir: str,
    cutoff_raw_iso: str = "2024-01-20",
    cutoff_1m_iso: str = "2024-01-10",
) -> ray.data.Dataset:
    """Retention-policy materialization — the north rule's tiered
    retention windows as one queryable result: the newest band keeps
    RAW points, the middle band keeps only the 1-minute tier, and
    everything older keeps only the 1-hour tier (reference analog:
    the exporter's keep-newest upsert semantics, applied per tier).

    Shape: one pruned read; each band is a pushdown-able timestamp
    filter feeding the shared exact-cents rollup. The two tier bands
    are materialized before the union (tier-sized: bounded by bucket
    count, not points) — a single streaming graph holding two sort
    exchanges plus unions livelocks the executor's per-operator
    reservation on very small clusters (see stages/dedup.py note)."""
    import datetime as dt

    t_raw = dt.datetime.fromisoformat(cutoff_raw_iso)
    t_1m = dt.datetime.fromisoformat(cutoff_1m_iso)
    pts = read_event_points(sf_dir)

    def _band(lo, hi):
        def _f(b: pa.Table) -> pa.Table:
            m = pa.array(np.ones(len(b), bool)) if lo is None else pc.greater_equal(
                b["ts"], pa.scalar(lo, pa.timestamp("us"))
            )
            if hi is not None:
                m = pc.and_(m, pc.less(b["ts"], pa.scalar(hi, pa.timestamp("us"))))
            return b.filter(m)

        return _f

    def _tag(granularity: str):
        def _t(b: pa.Table) -> pa.Table:
            return b.append_column(
                "granularity", pa.array([granularity] * len(b), pa.string())
            )

        return _t

    def _raw_rows(b: pa.Table) -> pa.Table:
        cents = b["value_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "bucket_ts": pc.cast(b["ts"], pa.timestamp("us")),
                "n_points": pa.array(np.ones(len(b), np.int64)),
                "sum_cents": pa.array(cents, pa.int64()),
                "min_cents": pa.array(cents, pa.int64()),
                "max_cents": pa.array(cents, pa.int64()),
                "mean_cents": pa.array(cents.astype(np.float64)),
            }
        )

    raw = (
        pts.map_batches(_band(t_raw, None), batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_raw_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_tag("raw"), batch_format="pyarrow", zero_copy_batch=True)
    )
    mid = (
        _to_final(
            rollup_tier(
                pts.map_batches(_band(t_1m, t_raw), batch_format="pyarrow", zero_copy_batch=True),
                60,
                value_col="value_cents",
            )
        )
        .map_batches(_tag("1m"), batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    old = (
        _to_final(
            rollup_tier(
                pts.map_batches(_band(None, t_1m), batch_format="pyarrow", zero_copy_batch=True),
                3600,
                value_col="value_cents",
            )
        )
        .map_batches(_tag("1h"), batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    return raw.union(mid).union(old)


def tier_consistency_audit(
    sf_dir: str,
    fine_bucket_s: int = 60,
    coarse_bucket_s: int = 3600,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Continuous-aggregate integrity audit: build the coarse tier BOTH
    ways — directly from points and cascaded from the fine tier's
    partials — and count, per source, the coarse buckets where every
    statistic (count / sum / min / max) agrees. On a correct engine
    n_agree == n_buckets; a drifting cascade (lost partial, double
    merge, wrong rebucket edge) shows up as a deficit the driver's
    value hash catches. This is the audit a tiered TSDB runs after a
    backfill before swapping a tier into serving.

    One bucket-bounded exchange: both tiers are tagged and unioned,
    routed by (source, bucket_ts) hash, and compared in-sweep as runs
    of exactly two rows; per-partition (source, n_buckets, n_agree,
    sum_cents) partials collapse in a final sources-sized groupby.

    Output: (source, n_buckets, n_agree, sum_cents) — all int64.
    """
    from ..stages.sweep import run_starts_table, with_part

    pts = read_event_points(sf_dir)
    direct = rollup_tier(pts, coarse_bucket_s, value_col="value_cents")
    fine = rollup_tier(pts, fine_bucket_s, value_col="value_cents")
    casc = cascade_from_tier(fine, coarse_bucket_s)

    def _tag_path(tag: int):
        def _t(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "source": b["source"],
                    "bucket_ts": pc.cast(
                        pc.cast(b["bucket_ts"], pa.timestamp("us")), pa.int64()
                    ),
                    "count": pc.cast(b["count"], pa.int64()),
                    "sum": pc.cast(b["sum"], pa.int64()),
                    "min": pc.cast(b["min"], pa.int64()),
                    "max": pc.cast(b["max"], pa.int64()),
                    "tag": pa.array(
                        np.full(len(b), tag, dtype=np.int8), pa.int8()
                    ),
                }
            )
            return with_part(t, ["source", "bucket_ts"], num_partitions)

        return _t

    tagged = direct.map_batches(
        _tag_path(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        casc.map_batches(_tag_path(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("source", "ascending"),
                ("bucket_ts", "ascending"),
                ("tag", "ascending"),
            ],
        )
        g = g.take(idx)
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_buckets": pa.array([], pa.int64()),
                    "n_agree": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        starts = run_starts_table(g, ["source", "bucket_ts"])
        lens = np.diff(np.r_[starts, n])
        cols = {
            c: g[c].to_numpy(zero_copy_only=False)
            for c in ("count", "sum", "min", "max", "tag")
        }
        paired = lens == 2
        f = starts[paired]
        agree = paired.copy()
        agree[paired] = (
            (cols["tag"][f] != cols["tag"][f + 1])
            & (cols["count"][f] == cols["count"][f + 1])
            & (cols["sum"][f] == cols["sum"][f + 1])
            & (cols["min"][f] == cols["min"][f + 1])
            & (cols["max"][f] == cols["max"][f + 1])
        )
        # per-source rollup of the run-level flags
        src_starts = run_starts_table(g, ["source"])
        run_src = np.searchsorted(src_starts, starts, side="right") - 1
        n_src = len(src_starts)
        n_buckets = np.bincount(run_src, minlength=n_src).astype(np.int64)
        # int64 accumulators (bincount weights are float64 — inexact
        # past 2**53, and sum_cents partials get there at scale)
        n_agree = np.zeros(n_src, dtype=np.int64)
        np.add.at(n_agree, run_src, agree.astype(np.int64))
        direct_rows = cols["tag"] == 0
        src_of_row = np.searchsorted(src_starts, np.arange(n), side="right") - 1
        sum_cents = np.zeros(n_src, dtype=np.int64)
        np.add.at(sum_cents, src_of_row[direct_rows], cols["sum"][direct_rows])
        return pa.table(
            {
                "source": g["source"].take(pa.array(src_starts)),
                "n_buckets": pa.array(n_buckets, pa.int64()),
                "n_agree": pa.array(n_agree, pa.int64()),
                "sum_cents": pa.array(sum_cents, pa.int64()),
            }
        )

    partials = tagged.groupby("__part").map_groups(_sweep, batch_format="pyarrow")
    summed = (
        partials.groupby("source")
        .sum(["n_buckets", "n_agree", "sum_cents"])
    )
    return summed.map_batches(
        lambda b: pa.table(
            {
                "source": b["source"],
                "n_buckets": pc.cast(b["sum(n_buckets)"], pa.int64()),
                "n_agree": pc.cast(b["sum(n_agree)"], pa.int64()),
                "sum_cents": pc.cast(b["sum(sum_cents)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def incremental_merge_audit(
    sf_dir: str,
    bucket_s: int = 3600,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Resume/backfill mergeability audit — the incremental sibling of
    :func:`tier_consistency_audit`: the 1h tier is built ONCE directly
    over all events and ONCE as the merge of two disjoint half-streams
    (event_id parity split — both halves land partials in the SAME
    buckets, so the merge must sum counts/sums and fold min/max), and
    the audit counts buckets where every statistic agrees.  On a
    correct engine n_agree == n_buckets; this is exactly the property
    that makes checkpoint-resume (north rule) sound — a tier rebuilt
    from saved partial partitions must equal the single-pass tier.

    One bucket-bounded exchange: direct rows (tag 0) and both half
    tiers (tag 1) union, route by (source, bucket_ts), and a run
    sweep folds the tag-1 partials before the compare; per-partition
    int64 (n_buckets, n_agree) partials collapse in a sources-sized
    final groupby.

    Output: (source, n_buckets, n_agree) — all int64.
    """
    from ray.data.aggregate import Sum

    from ..sources import read_table
    from ..stages.rollup import rollup_tier
    from ..stages.sweep import run_starts_table, with_part

    ds = read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
    )

    def _derive(parity: int | None):
        def _d(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "source": b["event_type"],
                    "ts": b["ts"],
                    "value_cents": pc.cast(
                        pc.round(pc.multiply(b["value"], 100.0)), pa.int64()
                    ),
                }
            )
            if parity is None:
                return t
            eid = pc.cast(b["event_id"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return t.filter(pa.array(eid % 2 == parity))

        return _d

    direct = rollup_tier(
        ds.map_batches(_derive(None), batch_format="pyarrow", zero_copy_batch=True),
        bucket_s,
        value_col="value_cents",
    )
    halves = [
        rollup_tier(
            ds.map_batches(
                _derive(p), batch_format="pyarrow", zero_copy_batch=True
            ),
            bucket_s,
            value_col="value_cents",
        )
        for p in (0, 1)
    ]

    def _tag_path(tag: int):
        def _t(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "source": b["source"],
                    "bucket_ts": pc.cast(
                        pc.cast(b["bucket_ts"], pa.timestamp("us")), pa.int64()
                    ),
                    "count": pc.cast(b["count"], pa.int64()),
                    "sum": pc.cast(b["sum"], pa.int64()),
                    "min": pc.cast(b["min"], pa.int64()),
                    "max": pc.cast(b["max"], pa.int64()),
                    "tag": pa.array(np.full(len(b), tag, dtype=np.int8), pa.int8()),
                }
            )
            return with_part(t, ["source", "bucket_ts"], num_partitions)

        return _t

    tagged = direct.map_batches(
        _tag_path(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        halves[0].map_batches(
            _tag_path(1), batch_format="pyarrow", zero_copy_batch=True
        ),
        halves[1].map_batches(
            _tag_path(1), batch_format="pyarrow", zero_copy_batch=True
        ),
    )

    def _sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_buckets": pa.array([], pa.int64()),
                "n_agree": pa.array([], pa.int64()),
            }
        )
        n = len(g)
        if n == 0:
            return empty
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("source", "ascending"),
                ("bucket_ts", "ascending"),
                ("tag", "ascending"),
            ],
        )
        g = g.take(idx)
        starts = run_starts_table(g, ["source", "bucket_ts"])
        lens = np.diff(np.r_[starts, n])
        tag = g["tag"].to_numpy(zero_copy_only=False)
        cnt = g["count"].to_numpy(zero_copy_only=False)
        sm = g["sum"].to_numpy(zero_copy_only=False)
        mn = g["min"].to_numpy(zero_copy_only=False)
        mx = g["max"].to_numpy(zero_copy_only=False)
        i64 = np.int64
        is_half = (tag == 1).astype(i64)
        # fold the tag-1 partials per run (tag sorts the direct row
        # first): merged count/sum = sums over halves; min/max = folds
        m_cnt = np.add.reduceat(is_half * cnt, starts)
        m_sum = np.add.reduceat(is_half * sm, starts)
        BIG = np.int64(1) << np.int64(62)
        m_min = np.minimum.reduceat(np.where(tag == 1, mn, BIG), starts)
        m_max = np.maximum.reduceat(np.where(tag == 1, mx, -BIG), starts)
        has_direct = np.add.reduceat((tag == 0).astype(i64), starts) > 0
        has_half = np.add.reduceat(is_half, starts) > 0
        d_cnt, d_sum = cnt[starts], sm[starts]  # direct sorts first
        d_min, d_max = mn[starts], mx[starts]
        agree = (
            has_direct
            & has_half
            & (m_cnt == d_cnt)
            & (m_sum == d_sum)
            & (m_min == d_min)
            & (m_max == d_max)
        )
        t = pa.table(
            {
                "source": g["source"].take(pa.array(starts)),
                "n_buckets": pa.array(np.ones(len(starts), i64)),
                "n_agree": pa.array(agree.astype(i64)),
            }
        )
        g2 = t.group_by("source").aggregate(
            [("n_buckets", "sum"), ("n_agree", "sum")]
        )
        return g2.rename_columns(["source", "n_buckets", "n_agree"])

    agg = (
        tagged.groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_buckets"), Sum("n_agree"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_buckets": pc.cast(b["sum(n_buckets)"], pa.int64()),
                "n_agree": pc.cast(b["sum(n_agree)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")
