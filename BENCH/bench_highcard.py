"""High-key-cardinality bench: coarse-partition sweep vs naive per-key
map_groups (VERDICT r1 item 1 'done' evidence).

Usage: python BENCH/bench_highcard.py [n_rows] [n_users]

Times first_event_per_user / sessionize / grouped_quantiles on a
synthetic corpus with many distinct keys, plus a naive
``groupby(key).map_groups`` first-event on a smaller slice to quantify
the per-group Python overhead the sweep removes. Prints one JSON line;
record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray
import ray.data

US = 1_000_000


def make_ds(n_rows: int, n_users: int, blocks: int = 64) -> ray.data.Dataset:
    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, n_users, n_rows).astype(np.int64)),
            "ts": pa.array(
                rng.integers(0, 30 * 86_400 * US, n_rows).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "value": pa.array(rng.integers(0, 10_000, n_rows) / 100.0),
            # bounded-cardinality int column (the grouped_quantiles
            # histogram design envelope: distinct values ≪ rows)
            "n_chars": pa.array(rng.integers(0, 1000, n_rows).astype(np.int64)),
            "event_type": pa.array(
                np.array(["t%05d" % t for t in rng.integers(0, 20_000, n_rows)])
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks).materialize()


def naive_first_event(events: ray.data.Dataset) -> ray.data.Dataset:
    """The round-1 shape: one Python UDF call per user (for comparison)."""
    import pyarrow.compute as pc

    def _first(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        row = g.take(idx[:1])
        return pa.table(
            {
                "user_id": row["user_id"],
                "first_ts": row["ts"],
                "first_type": row["event_type"],
            }
        )

    return events.groupby("user_id").map_groups(_first, batch_format="pyarrow")


def make_lowcard_ds(n_rows: int, n_keys: int, blocks: int = 64) -> ray.data.Dataset:
    """The straggler shape: a handful of PARTITION BY keys holding the
    whole corpus (the driver corpus has 5 event types)."""
    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 1000, n_rows).astype(np.int64)),
            "ts": pa.array(
                rng.integers(0, 30 * 86_400 * US, n_rows).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "value": pa.array(rng.integers(0, 10_000, n_rows) / 100.0),
            "event_type": pa.array(
                np.array(["k%d" % k for k in rng.integers(0, n_keys, n_rows)])
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks).materialize()


def lowcard_main() -> None:
    """VERDICT r3 item 1 evidence: order-dependent windows over
    LOW-cardinality keys — two-pass global rank / windowed carry chain
    vs the one-task-per-key sweep. Usage:
    python BENCH/bench_highcard.py --lowcard [n_rows] [n_keys]"""
    args = [a for a in sys.argv[2:]]
    n_rows = int(args[0]) if len(args) > 0 else 2_000_000
    n_keys = int(args[1]) if len(args) > 1 else 5
    reps = int(args[2]) if len(args) > 2 else 3
    only = args[3].split(",") if len(args) > 3 else None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from workbook_exporter_fe_ray.stages.window import (
        cume_dist_by_value,
        ewma_per_source,
        lttb_downsample,
        percent_rank_by_value,
    )

    ds = make_lowcard_ds(n_rows, n_keys)
    out: dict[str, float] = {}
    cases = [
        ("percent_rank_sweep", lambda: percent_rank_by_value(ds, plan="sweep")),
        ("percent_rank_global", lambda: percent_rank_by_value(ds, plan="global")),
        ("cume_dist_sweep", lambda: cume_dist_by_value(ds, plan="sweep")),
        ("cume_dist_global", lambda: cume_dist_by_value(ds, plan="global")),
        ("ewma_sweep", lambda: ewma_per_source(ds, plan="sweep")),
        (
            "ewma_windowed_1d",
            lambda: ewma_per_source(ds, plan="windowed", window_s=86_400),
        ),
        ("lttb_sweep", lambda: lttb_downsample(ds, plan="sweep")),
        ("lttb_windowed", lambda: lttb_downsample(ds, plan="windowed")),
    ]
    for name, fn in cases:
        if only is not None and not any(name.startswith(o) for o in only):
            continue
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = fn().count()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = min(walls)
        out[name + "_walls"] = walls
        out[name + "_rows"] = n
    for fam, a, b in (
        ("percent_rank", "percent_rank_sweep", "percent_rank_global"),
        ("cume_dist", "cume_dist_sweep", "cume_dist_global"),
        ("lttb", "lttb_sweep", "lttb_windowed"),
        ("ewma", "ewma_sweep", "ewma_windowed_1d"),
    ):
        if a in out and b in out:
            out[fam + "_speedup"] = round(out[a] / out[b], 2)
    print(
        json.dumps(
            {
                "metric": "lowcard_window_bench",
                "n_rows": n_rows,
                "n_keys": n_keys,
                **out,
            }
        )
    )
    ray.shutdown()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--lowcard":
        lowcard_main()
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from workbook_exporter_fe_ray.stages.relational import (
        first_event_per_user,
        range_join_window_counts,
        sessionize,
    )
    from workbook_exporter_fe_ray.stages.sketch import grouped_quantiles

    ds = make_ds(n_rows, n_users)
    out: dict[str, float] = {}

    from workbook_exporter_fe_ray.stages.window import (
        dense_rank_by_value,
        keyed_cumsum,
        ntile_by_value,
        rolling_min_per_user,
        transition_counts,
    )

    for name, fn in [
        ("first_event_sweep", lambda: first_event_per_user(ds, num_partitions=64)),
        ("sessionize_sweep", lambda: sessionize(ds, num_partitions=64)),
        (
            "grouped_quantiles_sweep",
            lambda: grouped_quantiles(ds, key="event_type", value_col="n_chars"),
        ),
        # round-2 window family: every op is a full-output scan over
        # 200k user keys — the per-key-UDF shape would pay 200k Python
        # calls here
        ("cumsum_sweep", lambda: keyed_cumsum(ds, num_partitions=64)),
        ("rolling_min_sweep", lambda: rolling_min_per_user(ds, num_partitions=64)),
        ("ntile_sweep", lambda: ntile_by_value(ds, num_partitions=64)),
        ("dense_rank_sweep", lambda: dense_rank_by_value(ds, num_partitions=64)),
        ("transitions_sweep", lambda: transition_counts(ds, num_partitions=64)),
        # r3: range join with a 20k-key window side (100k windows) —
        # the composite searchsorted counter must stay ~flat vs the
        # 5-key driver corpus (VERDICT r2 item 2 'done' evidence)
        (
            "range_join_20k_keys",
            lambda: range_join_window_counts(ds, key="event_type"),
        ),
    ]:
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn().count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        out[name + "_rows"] = n

    # naive per-key comparison on a smaller slice (it is the slow shape)
    small = make_ds(100_000, 20_000, blocks=16)
    t0 = time.perf_counter()
    out["naive_first_event_rows"] = naive_first_event(small).count()
    out["naive_first_event_100k_20kusers"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    first_event_per_user(small, num_partitions=64).count()
    out["sweep_first_event_100k_20kusers"] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "highcard_sweep_bench",
                "n_rows": n_rows,
                "n_users": n_users,
                **out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
