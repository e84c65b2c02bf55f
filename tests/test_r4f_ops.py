"""Round-4f operators vs brute-force single-process references:
RANGE-frame trailing window, Benford digits, user lifespans, and the
Q10-shaped returned-revenue top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.relational import returned_revenue_topn
from workbook_exporter_fe_ray.stages.window import (
    benford_first_digit,
    range_frame_sum_1h,
    user_lifespan_hist,
)

US = 1_000_000
DAY = 86_400 * US
HOUR = 3_600 * US


def _events_table(n=4000, seed=31) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 2 * DAY, n)
    ts[50:80] = ts[49]  # equal-ts peers: RANGE frames must include them
    vals = np.round(rng.normal(0, 900, n), 2)
    vals[200:220] = 0.0  # zero cents -> Benford digit 0
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 4, n)], pa.string()
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )


def test_range_frame_includes_peers_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        range_frame_sum_1h(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    assert len(out) == len(df)
    for src, g in df.groupby("event_type"):
        tsu = g["tsu"].to_numpy()
        c = g["c"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            m = (tsu >= tsu[i] - HOUR) & (tsu <= tsu[i])
            row = out.loc[ids[i]]
            assert row["n_in_frame"] == int(m.sum()), (src, ids[i])
            assert row["sum_cents_frame"] == int(c[m].sum()), (src, ids[i])


def test_benford_first_digit_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        benford_first_digit(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["source", "digit"])["n_events"]
        .sort_index()
    )
    df = tbl.to_pandas()
    c = np.abs(np.round(df["value"].to_numpy() * 100.0).astype(np.int64))
    digit = np.array([int(str(v)[0]) for v in c], np.int64)
    exp = (
        pd.DataFrame({"source": df["event_type"], "digit": digit, "n": 1})
        .groupby(["source", "digit"])["n"]
        .sum()
        .sort_index()
    )
    assert (out == exp).all() and len(out) == len(exp)
    # the planted zeros show up as digit 0
    assert out.loc[[(s, 0) for s in out.index.get_level_values(0).unique()
                    if (s, 0) in out.index]].sum() >= 1


def test_user_lifespan_hist_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        user_lifespan_hist(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("lifespan_days")["n_users"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    span = df.groupby("user_id")["tsu"].agg(lambda s: s.max() - s.min())
    exp = (span // DAY).value_counts().sort_index()
    assert list(out.index) == list(exp.index)
    assert list(out.values) == list(exp.values)
    assert out.sum() == df["user_id"].nunique()


def test_returned_revenue_topn_ties_and_names(ray_session):
    # 6 customers; two with EQUAL revenue -> tie broken by custkey asc;
    # one customer has no returned lineitem -> absent from result.
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, 13, dtype=np.int64)),
            "o_custkey": pa.array(
                np.array([1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6], np.int64)
            ),
        }
    )
    # revenue_units per row = cents * (100 - disc_pp)
    li = pa.table(
        {
            "l_orderkey": pa.array(
                np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 11], np.int64)
            ),
            "l_extendedprice": pa.array(
                [10.0, 20.0, 15.0, 15.0, 40.0, 1.0, 22.0, 8.0, 100.0, 7.0],
                pa.float64(),
            ),
            "l_discount": pa.array(
                [0.0, 0.0, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0, 0.05, 0.0],
                pa.float64(),
            ),
            "l_returnflag": pa.array(
                ["R", "R", "R", "R", "R", "R", "R", "R", "N", "R"], pa.string()
            ),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, 7, dtype=np.int64)),
            "c_name": pa.array([f"Cust#{i}" for i in range(1, 7)], pa.string()),
        }
    )
    out = returned_revenue_topn(
        ray.data.from_arrow(li).repartition(3),
        ray.data.from_arrow(orders).repartition(2),
        ray.data.from_arrow(customer),
        k=4,
        n_buckets=4,
    ).to_pandas()
    # revenues: cust1 = (1000+2000)*100 = 300000; cust2 = 300000 (tie);
    # cust3 = 4000*90 + 100*100 = 370000; cust4 = 300000 (tie with 1,2);
    # cust5's only 'R' row is order 11 -> 700*100 = 70000; cust6 none.
    assert list(out["c_custkey"]) == [3, 1, 2, 4]
    assert list(out["revenue_units"]) == [370000, 300000, 300000, 300000]
    assert list(out["c_name"]) == ["Cust#3", "Cust#1", "Cust#2", "Cust#4"]


def test_range_frame_multi_run_partition_vs_brute(ray_session):
    # num_partitions=1 forces ALL source runs into ONE sweep group —
    # the case where a plain global searchsorted over the piecewise-
    # sorted ts array goes wrong; sources get disjoint ts ranges so a
    # mis-routed bisect probe cannot land correct by coincidence.
    rng = np.random.default_rng(97)
    base = 1_700_000_000 * US
    parts = []
    for s in range(6):  # disjoint, source-offset time ranges
        n = 300
        ts = base + s * 40 * DAY + rng.integers(0, 3 * HOUR, n)
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        np.arange(n, dtype=np.int64) + 10_000 * s
                    ),
                    "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64)),
                    "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
                    "event_type": pa.array([f"src_{s}"] * n, pa.string()),
                    "value": pa.array(
                        np.round(rng.normal(0, 40, n), 2), pa.float64()
                    ),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    out = (
        range_frame_sum_1h(
            ray.data.from_arrow(tbl).repartition(4), num_partitions=1
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    assert len(out) == len(df)
    for src, g in df.groupby("event_type"):
        tsu = g["tsu"].to_numpy()
        c = g["c"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            m = (tsu >= tsu[i] - HOUR) & (tsu <= tsu[i])
            row = out.loc[ids[i]]
            assert row["n_in_frame"] == int(m.sum()), (src, ids[i])
            assert row["sum_cents_frame"] == int(c[m].sum()), (src, ids[i])
