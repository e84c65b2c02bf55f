"""Round-4g operators vs brute-force references: sliding DISTINCT
window, Q18 HAVING filter, Q14 promo share, Q4 EXISTS collapse, and
the distributed Gram matrix."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.relational import (
    large_volume_orders,
    late_order_priority,
    promo_revenue_share,
)
from workbook_exporter_fe_ray.stages.similarity import embedding_gram_matrix
from workbook_exporter_fe_ray.stages.window import rolling_distinct_users_1h

US = 1_000_000
HOUR = 3_600 * US
DAY = 86_400 * US


def _events_table(n=2500, n_src=6, n_users=12, seed=53) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 6 * HOUR, n)
    ts[100:140] = ts[99]  # equal-ts peer block (same + cross user)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"src_{i}" for i in rng.integers(0, n_src, n)], pa.string()
            ),
            "value": pa.array(np.round(rng.normal(0, 80, n), 2), pa.float64()),
        }
    )


def test_rolling_distinct_multi_run_vs_brute(ray_session):
    # num_partitions=1 puts ALL 6 source runs in one sweep group — the
    # composite-encoding path must keep probes inside each run.
    tbl = _events_table()
    out = (
        rolling_distinct_users_1h(
            ray.data.from_arrow(tbl).repartition(5), num_partitions=1
        )
        .to_pandas()
        .set_index("event_id")["n_distinct_users"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    assert len(out) == len(df)
    for _, g in df.groupby("event_type"):
        tsu = g["tsu"].to_numpy()
        uid = g["user_id"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            m = (tsu >= tsu[i] - HOUR) & (tsu <= tsu[i])
            assert out.loc[ids[i]] == len(np.unique(uid[m])), ids[i]


def test_rolling_distinct_one_user_many_events(ray_session):
    # a single user firing 50 times inside one hour is ONE distinct
    ts = 1_700_000_000 * US + np.arange(50, dtype=np.int64) * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(50, dtype=np.int64)),
            "user_id": pa.array(np.zeros(50, np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a"] * 50, pa.string()),
            "value": pa.array(np.ones(50), pa.float64()),
        }
    )
    out = rolling_distinct_users_1h(ray.data.from_arrow(tbl)).to_pandas()
    assert (out["n_distinct_users"] == 1).all()


def test_embedding_gram_matrix_vs_numpy(ray_session):
    rng = np.random.default_rng(11)
    n, d = 300, 8
    X = rng.normal(0, 0.2, (n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    out = (
        embedding_gram_matrix(ray.data.from_arrow(tbl).repartition(7))
        .to_pandas()
        .set_index(["i", "j"])["gram_units"]
        .sort_index()
    )
    Q = np.floor(X.astype(np.float64) * 1e6).astype(np.int64)
    G = Q.T @ Q
    assert len(out) == d * (d + 1) // 2
    for (i, j), v in out.items():
        assert v == G[i, j], (i, j)


def test_large_volume_orders_threshold_and_empty(ray_session):
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
            "l_quantity": pa.array([40.0, 45.0, 10.0, 30.0, 30.0, 30.0]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 8, 9], pa.int64()),
            "o_orderdate": pa.array([0, 0, 0], pa.timestamp("us")),
            "o_totalprice": pa.array([10.0, 20.0, 30.0]),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([7, 8, 9], pa.int64()),
            "c_name": pa.array(["A", "B", "C"], pa.string()),
        }
    )
    out = large_volume_orders(
        ray.data.from_arrow(li),
        ray.data.from_arrow(orders),
        ray.data.from_arrow(cust),
        min_qty=85,
    )
    assert out["o_orderkey"].to_pylist() == [3, 1]  # 90 desc, 85
    assert out["c_name"].to_pylist() == ["C", "A"]
    empty = large_volume_orders(
        ray.data.from_arrow(li),
        ray.data.from_arrow(orders),
        ray.data.from_arrow(cust),
        min_qty=10_000,
    )
    assert len(empty) == 0


def test_promo_share_and_late_priority_brute(ray_session):
    rng = np.random.default_rng(3)
    n = 600
    li = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, 80, n).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(1, 900, n), 2)),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
            "l_shipdate": pa.array(
                (1_700_000_000 * US + rng.integers(0, 90 * DAY, n)).astype(
                    np.int64
                ),
                pa.timestamp("us"),
            ),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(40, dtype=np.int64)),
            "p_type": pa.array(
                ["PROMO" if k % 3 == 0 else "STANDARD" for k in range(40)]
            ),
        }
    )
    out = promo_revenue_share(ray.data.from_arrow(li).repartition(4), part)
    df = li.to_pandas()
    units = (
        np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        * (100 - np.round(df["l_discount"].to_numpy() * 100).astype(np.int64))
    )
    promo_mask = (df["l_partkey"].to_numpy() % 3) == 0
    assert out["promo_units"][0].as_py() == int(units[promo_mask].sum())
    assert out["total_units"][0].as_py() == int(units.sum())
    assert out["promo_share"][0].as_py() == (
        int(units[promo_mask].sum()) / int(units.sum())
    )

    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(80, dtype=np.int64)),
            "o_orderdate": pa.array(
                np.full(80, 1_700_000_000 * US, np.int64), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                [f"{k % 3}-P" for k in range(80)], pa.string()
            ),
        }
    )
    out2 = (
        late_order_priority(
            ray.data.from_arrow(li).repartition(4),
            ray.data.from_arrow(orders),
        )
        .to_pandas()
        .set_index("o_orderpriority")["n_late_orders"]
        .sort_index()
    )
    ms = df.groupby("l_orderkey")["l_shipdate"].max()
    late_keys = ms.index[
        ms.astype(np.int64) > 1_700_000_000 * US + 30 * DAY
    ].to_numpy()
    exp = (
        pa.table({"p": [f"{int(k) % 3}-P" for k in late_keys]})
        .to_pandas()["p"]
        .value_counts()
        .sort_index()
    )
    assert list(out2.index) == list(exp.index)
    assert list(out2.values) == list(exp.values)
