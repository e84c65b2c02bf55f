"""r5 TPC-H closures (Q2/Q9/Q11/Q12/Q16/Q20 shapes) — engineered
mini-corpus truth for each query's distinctive semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.relational import (
    excess_shippers,
    important_part_values,
    min_cost_supplier,
    priority_line_counts,
    product_type_profit,
    supplier_part_counts,
)

US_DAY = 86_400_000_000
T0 = 852_076_800_000_000  # 1997-01-01 UTC µs


def _li(rows):
    """rows: (orderkey, partkey, suppkey, qty, price, disc, flag, ship_us)"""
    ok, pk, sk, q, pr, d, fl, sh = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(sk, pa.int64()),
                "l_quantity": pa.array([float(x) for x in q], pa.float64()),
                "l_extendedprice": pa.array([float(x) for x in pr], pa.float64()),
                "l_discount": pa.array([float(x) for x in d], pa.float64()),
                "l_returnflag": pa.array(fl, pa.string()),
                "l_shipdate": pa.array(sh, pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )


def _part(rows):
    pk, name, brand, typ, size = zip(*rows)
    return pa.table(
        {
            "p_partkey": pa.array(pk, pa.int64()),
            "p_name": pa.array(name, pa.string()),
            "p_brand": pa.array(brand, pa.string()),
            "p_type": pa.array(typ, pa.string()),
            "p_size": pa.array(size, pa.int64()),
        }
    )


def _supp(rows):
    sk, name, nat, bal = zip(*rows)
    return pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array(name, pa.string()),
            "s_nationkey": pa.array(nat, pa.int64()),
            "s_acctbal": pa.array([float(x) for x in bal], pa.float64()),
        }
    )


_NATION = pa.table(
    {
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }
)


def test_q2_min_cost_ties_and_region_filter(ray_session):
    """Two region suppliers tie at the per-part min; an out-of-region
    supplier with a CHEAPER price must not win (region filter first)."""
    li = _li(
        [
            (1, 10, 100, 1, 5.00, 0.0, "N", T0),
            (2, 10, 101, 1, 5.00, 0.0, "N", T0),  # tie at 500 cents
            (3, 10, 102, 1, 1.00, 0.0, "N", T0),  # cheaper but nation 2 (region 1)
            (4, 10, 100, 1, 9.00, 0.0, "N", T0),  # higher row, min still 500
        ]
    )
    part = _part([(10, "red widget", "Brand#1", "STANDARD", 25)])
    supp = _supp(
        [(100, "S100", 0, 10.0), (101, "S101", 1, 20.0), (102, "S102", 2, 99.0)]
    )
    out = min_cost_supplier(
        li, part, supp, _NATION, p_size=25, excl_type="PROMO",
        region_nations={0, 1},
    ).to_pandas()
    assert sorted(out["s_name"]) == ["S100", "S101"]
    # acctbal DESC: S101 (2000 cents) first
    assert list(out["s_name"]) == ["S101", "S100"]


def test_q9_profit_by_nation_year(ray_session):
    y1997, y1998 = T0, T0 + 365 * US_DAY
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array([y1997, y1998], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )
    )
    li = _li(
        [
            (1, 10, 100, 1, 2.00, 0.10, "N", T0),   # 200c * 90 = 18000 units
            (2, 10, 100, 1, 3.00, 0.00, "N", T0),   # 300c * 100 = 30000, year 1998
            (1, 11, 100, 1, 99.0, 0.00, "N", T0),   # wrong type: excluded
        ]
    )
    part = _part(
        [(10, "x", "Brand#1", "PROMO", 1), (11, "y", "Brand#1", "LARGE", 1)]
    )
    supp = _supp([(100, "S100", 1, 0.0)])
    out = (
        product_type_profit(li, orders, part, supp, _NATION, p_type="PROMO")
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    assert list(out["n_name"]) == ["N1", "N1"]
    assert list(out["o_year"]) == [1997, 1998]
    assert list(out["profit_units"]) == [18000, 30000]


def test_q11_threshold_is_strict_cross_mul(ray_session):
    # nation-1 suppliers only; three parts with values 100, 899, 1 units
    # (mult=10): total=1000 → keep value*10 > 1000 strictly
    li = _li(
        [
            (1, 10, 100, 1, 1.00, 0.0, "N", T0),   # 100c*100 = 10000
            (2, 11, 100, 1, 8.99, 0.0, "N", T0),   # 89900
            (3, 12, 100, 1, 0.01, 0.0, "N", T0),   # 100
            (4, 13, 999, 1, 50.0, 0.0, "N", T0),   # other-nation supplier: excluded
        ]
    )
    supp = _supp([(100, "S100", 1, 0.0), (999, "S999", 2, 0.0)])
    out = important_part_values(li, supp, nationkey=1, mult=10).to_pandas()
    total = 10000 + 89900 + 100
    keep = {pk for pk, v in [(10, 10000), (11, 89900), (12, 100)] if v * 10 > total}
    assert set(out["p_partkey"]) == keep == {11}


def test_q12_pivot_counts(ray_session):
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "5-LOW", "2-HIGH"], pa.string()
                ),
            }
        )
    )
    li = _li(
        [
            (1, 0, 0, 1, 1.0, 0.0, "A", T0),
            (2, 0, 0, 1, 1.0, 0.0, "A", T0),
            (3, 0, 0, 1, 1.0, 0.0, "B", T0),
            (1, 0, 0, 1, 1.0, 0.0, "B", T0 - 400 * US_DAY),  # outside window
        ]
    )
    out = (
        priority_line_counts(li, orders, T0 - US_DAY, T0 + US_DAY)
        .to_pandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert out.loc["A", "high_line_count"] == 1  # order 1 urgent
    assert out.loc["A", "low_line_count"] == 1   # order 2 low
    assert out.loc["B", "high_line_count"] == 1  # order 3 high
    assert out.loc["B", "low_line_count"] == 0


def test_q16_distinct_and_screen(ray_session):
    # supplier 999 is screened (negative balance); duplicate pair rows
    # must count once
    li = _li(
        [
            (1, 10, 100, 1, 1.0, 0.0, "N", T0),
            (2, 10, 100, 1, 1.0, 0.0, "N", T0),  # dup pair
            (3, 10, 101, 1, 1.0, 0.0, "N", T0),
            (4, 10, 999, 1, 1.0, 0.0, "N", T0),  # screened supplier
            (5, 11, 100, 1, 1.0, 0.0, "N", T0),  # excluded brand
        ]
    )
    part = _part(
        [
            (10, "x", "Brand#1", "LARGE", 5),
            (11, "y", "Brand#13", "LARGE", 5),
        ]
    )
    supp = _supp(
        [(100, "S100", 0, 1.0), (101, "S101", 0, 2.0), (999, "S999", 0, -5.0)]
    )
    out = supplier_part_counts(
        li, part, supp, excl_brand="Brand#13", excl_type="PROMO", sizes=(5,)
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["supplier_cnt"] == 2  # 100 and 101; 999 screened


def test_q20_threshold_strictly_greater(ray_session):
    li = _li(
        [
            (1, 10, 100, 10.0, 1.0, 0.0, "N", T0),  # qty_h = 1000 exactly
            (2, 10, 101, 10.01, 1.0, 0.0, "N", T0),  # qty_h = 1001
            (3, 11, 102, 99.0, 1.0, 0.0, "N", T0),   # part name not matching
        ]
    )
    part = _part(
        [(10, "red bolt", "Brand#1", "LARGE", 5), (11, "blue bolt", "Brand#1", "LARGE", 5)]
    )
    supp = _supp(
        [(100, "S100", 1, 0.0), (101, "S101", 1, 0.0), (102, "S102", 1, 0.0)]
    )
    out = excess_shippers(
        li, part, supp, name_prefix="red", nationkey=1,
        ts_from_us=T0 - US_DAY, ts_to_us=T0 + US_DAY,
        qty_threshold_hundredths=1000,
    ).to_pandas()
    assert list(out["s_name"]) == ["S101"]  # 1000 is NOT > 1000


def test_q2_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    rows = [
        (
            int(i),
            int(rng.integers(10, 14)),
            int(rng.integers(100, 105)),
            1,
            float(rng.integers(1, 999)) / 100.0,
            0.0,
            "N",
            T0,
        )
        for i in range(200)
    ]
    part = _part([(k, "n", "Brand#1", "LARGE", 25) for k in range(10, 14)])
    supp = _supp([(k, f"S{k}", k % 3, float(k)) for k in range(100, 105)])
    a = min_cost_supplier(
        _li(rows), part, supp, _NATION, 25, "PROMO", {0, 1}
    ).to_pandas()
    b = min_cost_supplier(
        _li(rows).repartition(7), part, supp, _NATION, 25, "PROMO", {0, 1}
    ).to_pandas()
    assert a.equals(b)
