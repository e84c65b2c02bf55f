"""Round-4s operators: wavelet-matrix RANGE-frame sliding quantiles."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.window import range_frame_quantiles_1h

US = 1_000_000
HOUR = 3_600 * US
DAY = 86_400 * US


def test_range_frame_quantiles_multi_run_vs_brute(ray_session):
    # several sources forced into ONE partition: the composite run
    # encoding must keep frames in-run, the wavelet matrix must answer
    # every row's k-th query exactly, equal-ts peers included
    rng = np.random.default_rng(47)
    base = 1_700_000_000 * US
    parts = []
    for s in range(4):
        n = 300
        ts = base + s * 30 * DAY + rng.integers(0, 4 * HOUR, n)
        ts[40:55] = ts[39]  # equal-ts peers
        # heavy value duplication so rank compression has real ties
        vals = rng.integers(-5, 6, n).astype(np.float64) * 0.25
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        np.arange(n, dtype=np.int64) + 10_000 * s
                    ),
                    "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64)),
                    "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
                    "event_type": pa.array([f"s{s}"] * n, pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    out = (
        range_frame_quantiles_1h(
            ray.data.from_arrow(tbl).repartition(5), num_partitions=1
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    assert len(out) == len(df)
    for _, g in df.groupby("event_type"):
        tsu = g["tsu"].to_numpy()
        c = g["c"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            m = (tsu >= tsu[i] - HOUR) & (tsu <= tsu[i])
            fr = np.sort(c[m])
            nf = len(fr)
            row = out.loc[ids[i]]
            assert row["n_in_frame"] == nf, ids[i]
            # DuckDB quantile_disc: 0-indexed element ceil(q*n)-1
            assert row["median_cents"] == fr[math.ceil(0.5 * nf) - 1], ids[i]
            assert row["p90_cents"] == fr[math.ceil(0.9 * nf) - 1], ids[i]


def test_range_frame_quantiles_single_distinct_value(ray_session):
    # degenerate rank domain (|V| = 1) exercises the nbits floor
    n = 64
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (base + np.arange(n, dtype=np.int64) * 60 * US),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["only"] * n, pa.string()),
            "value": pa.array(np.full(n, 7.5), pa.float64()),
        }
    )
    out = range_frame_quantiles_1h(
        ray.data.from_arrow(tbl), num_partitions=1
    ).to_pandas()
    assert (out["median_cents"] == 750).all()
    assert (out["p90_cents"] == 750).all()
    assert out["n_in_frame"].max() == 61  # trailing hour at 1/min + self


def test_top_revenue_suppliers_keeps_ties(ray_session):
    # two suppliers engineered to the same max revenue — both survive
    base = 820_454_400_000_000  # 1996-01-01
    li = pa.table(
        {
            "l_suppkey": pa.array([1, 2, 2, 3, 9], pa.int64()),
            "l_shipdate": pa.array(
                [base + 10**6] * 4 + [base - 10**6], pa.timestamp("us")
            ),
            "l_extendedprice": pa.array([200.0, 100.0, 100.0, 60.0, 1e6]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3, 9], pa.int64()),
            "s_name": pa.array(["a", "b", "c", "out-of-window"]),
        }
    )
    from workbook_exporter_fe_ray.stages.relational import (
        top_revenue_suppliers,
    )

    out = top_revenue_suppliers(
        ray.data.from_arrow(li).repartition(3), supp,
        base, base + 86_400_000_000,
    ).to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["total_units"]) == [2_000_000, 2_000_000]
    assert list(out["s_name"]) == ["a", "b"]


def test_single_late_supplier_cross_block_pair_dedup(ray_session):
    # the same (order, supplier) pair split across input blocks, one
    # late line and one on-time line: must count as ONE late supplier
    D = 86_400_000_000
    li = pa.table(
        {
            "l_orderkey": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 2, 5, 5], pa.int64()),
            "l_shipdate": pa.array(
                # order 7: supp1 late once + ontime once, supp2 ontime
                # order 8: single supplier (fails ns>1)
                [100 * D, 2 * D, 3 * D, 4 * D, 100 * D, 100 * D],
                pa.timestamp("us"),
            ),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([7, 8], pa.int64()),
            "o_orderdate": pa.array([1 * D, 1 * D], pa.timestamp("us")),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([1, 2, 5], pa.int64()),
            "s_name": pa.array(["s1", "s2", "s5"]),
        }
    )
    from workbook_exporter_fe_ray.stages.relational import (
        single_late_supplier_counts,
    )

    out = single_late_supplier_counts(
        ray.data.from_arrow(li).repartition(6),
        ray.data.from_arrow(orders),
        supp,
        num_partitions=4,
    ).to_pandas()
    assert list(out["s_suppkey"]) == [1]
    assert list(out["numwait"]) == [1]


def test_dormant_rich_exact_int_threshold(ray_session):
    # avg of positive balances = (300+100)/2 = 200.00; bal must be
    # STRICTLY above in exact cents, and the customer's last order
    # strictly older than cutoff (maxdate − 365 d)
    D = 86_400_000_000
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_nationkey": pa.array([0, 0, 1, 1], pa.int64()),
            "c_acctbal": pa.array([300.0, 100.0, 200.0, -50.0]),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 2, 3, 4, 2], pa.int64()),
            "o_orderdate": pa.array(
                [10 * D, 10 * D, 10 * D, 1000 * D, 999 * D],
                pa.timestamp("us"),
            ),
        }
    )
    from workbook_exporter_fe_ray.stages.relational import (
        dormant_rich_customers,
    )

    out = (
        dormant_rich_customers(
            ray.data.from_arrow(cust).repartition(2),
            ray.data.from_arrow(orders).repartition(2),
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    # cust1: 30000 cents, 30000*2 > 40000 ✓ rich, last order day10 <
    # day1000−365 ✓ dormant. cust3: 20000*2 = 40000 not > ✗. cust2 not
    # rich. cust4 negative.
    assert list(out["c_nationkey"]) == [0]
    assert list(out["n_dormant_rich"]) == [1]
    assert list(out["sum_bal_cents"]) == [30000]


def test_ts_value_inversions_vs_brute_and_extremes(ray_session):
    from workbook_exporter_fe_ray.stages.window import ts_value_inversions

    rng = np.random.default_rng(11)
    base = 1_700_000_000 * US
    n = 500
    parts = [
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "ts": pa.array(
                    (base + rng.integers(0, HOUR, n)).astype(np.int64),
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["rand"] * n, pa.string()),
                "value": pa.array(
                    rng.integers(-9, 10, n).astype(np.float64) * 0.5
                ),
            }
        ),
        # monotone up → 0 inversions, concordance 1.0
        pa.table(
            {
                "event_id": pa.array(np.arange(n, 2 * n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "ts": pa.array(
                    (base + np.arange(n, dtype=np.int64) * US),
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["up"] * n, pa.string()),
                "value": pa.array(np.arange(n, dtype=np.float64)),
            }
        ),
        # strictly reversed → C(n,2) inversions, concordance -1.0
        pa.table(
            {
                "event_id": pa.array(np.arange(2 * n, 3 * n, dtype=np.int64)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "ts": pa.array(
                    (base + np.arange(n, dtype=np.int64) * US),
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["down"] * n, pa.string()),
                "value": pa.array(-np.arange(n, dtype=np.float64)),
            }
        ),
    ]
    tbl = pa.concat_tables(parts)
    out = (
        ts_value_inversions(
            ray.data.from_arrow(tbl).repartition(7), num_partitions=1
        )
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert int(out.loc["up", "n_inversions"]) == 0
    assert out.loc["up", "concordance"] == 1.0
    assert int(out.loc["down", "n_inversions"]) == n * (n - 1) // 2
    assert out.loc["down", "concordance"] == -1.0
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    g = df[df["event_type"] == "rand"].sort_values(["tsu", "event_id"])
    c = g["c"].to_numpy()
    brute = sum(int((c[i] > c[i + 1:]).sum()) for i in range(len(c)))
    assert int(out.loc["rand", "n_inversions"]) == brute
    # partition invariance: multi-partition run == single-partition run
    out8 = (
        ts_value_inversions(
            ray.data.from_arrow(tbl).repartition(3), num_partitions=8
        )
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out8.equals(out)


def test_weighted_median_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.sketch import weighted_median_price

    rng = np.random.default_rng(23)
    n = 2000
    li = pa.table(
        {
            "l_returnflag": pa.array(
                [["A", "N", "R"][k] for k in rng.integers(0, 3, n)]
            ),
            "l_extendedprice": pa.array(
                rng.integers(100, 999, n).astype(np.float64) / 10.0
            ),
            "l_quantity": pa.array(
                rng.integers(1, 50, n).astype(np.float64)
            ),
        }
    )
    out = (
        weighted_median_price(ray.data.from_arrow(li).repartition(6))
        .to_pandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    df = li.to_pandas()
    df["cents"] = np.round(df["l_extendedprice"] * 100).astype(np.int64)
    df["w"] = df["l_quantity"].astype(np.int64)
    for flag, g in df.groupby("l_returnflag"):
        # brute: expand each row w times, take the lower median element
        exp = np.sort(np.repeat(g["cents"].to_numpy(), g["w"].to_numpy()))
        tot = len(exp)
        brute = exp[(tot - 1) // 2] if tot % 2 else exp[tot // 2 - 1 + 1]
        # lower weighted median: first v with 2*cumw >= tot
        cw = 0
        for v, w in sorted(zip(g["cents"], g["w"])):
            cw += w
            if 2 * cw >= tot:
                brute = v
                break
        row = out.loc[flag]
        assert int(row["total_qty"]) == tot
        assert int(row["wmedian_cents"]) == brute, flag


def test_prefix_filter_jaccard_full_recall_vs_brute(ray_session):
    """The prefix-filter engine is EXACT: output must equal the full
    quadratic truth — including pairs hovering just at threshold."""
    from workbook_exporter_fe_ray.stages.dedup import (
        ngram_jaccard,
        prefix_filter_jaccard_pairs,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{k}" for k in range(60)]
    texts, ids = [], []
    base_docs = [
        " ".join(rng.choice(vocab, 12).tolist()) for _ in range(40)
    ]
    did = 0
    for d in base_docs:
        texts.append(d)
        ids.append(did)
        did += 1
        if rng.random() < 0.5:  # planted near-dup: mutate 1-3 words
            w = d.split()
            for _ in range(rng.integers(1, 4)):
                w[rng.integers(0, len(w))] = str(rng.choice(vocab))
            texts.append(" ".join(w))
            ids.append(did)
            did += 1
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    t = 0.3
    out = (
        prefix_filter_jaccard_pairs(
            ray.data.from_arrow(tbl).repartition(5),
            threshold=t,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    brute = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = ngram_jaccard(texts[i], texts[j], 3)
            if jac >= t:
                brute.append((ids[i], ids[j], jac))
    assert len(out) == len(brute)
    for (ia, ib, jac), (_, row) in zip(sorted(brute), out.iterrows()):
        assert (row["id_a"], row["id_b"]) == (ia, ib)
        assert abs(row["jaccard"] - jac) < 1e-12


def test_nation_trade_flow_cross_pairs_only(ray_session):
    from workbook_exporter_fe_ray.stages.relational import nation_trade_flow

    D = 86_400_000_000
    y1996 = 820_454_400_000_000
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_suppkey": pa.array([10, 11, 10, 12], pa.int64()),
            "l_shipdate": pa.array(
                [y1996, y1996 + 400 * D, y1996, y1996], pa.timestamp("us")
            ),
            "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0]),
            "l_discount": pa.array([0.0, 0.1, 0.0, 0.0]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([20, 21, 22, 20], pa.int64()),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([20, 21, 22], pa.int64()),
            # 20 → nation B, 21 → nation A, 22 → nation A
            "c_nationkey": pa.array([1, 0, 0], pa.int64()),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([10, 11, 12], pa.int64()),
            # 10 → A, 11 → A, 12 → C (outside the pair)
            "s_nationkey": pa.array([0, 0, 2], pa.int64()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["NA", "NB", "NC"]),
        }
    )
    out = (
        nation_trade_flow(
            ray.data.from_arrow(li).repartition(2),
            ray.data.from_arrow(orders),
            ray.data.from_arrow(cust),
            supp,
            nation,
            "NA",
            "NB",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["supp_nation", "l_year"])
        .reset_index(drop=True)
    )
    # order1: A→B 1996 ✓ (10000 units); order2: A→A dropped (same
    # nation); order3: A→A dropped; order4: supplier NC outside pair
    # dropped. order2 would be 1997 had it survived.
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["supp_nation"], r["cust_nation"], r["l_year"]) == (
        "NA", "NB", 1996,
    )
    assert r["revenue_units"] == 10000 * 100


def test_two_sample_drift_vs_scipy_convention(ray_session):
    """Exact KS and MWU against a brute-force per-pair count."""
    from workbook_exporter_fe_ray.stages.sketch import two_sample_drift

    rng = np.random.default_rng(5)
    na, nb = 300, 260
    va = rng.integers(-10, 11, na).astype(np.float64) * 0.5
    vb = (rng.integers(-10, 11, nb) + 3).astype(np.float64) * 0.5  # shifted
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(na + nb, dtype=np.int64)),
            "user_id": pa.array(np.zeros(na + nb, np.int64)),
            "ts": pa.array(
                np.full(na + nb, 1_700_000_000 * US, np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["A"] * na + ["B"] * nb),
            "value": pa.array(np.r_[va, vb]),
        }
    )
    out = two_sample_drift(
        ray.data.from_arrow(tbl).repartition(5), "A", "B"
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    ca = np.round(va * 100).astype(np.int64)
    cb = np.round(vb * 100).astype(np.int64)
    # brute MWU: 2*[a>b] + [a==b] over all cross pairs
    gt = (ca[:, None] > cb[None, :]).sum()
    eq = (ca[:, None] == cb[None, :]).sum()
    assert int(r["u2_a"]) == 2 * int(gt) + int(eq)
    # brute KS over merged distinct values
    vals = np.unique(np.r_[ca, cb])
    ecdf_a = np.searchsorted(np.sort(ca), vals, side="right")
    ecdf_b = np.searchsorted(np.sort(cb), vals, side="right")
    d_num = np.abs(ecdf_a * nb - ecdf_b * na).max()
    assert int(r["d_num_max"]) == int(d_num)
    assert r["ks_stat"] == d_num / (na * nb)
    assert (int(r["n_a"]), int(r["n_b"])) == (na, nb)


def test_nation_market_share_engineered_half(ray_session):
    from workbook_exporter_fe_ray.stages.relational import (
        nation_market_share,
    )

    y1996 = 820_454_400_000_000
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_partkey": pa.array([100, 100, 101], pa.int64()),
            # supp 10 is target-nation, supp 11 not
            "l_suppkey": pa.array([10, 11, 10], pa.int64()),
            "l_extendedprice": pa.array([50.0, 50.0, 70.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([20, 21], pa.int64()),
            "o_orderdate": pa.array([y1996, y1996], pa.timestamp("us")),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([20, 21], pa.int64()),
            # cust 20 in-region, cust 21 out-of-region → order 2 drops
            "c_nationkey": pa.array([0, 2], pa.int64()),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_nationkey": pa.array([1, 2], pa.int64()),  # 10 → target
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["N0", "NT", "N2"]),
            "n_regionkey": pa.array([0, 1, 1], pa.int64()),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["R0", "R1"]),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([100, 101], pa.int64()),
            "p_type": pa.array(["STD", "STD"]),
        }
    )
    out = nation_market_share(
        ray.data.from_arrow(li).repartition(2),
        ray.data.from_arrow(orders),
        ray.data.from_arrow(cust),
        supp, nation, region, part,
        "NT", "R0", "STD",
        num_partitions=4,
    ).to_pandas()
    # only order 1 (region R0) survives: 5000+5000 units, target half
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["o_year"]) == 1996
    assert int(r["total_units"]) == 1_000_000
    assert int(r["target_units"]) == 500_000
    assert r["mkt_share"] == 0.5


def test_pq_topk_recall_and_determinism(ray_session):
    from workbook_exporter_fe_ray.stages.similarity import (
        pq_topk,
        topk_cosine,
    )

    rng = np.random.default_rng(7)
    # clustered corpus: PQ codebooks must capture cluster structure
    n_clusters, per, dim = 12, 50, 64
    cents = rng.normal(0, 1, (n_clusters, dim))
    vecs = np.repeat(cents, per, axis=0) + rng.normal(
        0, 0.15, (n_clusters * per, dim)
    )
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    query = vecs[0]
    ds = ray.data.from_arrow(tbl).repartition(5)
    exact50 = set(
        topk_cosine(ds, query, k=50).to_pandas()["vec_id"].tolist()
    )
    got1 = pq_topk(ds, query, k=10).to_pandas().sort_values("rank")
    got2 = (
        pq_topk(ray.data.from_arrow(tbl).repartition(3), query, k=10)
        .to_pandas()
        .sort_values("rank")
    )
    # deterministic + partition-invariant (ADC ties broken by id in
    # BOTH the local prune and the global merge)
    assert got1["vec_id"].tolist() == got2["vec_id"].tolist()
    assert np.allclose(got1["adc_dist"].to_numpy(),
                       got2["adc_dist"].to_numpy())
    # within a tight cluster all members quantize to near-identical
    # codes (ADC ties), so the honest guarantee at this granularity is
    # CLUSTER recovery: every hit must be a true coarse neighbour
    got_ids = set(got1["vec_id"].tolist())
    cluster0 = set(range(50))
    assert got_ids <= cluster0, got_ids - cluster0
    assert len(got_ids & exact50) >= 8  # coarse recall vs exact top-50
    assert got1["rank"].tolist() == list(range(10))


def test_orc_round_trip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.sources.formats import (
        read_auto,
        synth_sensor_orc,
    )

    p = str(tmp_path / "sensors.orc")
    synth_sensor_orc(p, n=3000)
    ds = read_auto(p)
    assert ds.num_blocks() > 1  # one block per stripe, actually parallel
    got = ds.to_pandas().sort_values("sensor_id").reset_index(drop=True)
    exp = (
        pq.read_table(str(tmp_path / "sensors.parquet"))
        .to_pandas()
        .sort_values("sensor_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_range_sink_prune_resume_order(ray_session, tmp_path):
    import json
    import os

    import pyarrow.parquet as pq_

    from workbook_exporter_fe_ray.sinks.range_parquet import (
        read_range_partitioned,
        write_range_partitioned,
    )

    rng = np.random.default_rng(13)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        }
    )
    out = str(tmp_path / "sink")
    m1 = write_range_partitioned(
        ray.data.from_arrow(tbl).repartition(7), out, "k", n_partitions=8
    )
    parts = m1["partitions"]
    assert sum(p["n_rows"] for p in parts) == n
    assert not any(p["skipped"] for p in parts)
    # ranges are disjoint and ordered; each file is sorted by key
    for a, b in zip(parts, parts[1:]):
        assert a["key_max"] < b["key_min"]
    f0 = pq_.read_table(
        os.path.join(out, f"part={parts[0]['part']:05d}", "data.parquet")
    )
    k0 = f0["k"].to_numpy()
    assert (np.diff(k0) > 0).all()
    # manifest pruning: a window inside one partition opens few files
    lo, hi = parts[2]["key_min"], parts[2]["key_min"] + 10
    got = read_range_partitioned(out, key_lo=lo, key_hi=hi).to_pandas()
    exp = np.arange(lo, hi)
    assert sorted(got["k"].tolist()) == exp.tolist()
    # resume: kill one partition, rerun — only that one rewrites
    victim = os.path.join(out, f"part={parts[3]['part']:05d}", ".done")
    os.remove(victim)
    m2 = write_range_partitioned(
        ray.data.from_arrow(tbl).repartition(7), out, "k", n_partitions=8
    )
    skipped = {p["part"]: p["skipped"] for p in m2["partitions"]}
    assert not skipped[parts[3]["part"]]
    assert all(v for k2, v in skipped.items() if k2 != parts[3]["part"])
    # full readback reconstructs the global order
    full = read_range_partitioned(out).to_pandas()
    assert sorted(full["k"].tolist()) == list(range(n))


def test_bpe_train_vs_corpus_level_reference(ray_session):
    """Engine (word-frequency-dict BPE) must equal a slow CORPUS-level
    reference that recounts pairs over every word occurrence."""
    from workbook_exporter_fe_ray.stages.text import bpe_train_merges

    docs = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide lower",
        "low new wide lowest",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs),
        }
    )
    K = 12
    got = bpe_train_merges(
        ray.data.from_arrow(tbl).repartition(3), num_merges=K
    ).to_pandas()

    # slow reference: every word OCCURRENCE is its own symbol sequence
    corpus = [list(w) for d in docs for w in d.split()]
    merges = []
    for _ in range(K):
        counts = {}
        for seq in corpus:
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (la, rb), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((la, rb, cnt))
        m = la + rb
        for si, seq in enumerate(corpus):
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == la and seq[j + 1] == rb:
                    out.append(m); j += 2
                else:
                    out.append(seq[j]); j += 1
            corpus[si] = out
    assert len(got) == len(merges)
    for i, (la, rb, cnt) in enumerate(merges):
        row = got.iloc[i]
        assert (row["left"], row["right"], int(row["pair_count"])) == (
            la, rb, cnt,
        ), i


def test_range_frame_windowed_plan_bit_identity(ray_session):
    """span_frames=2 (forced halo traffic, frames crossing window
    boundaries) must be bit-identical to a span so large the whole
    history is one window — for all three RANGE-frame kernels."""
    from workbook_exporter_fe_ray.stages.window import (
        range_frame_extrema_1h,
        range_frame_sum_1h,
    )

    rng = np.random.default_rng(53)
    n = 2500
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            # 2 sources over ~10 days: span=2 → ~120 windows, frames
            # constantly cross boundaries
            "ts": pa.array(
                (base + rng.integers(0, 10 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"s{k}" for k in rng.integers(0, 2, n)], pa.string()
            ),
            "value": pa.array(
                rng.integers(-9, 10, n).astype(np.float64) * 0.5
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    for fn in (range_frame_sum_1h, range_frame_extrema_1h,
               range_frame_quantiles_1h):
        small = (
            fn(ds, num_partitions=16, span_frames=2)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        huge = (
            fn(ds, num_partitions=1, span_frames=100_000)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert small.equals(huge), fn.__name__


def test_ts_value_inversions_windowed_bit_identity(ray_session):
    """Forced multi-window split (span = 10 min over an hour of data)
    must equal both the single-window plan and brute force — the
    cross-window histogram walk is exact."""
    from workbook_exporter_fe_ray.stages.window import ts_value_inversions

    rng = np.random.default_rng(61)
    n = 1200
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, HOUR, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"s{k}" for k in rng.integers(0, 3, n)], pa.string()
            ),
            "value": pa.array(
                rng.integers(-7, 8, n).astype(np.float64) * 0.5
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    many = (
        ts_value_inversions(ds, num_partitions=8, span_us=600 * US)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    one = (
        ts_value_inversions(ds, num_partitions=1, span_us=10**15)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert many.equals(one)
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    for s, gdf in df.groupby("event_type"):
        gdf = gdf.sort_values(["tsu", "event_id"])
        c = gdf["c"].to_numpy()
        brute = sum(int((c[i] > c[i + 1:]).sum()) for i in range(len(c)))
        assert int(many.loc[s, "n_inversions"]) == brute, s


def test_all_orders_above_nation_avg_engineered(ray_session):
    from workbook_exporter_fe_ray.stages.relational import (
        all_orders_above_nation_avg,
    )

    # nation 0: orders 10,20 (cust1) & 40,50 (cust2); avg=30.
    # cust2 min=40>30 ✓ all-above; cust1 min=10 ✗.
    # nation 1: single-order cust3 excluded (n=1).
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 40.0, 50.0, 99.0]),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_nationkey": pa.array([0, 0, 1], pa.int64()),
        }
    )
    out = (
        all_orders_above_nation_avg(
            ray.data.from_arrow(orders).repartition(3),
            ray.data.from_arrow(cust),
            num_partitions=4,
        )
        .to_pandas()
        .set_index("c_nationkey")
        .sort_index()
    )
    assert list(out.index) == [0]
    assert int(out.loc[0, "n_customers"]) == 2
    assert int(out.loc[0, "n_all_above"]) == 1


def test_revenue_share_hierarchy_engineered(ray_session):
    from workbook_exporter_fe_ray.stages.relational import (
        revenue_share_hierarchy,
    )

    orders = pa.table(
        {
            "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_totalprice": pa.array([10.0, 30.0, 20.0, 40.0]),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_nationkey": pa.array([0, 1, 2, 2], pa.int64()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            # nations 0,1 in region 0; nation 2 in region 1
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        }
    )
    out = (
        revenue_share_hierarchy(
            ray.data.from_arrow(orders).repartition(2),
            ray.data.from_arrow(cust),
            nation,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("c_nationkey")
        .sort_index()
    )
    assert out.loc[0, "share_of_region"] == 0.25   # 10 / 40
    assert out.loc[1, "share_of_region"] == 0.75   # 30 / 40
    assert out.loc[2, "share_of_region"] == 1.0    # 60 / 60
    assert out.loc[2, "share_of_total"] == 0.6     # 60 / 100
    assert int(out.loc[2, "nation_cents"]) == 6000


def test_kmeans_lloyd_iters_vs_numpy_reference(ray_session):
    """Five distributed Lloyd rounds must equal a numpy reference
    running the identical quantized-int algorithm, on any partitioning."""
    from workbook_exporter_fe_ray.stages.similarity import kmeans_lloyd_iters

    rng = np.random.default_rng(17)
    n, d, k, iters = 400, 16, 4, 5
    vecs = rng.normal(0, 1, (n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = kmeans_lloyd_iters(
        ray.data.from_arrow(tbl).repartition(6), k=k, iters=iters
    ).to_pandas()
    got2 = kmeans_lloyd_iters(
        ray.data.from_arrow(tbl).repartition(2), k=k, iters=iters
    ).to_pandas()
    assert got.equals(got2)  # partition-invariant

    # numpy reference: same quantization, same tie rule, same floor
    scale = 1_000_000.0
    Q = np.floor(vecs.astype(np.float32).astype(np.float64) * scale).astype(
        np.int64
    )
    C = Q[:k].copy()
    for it in range(iters):
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2 * (Q @ C.T)
            + (C * C).sum(1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        if it == iters - 1:
            inert = d2[np.arange(n), assign]
            break
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = np.floor(
                    Q[m].sum(0).astype(np.float64) / m.sum()
                ).astype(np.int64)
    exp_n = np.bincount(assign, minlength=k)
    for c in range(k):
        row = got[got["centroid_id"] == c]
        if exp_n[c] == 0:
            assert len(row) == 0
            continue
        assert int(row["n_assigned"].iloc[0]) == exp_n[c], c
        assert int(row["inertia_units"].iloc[0]) == int(
            inert[assign == c].sum()
        ), c


def test_r4s_review_edge_guards(ray_session, tmp_path):
    """Regression pins for the r4s review findings: empty/missing dim
    inputs must degrade to the SQL-equivalent empty results, never
    IndexError; sink resume must rewrite under drifted boundaries."""
    import os

    from workbook_exporter_fe_ray.sinks.range_parquet import (
        write_range_partitioned,
    )
    from workbook_exporter_fe_ray.stages.relational import (
        disjunctive_predicate_revenue,
        small_qty_brand_revenue,
        top_revenue_suppliers,
    )

    li = pa.table(
        {
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 2], pa.int64()),
            "l_quantity": pa.array([1.0, 2.0]),
            "l_extendedprice": pa.array([10.0, 20.0]),
            "l_discount": pa.array([0.0, 0.0]),
            "l_shipdate": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_brand": pa.array(["B1", "B1"]),
            "p_size": pa.array([1, 1], pa.int64()),
        }
    )
    # brand with zero parts → 0-row audit, not IndexError
    out = small_qty_brand_revenue(
        lambda: ray.data.from_arrow(li), part, "NOPE"
    ).to_pandas()
    assert int(out["n_small_lines"][0]) == 0
    assert int(out["small_qty_units"][0]) == 0
    # empty part dim → 0-line disjunction, not IndexError
    out = disjunctive_predicate_revenue(
        ray.data.from_arrow(li),
        part.slice(0, 0),
        (("B1", 1, 5, 1, 11),),
    ).to_pandas()
    assert int(out["n_lines"][0]) == 0
    # winning suppkey absent from supplier dim → inner-join drop,
    # never a silent wrong-name attach
    out = top_revenue_suppliers(
        ray.data.from_arrow(li),
        pa.table(
            {
                "s_suppkey": pa.array([1], pa.int64()),
                "s_name": pa.array(["only"]),
            }
        ),
        -10**15,
        10**15,
    ).to_pandas()
    # supplier 2 has max revenue (2000 units) but is unknown → dropped
    assert list(out["s_suppkey"]) == []
    # sink: drifted boundaries with coincidentally matching row count
    # must REWRITE (the .done signature includes the key range)
    tbl = pa.table({"k": pa.array(np.arange(100, dtype=np.int64))})
    out_dir = str(tmp_path / "sink2")
    write_range_partitioned(
        ray.data.from_arrow(tbl), out_dir, "k", n_partitions=2
    )
    # forge a stale .done with same count but different range
    pdir = [d for d in os.listdir(out_dir) if d.startswith("part=")][0]
    done = os.path.join(out_dir, pdir, ".done")
    n = open(done).read().split(",")[0]
    with open(done, "w") as f:
        f.write(f"{n},999999,9999999")
    m = write_range_partitioned(
        ray.data.from_arrow(tbl), out_dir, "k", n_partitions=2
    )
    forged = int(pdir.split("=")[1])
    sk = {p["part"]: p["skipped"] for p in m["partitions"]}
    assert not sk[forged]          # forged range → rewritten
    assert all(v for k2, v in sk.items() if k2 != forged)


def test_user_set_algebra_all_masks(ray_session):
    from workbook_exporter_fe_ray.stages.window import user_set_algebra

    # engineer one user per non-empty mask + one user outside all sets
    rows_u, rows_t = [], []
    combos = [
        (1, ["A"]), (2, ["B"]), (3, ["A", "B"]), (4, ["C"]),
        (5, ["A", "C"]), (6, ["B", "C"]), (7, ["A", "B", "C"]),
    ]
    for uid, ts_ in combos:
        for t in ts_ + ts_:  # duplicates must not double-count
            rows_u.append(uid)
            rows_t.append(t)
    rows_u.append(99)
    rows_t.append("other")  # outside the three sets → excluded
    n = len(rows_u)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rows_u, pa.int64()),
            "ts": pa.array(
                np.full(n, 1_700_000_000 * US, np.int64), pa.timestamp("us")
            ),
            "event_type": pa.array(rows_t, pa.string()),
            "value": pa.array(np.zeros(n)),
        }
    )
    out = user_set_algebra(
        ray.data.from_arrow(tbl).repartition(4), "A", "B", "C",
        num_partitions=8,
    ).to_pandas()
    assert len(out) == 7
    got = {
        (bool(r["in_a"]), bool(r["in_b"]), bool(r["in_c"])): int(r["n_users"])
        for _, r in out.iterrows()
    }
    for uid, ts_ in combos:
        key = ("A" in ts_, "B" in ts_, "C" in ts_)
        assert got[key] == 1, key


def test_auto_equi_join_plans_identical(ray_session):
    """Both measured plans (broadcast / shuffle) must produce the same
    inner-join rows; the threshold is the only difference."""
    from workbook_exporter_fe_ray.stages.relational import auto_equi_join

    rng = np.random.default_rng(29)
    n = 3000
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n).astype(np.int64)),
            "lv": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(0, 400, dtype=np.int64)),  # 100 miss
            "rv": pa.array(np.arange(0, 400, dtype=np.int64) * 7),
        }
    )
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(3)
    a = (
        auto_equi_join(lds, rds, "k", ("lv",), ("rv",),
                       broadcast_bytes=1 << 30)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    b = (
        auto_equi_join(lds, rds, "k", ("lv",), ("rv",), broadcast_bytes=0)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert a[sorted(a.columns)].equals(b[sorted(b.columns)])
    # brute inner join
    import pandas as pd

    exp = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(a) == len(exp)
    assert (a["rv"].to_numpy() == a["k"].to_numpy() * 7).all()


def test_revenue_pareto_deciles_tie_straddle_vs_brute(ray_session):
    """Engineered ties STRADDLING a tile boundary: the histogram
    allocation must equal SQL NTILE aggregates exactly (tied customers
    are revenue-identical, so the split is aggregate-invariant)."""
    from workbook_exporter_fe_ray.stages.sketch import revenue_pareto_deciles

    # 23 customers: 7 tied at 50.00 so ties cross the 3-tile boundaries
    totals = [100.0] * 4 + [50.0] * 7 + [20.0] * 12
    orders = pa.table(
        {
            "o_custkey": pa.array(
                np.arange(len(totals), dtype=np.int64)
            ),
            "o_totalprice": pa.array(totals),
        }
    )
    out = (
        revenue_pareto_deciles(
            ray.data.from_arrow(orders).repartition(4), n_tiles=3
        )
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    # brute NTILE(3) over 23 rows: sizes 8, 8, 7 over sorted desc
    vals = sorted([int(t * 100) for t in totals], reverse=True)
    sizes = [8, 8, 7]
    pos = 0
    exp = []
    for s_ in sizes:
        chunk = vals[pos:pos + s_]
        exp.append((s_, sum(chunk)))
        pos += s_
    grand = sum(v for _, v in exp)
    cum = 0
    for i, (s_, rev) in enumerate(exp):
        row = out.iloc[i]
        cum += rev
        assert int(row["tile"]) == i + 1
        assert int(row["n_customers"]) == s_
        assert int(row["revenue_cents"]) == rev
        assert int(row["cum_revenue_cents"]) == cum
        assert row["cum_share"] == cum / grand


def test_chi2_cells_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import chi2_cells_type_hour

    rng = np.random.default_rng(37)
    n = 2000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 3 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"t{k}" for k in rng.integers(0, 3, n)], pa.string()
            ),
            "value": pa.array(np.zeros(n)),
        }
    )
    out = (
        chi2_cells_type_hour(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["event_type", "hour"])
        .sort_index()
    )
    df = tbl.to_pandas()
    df["hour"] = (tbl["ts"].cast(pa.int64()).to_numpy() // (3600 * US)) % 24
    obs = df.groupby(["event_type", "hour"]).size()
    rt = df.groupby("event_type").size()
    ct = df.groupby("hour").size()
    assert len(out) == len(obs)
    tot_chi2 = 0.0
    for (e, h), o in obs.items():
        row = out.loc[(e, h)]
        assert int(row["obs"]) == o
        assert int(row["row_total"]) == rt[e]
        assert int(row["col_total"]) == ct[h]
        exp = rt[e] * ct[h] / n
        # classic form equals the cross-multiplied form
        assert abs(row["chi2_term"] - (o - exp) ** 2 / exp) < 1e-9
        tot_chi2 += row["chi2_term"]
    # independence holds by construction → statistic stays moderate
    dof = (len(rt) - 1) * (len(ct) - 1)
    assert tot_chi2 < 3 * dof


def test_survival_hazard_censoring_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import survival_hazard_daily

    D = 86_400_000_000
    base = 1_700_000_000 * US
    # user 1: lifetime 2d, churned well before edge
    # user 2: lifetime 2d, last event at corpus edge → CENSORED
    # user 3: lifetime 0d, churned early
    # user 4: lifetime 5d, defines the corpus max
    rows = [
        (1, base), (1, base + 2 * D),
        (2, base + 3 * D), (2, base + 5 * D),
        (3, base + 1 * D),
        (4, base), (4, base + 5 * D),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array(np.zeros(len(rows))),
        }
    )
    out = (
        survival_hazard_daily(
            ray.data.from_arrow(tbl).repartition(3), censor_days=3
        )
        .to_pandas()
        .set_index("day_t")
        .sort_index()
    )
    # lifetimes: u1=2 (churn), u2=2 (censored: last=base+5d ≥ max−3d),
    # u3=0 (churn), u4=5 (censored)
    assert list(out.index) == [0, 2, 5]
    assert int(out.loc[0, "n_at_risk"]) == 4
    assert int(out.loc[0, "n_churned"]) == 1
    assert out.loc[0, "hazard"] == 0.25
    assert int(out.loc[2, "n_at_risk"]) == 3
    assert int(out.loc[2, "n_churned"]) == 1  # u2 censored, not churned
    assert int(out.loc[5, "n_at_risk"]) == 1
    assert int(out.loc[5, "n_churned"]) == 0


def test_mann_kendall_vs_brute_sign_sum(ray_session):
    from workbook_exporter_fe_ray.stages.window import mann_kendall_trend

    rng = np.random.default_rng(43)
    n = 600
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 30 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"s{k}" for k in rng.integers(0, 3, n)], pa.string()
            ),
            # heavy ties so the tie correction actually matters
            "value": pa.array(
                rng.integers(-4, 5, n).astype(np.float64) * 0.5
            ),
        }
    )
    out = (
        mann_kendall_trend(
            ray.data.from_arrow(tbl).repartition(4),
            num_partitions=8,
            span_us=5 * DAY,  # force multi-window cross terms
        )
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    for s, g in df.groupby("event_type"):
        g = g.sort_values(["tsu", "event_id"])
        c = g["c"].to_numpy()
        s_brute = sum(
            int(np.sign(c[j] - c[i]))
            for i in range(len(c))
            for j in range(i + 1, len(c))
        )
        assert int(out.loc[s, "s_stat"]) == s_brute, s


def test_range_sink_resume_detects_nonkey_content_change(ray_session, tmp_path):
    """r4 ADVICE: a rerun whose input changed only NON-KEY columns
    (same per-partition count and key range) must rewrite — the .done
    signature includes a content hash, so the stale file can't be
    silently kept; an identical rerun still skips every partition."""
    import os

    import pyarrow.parquet as pq_

    from workbook_exporter_fe_ray.sinks.range_parquet import (
        write_range_partitioned,
    )

    n = 2000
    k = np.arange(n, dtype=np.int64)
    v1 = (k * 3) % 17
    tbl1 = pa.table({"k": pa.array(k), "v": pa.array(v1)})
    out = str(tmp_path / "sink")
    write_range_partitioned(
        ray.data.from_arrow(tbl1).repartition(5), out, "k", n_partitions=4
    )
    # identical rerun: all partitions skip
    m_same = write_range_partitioned(
        ray.data.from_arrow(tbl1).repartition(5), out, "k", n_partitions=4
    )
    assert all(p["skipped"] for p in m_same["partitions"])
    # same keys, changed values: every partition must rewrite
    tbl2 = pa.table({"k": pa.array(k), "v": pa.array(v1 + 1)})
    m_chg = write_range_partitioned(
        ray.data.from_arrow(tbl2).repartition(5), out, "k", n_partitions=4
    )
    assert not any(p["skipped"] for p in m_chg["partitions"])
    p0 = m_chg["partitions"][0]
    f0 = pq_.read_table(
        os.path.join(out, f"part={p0['part']:05d}", "data.parquet")
    )
    kk = f0["k"].to_numpy()
    assert (f0["v"].to_numpy() == (kk * 3) % 17 + 1).all()
