"""Sketch-operator tests: HLL error bound vs exact, the quantile index
convention vs DuckDB on adversarial group sizes, Misra-Gries'
no-false-negative guarantee, and heavy-hitter partition invariance.

The SQL-value parity of grouped_quantiles / heavy_hitters /
range_join_windows runs in test_operators.py's oracle parametrize; here
are the properties SQL can't express.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from workbook_exporter_fe_ray.stages.sketch import (
    _mg_summarize,
    grouped_quantiles,
    heavy_hitters,
    hll_distinct,
)

SF = "/root/testdata/sf0.001"


def test_hll_relative_error(ray_session):
    """p=12 HLL (4096 registers) on small true cardinalities sits in the
    linear-counting regime — expect ≤2% error vs the exact distinct."""
    from workbook_exporter_fe_ray.sources import read_table

    got = (
        hll_distinct(read_table(f"{SF}/events.parquet"))
        .to_pandas()
        .set_index("event_type")["approx_distinct"]
    )
    exact = (
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) c "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
        )
        .df()
        .set_index("event_type")["c"]
    )
    assert set(got.index) == set(exact.index)
    for k in exact.index:
        assert abs(got[k] - exact[k]) <= max(0.02 * exact[k], 1), (k, got[k], exact[k])


def test_quantile_convention_matches_duckdb(ray_session):
    """Adversarial group sizes (1..40, heavy duplicates) — the integer
    ceil(p*n/100)-1 index must agree with quantile_disc everywhere,
    including exact rational boundaries (n=20 & p=90 etc.)."""
    rng = np.random.default_rng(7)
    keys, vals = [], []
    for gi, n in enumerate([1, 2, 3, 4, 5, 10, 19, 20, 21, 25, 40]):
        keys += [f"g{gi:02d}"] * n
        vals += rng.integers(0, 6, size=n).tolist()
    tbl = pa.table(
        {"source": pa.array(keys), "n_chars": pa.array(vals, pa.int64())}
    )
    got = (
        grouped_quantiles(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.sql(
        "SELECT source, quantile_disc(n_chars, 0.50) p50,"
        " quantile_disc(n_chars, 0.90) p90, count(*) n_rows"
        " FROM t GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["p50"].tolist() == want["p50"].tolist()
    assert got["p90"].tolist() == want["p90"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()


def test_mg_no_false_negatives():
    """Chunked Misra-Gries summaries, summed, must retain every item
    with true frequency > n/k (the classic deficit bound)."""
    rng = np.random.default_rng(11)
    k = 5
    stream = rng.zipf(1.5, size=20_000) % 100  # skewed item ids
    n = len(stream)
    true_vals, true_cnts = np.unique(stream, return_counts=True)
    must_keep = set(true_vals[true_cnts > n / k].tolist())
    merged: dict[int, int] = {}
    for chunk in np.array_split(stream, 37):  # uneven block boundaries
        v, c = np.unique(chunk, return_counts=True)
        v, c = _mg_summarize(v, c, k)
        for vi, ci in zip(v.tolist(), c.tolist()):
            merged[vi] = merged.get(vi, 0) + ci
    assert must_keep <= set(merged), (must_keep, set(merged))


def test_heavy_hitters_partition_invariance(ray_session):
    """Same exact answer regardless of block layout (per-block MG
    summaries differ, the rescored output must not)."""
    tbl = pq.read_table(f"{SF}/documents.parquet")
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        df = (
            heavy_hitters(ds, col="lang", phi=0.2)
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    want = duckdb.sql(
        f"SELECT lang, count(*) n FROM read_parquet('{SF}/documents.parquet') "
        f"GROUP BY 1 HAVING n > 0.2 * (SELECT count(*) FROM "
        f"read_parquet('{SF}/documents.parquet')) ORDER BY lang"
    ).df()
    assert outs[0]["lang"].tolist() == want["lang"].tolist()
    assert outs[0]["n_rows"].tolist() == want["n"].tolist()


def test_quantile_sketch_rank_bound(ray_session):
    """The weighted rank-sample sketch must honor its 1/m relative-rank
    guarantee on a wide-domain float column with many blocks."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.sketch import grouped_quantiles_sketch

    rng = np.random.default_rng(3)
    n = 120_000
    keys = np.array(["k%02d" % v for v in rng.integers(0, 8, n)])
    vals = rng.normal(0, 1000, n)  # effectively unique values
    t = pa.table({"source": pa.array(keys), "n_chars": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(24)
    got = grouped_quantiles_sketch(ds, m=256).to_pandas().set_index("source")
    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals})
    for k, grp in df.groupby("k"):
        sv = np.sort(grp["v"].to_numpy())
        nk = len(sv)
        assert got.loc[k, "n_rows"] == nk
        for p in (50, 90):
            ans = got.loc[k, f"p{p}"]
            rank = np.searchsorted(sv, ans, side="left")
            target = max((p * nk + 99) // 100 - 1, 0)
            assert abs(rank - target) <= max(2, nk // 256 + 2), (k, p)


def test_quantile_sketch_exact_when_small(ray_session):
    """With fewer than m values per (key, block), the sketch degrades
    to the exact answer."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.sketch import (
        grouped_quantiles,
        grouped_quantiles_sketch,
    )

    rng = np.random.default_rng(4)
    n = 3000
    keys = np.array(["s%d" % v for v in rng.integers(0, 4, n)])
    vals = rng.integers(0, 10_000, n).astype(np.int64)
    t = pa.table({"source": pa.array(keys), "n_chars": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(2)  # ≤ m=2048 values per block
    exact = (
        grouped_quantiles(ds).to_pandas().sort_values("source").reset_index(drop=True)
    )
    approx = (
        grouped_quantiles_sketch(ds, m=2048)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert (approx["p50"].to_numpy() == exact["p50"].to_numpy().astype(float)).all()
    assert (approx["p90"].to_numpy() == exact["p90"].to_numpy().astype(float)).all()


def test_grouped_quantiles_cardinality_guard(ray_session, caplog):
    """The no-silent-degradation guard (VERDICT r2 item 7): near-unique
    value domains trip a loud warning recommending the sketch fallback,
    and results stay exact regardless."""
    import logging

    import pandas as pd
    import ray.data

    from workbook_exporter_fe_ray.stages.sketch import (
        _warn_cardinality,
        grouped_quantiles,
    )

    # unit: the guard fires above the threshold, stays quiet below
    with caplog.at_level(logging.WARNING):
        _warn_cardinality("grouped_quantiles", 10, 100)
        assert not caplog.records
        _warn_cardinality("grouped_quantiles", 101, 100)
        assert any("grouped_quantiles_sketch" in r.message for r in caplog.records)

    # end-to-end: a tripped guard must not change the (exact) output
    df = pd.DataFrame(
        {"source": ["a"] * 1000 + ["b"] * 500, "n_chars": list(range(1000)) + list(range(500))}
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        grouped_quantiles(ds, max_distinct_per_key=50)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    # quantile_disc index = ceil(p*n/100) - 1 over 0..n-1 values
    assert got.loc[0, "p50"] == 499 and got.loc[0, "p90"] == 899
    assert got.loc[1, "p50"] == 249 and got.loc[1, "p90"] == 449
    assert list(got["n_rows"]) == [1000, 500]
