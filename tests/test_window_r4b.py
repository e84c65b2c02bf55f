"""Round-4b operators vs brute-force single-process references:
time-weighted average, staleness gaps, irate, value histogram, and the
Gopher duplicate-bigram repetition screens (words and token ids)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from workbook_exporter_fe_ray.stages.pack import seq_bigram_repetition
from workbook_exporter_fe_ray.stages.text import doc_bigram_repetition
from workbook_exporter_fe_ray.stages.window import (
    cents_histogram,
    irate_last_pair,
    staleness_gaps,
    time_weighted_avg_daily,
)

US = 1_000_000
DAY = 86_400 * US


def _events_table(n=6000, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 3 * DAY, n)
    # plant timestamp TIES (same ts, distinct event_id) to pin the
    # (ts, event_id) tie-break through every sweep
    ts[100:120] = ts[99]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 5, n)], pa.string()
            ),
            "value": pa.array(np.round(rng.normal(50, 40, n), 2), pa.float64()),
        }
    )


@pytest.fixture(scope="module")
def ev_tbl():
    return _events_table()


def _ds(tbl: pa.Table) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(6)


def _sorted_df(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    return df.sort_values(["event_type", "tsu", "event_id"]).reset_index(drop=True)


def test_time_weighted_avg_vs_brute(ev_tbl, ray_session):
    out = time_weighted_avg_daily(_ds(ev_tbl)).to_pandas()
    df = _sorted_df(ev_tbl)
    exp = {}
    for (src, day), g in df.groupby(["event_type", "day"]):
        tsv = g["tsu"].to_numpy()
        cv = g["c"].to_numpy()
        span = int(tsv[-1] - tsv[0])
        if span <= 0:
            continue
        wsum = int(np.sum(cv[:-1] * (tsv[1:] - tsv[:-1])))
        exp[(src, day)] = (len(g), span, wsum, float(wsum) / float(span))
    assert len(out) == len(exp)
    for r in out.itertuples():
        key = (r.source, r.day.value // 1000 if hasattr(r.day, "value") else r.day)
        n, span, wsum, twa = exp[(r.source, int(pd.Timestamp(r.day).value // 1000))]
        assert r.n_points == n
        assert r.span_us == span
        assert r.wsum_cents_us == wsum
        assert np.float64(r.twa_cents).view(np.int64) == np.float64(twa).view(
            np.int64
        )


def test_time_weighted_avg_tie_order(ray_session):
    # three samples, first two at the SAME ts: the tie-break by
    # event_id decides which value carries the only nonzero weight
    t0 = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array([2, 1, 3], pa.int64()),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "ts": pa.array([t0, t0, t0 + 10 * US], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = time_weighted_avg_daily(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 1
    # order by (ts, event_id): eid1 (200c) first -> weight 0, then
    # eid2 (100c) carries the 10 s gap
    assert out["wsum_cents_us"].iloc[0] == 100 * 10 * US
    assert out["n_points"].iloc[0] == 3


def test_staleness_gaps_vs_brute(ev_tbl, ray_session):
    out = staleness_gaps(_ds(ev_tbl)).to_pandas()
    df = _sorted_df(ev_tbl)
    exp = {}
    for (src, day), g in df.groupby(["event_type", "day"]):
        if len(g) < 2:
            continue
        gaps = np.diff(g["tsu"].to_numpy())
        exp[(src, day)] = (
            len(g),
            len(gaps),
            int(gaps.max()),
            int((gaps > 600 * US).sum()),
        )
    assert len(out) == len(exp)
    for r in out.itertuples():
        n, ng, mx, st = exp[(r.source, int(pd.Timestamp(r.day).value // 1000))]
        assert (r.n_points, r.n_gaps, r.max_gap_us, r.n_stale) == (n, ng, mx, st)


def test_irate_vs_brute(ev_tbl, ray_session):
    out = irate_last_pair(_ds(ev_tbl)).to_pandas()
    df = _sorted_df(ev_tbl)
    df["bucket"] = df["tsu"] - df["tsu"] % (3600 * US)
    exp = {}
    for (src, b), g in df.groupby(["event_type", "bucket"]):
        if len(g) < 2:
            continue
        tsv = g["tsu"].to_numpy()
        cv = g["c"].to_numpy()
        dus = int(tsv[-1] - tsv[-2])
        if dus <= 0:
            continue
        dc = int(cv[-1] - cv[-2])
        exp[(src, b)] = (dc, dus, (np.float64(dc) / np.float64(dus)) * 1e6)
    assert len(out) == len(exp)
    for r in out.itertuples():
        dc, dus, ir = exp[(r.source, int(pd.Timestamp(r.bucket_ts).value // 1000))]
        assert (r.delta_cents, r.delta_us) == (dc, dus)
        assert np.float64(r.irate_per_s).view(np.int64) == np.float64(ir).view(
            np.int64
        )


def test_irate_tied_last_pair_dropped(ray_session):
    # last two samples of the bucket share a timestamp -> dropped
    t0 = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "ts": pa.array([t0, t0 + US, t0 + US], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = irate_last_pair(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 0


def test_cents_histogram_vs_brute_truncating(ev_tbl, ray_session):
    # the test table has NEGATIVE cents -> exercises the SQL `//`
    # truncation semantic (floor would bin -1 into -2500)
    out = cents_histogram(_ds(ev_tbl)).to_pandas()
    df = ev_tbl.to_pandas()
    c = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    assert (c < 0).any()
    binlo = (np.trunc(c / 2500.0)).astype(np.int64) * 2500
    exp = (
        pd.DataFrame({"source": df["event_type"], "bin_lo_cents": binlo})
        .groupby(["source", "bin_lo_cents"])
        .size()
    )
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert exp[(r.source, r.bin_lo_cents)] == r.n_points
    assert int(out["n_points"].sum()) == len(df)


def test_doc_bigram_repetition_vs_brute(ray_session):
    texts = [
        "the cat sat on the cat sat again",
        "a b a b a b",
        "unique words only here",
        "single",
        "",
        "x x x x x x x x",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    out = (
        doc_bigram_repetition(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    exp = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        bgs = list(zip(ws[:-1], ws[1:]))
        if not bgs:
            continue
        exp[i] = (len(bgs), len(set(bgs)))
    assert sorted(out.index) == sorted(exp)
    for i, (nb, nd) in exp.items():
        assert out.loc[i, "n_bigrams"] == nb
        assert out.loc[i, "n_distinct"] == nd
        assert out.loc[i, "dup_frac"] == np.float64(nb - nd) / np.float64(nb)


def test_seq_bigram_repetition_vs_brute_and_dup_collapse(ray_session):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        n = int(rng.integers(1, 40))
        rows.append((f"d{i:04d}", rng.integers(0, 7, n).astype(np.int32)))
    # exact duplicate rows (same doc_id, same tokens) must collapse
    rows += rows[:20]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
        }
    )
    out = (
        seq_bigram_repetition(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    exp = {}
    for did, toks in rows[:200]:
        if len(toks) < 2:
            continue
        pairs = list(zip(toks[:-1].tolist(), toks[1:].tolist()))
        exp[did] = (len(pairs), len(set(pairs)))
    assert sorted(out.index) == sorted(exp)
    for did, (npair, nd) in exp.items():
        assert out.loc[did, "n_pairs"] == npair
        assert out.loc[did, "n_distinct"] == nd
        assert out.loc[did, "dup_frac"] == np.float64(npair - nd) / np.float64(npair)


def test_sweeps_partition_invariance(ev_tbl, ray_session):
    """Same results regardless of block layout (1 block vs 13 blocks)."""
    a = (
        time_weighted_avg_daily(ray.data.from_arrow(ev_tbl).repartition(1))
        .to_pandas()
        .sort_values(["source", "day"])
        .reset_index(drop=True)
    )
    b = (
        time_weighted_avg_daily(ray.data.from_arrow(ev_tbl).repartition(13))
        .to_pandas()
        .sort_values(["source", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_histogram_p95_vs_brute(ev_tbl, ray_session):
    from workbook_exporter_fe_ray.stages.window import histogram_p95

    out = histogram_p95(_ds(ev_tbl)).to_pandas().set_index("source")
    df = ev_tbl.to_pandas()
    c = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    binlo = np.trunc(c / 2500.0).astype(np.int64) * 2500
    for src, g in pd.DataFrame({"s": df["event_type"], "b": binlo}).groupby("s"):
        cnt = g.groupby("b").size().sort_index()
        n = int(cnt.sum())
        target = (n * 95 + 99) // 100
        cum = cnt.cumsum()
        lo = int(cum.index[np.searchsorted(cum.values, target)])
        cumb = int(cum[cum.index < lo].iloc[-1]) if (cum.index < lo).any() else 0
        bn = int(cnt[lo])
        exp = np.float64(lo) + (np.float64(2500) * np.float64(target - cumb)) / np.float64(bn)
        assert out.loc[src, "n_points"] == n
        assert np.float64(out.loc[src, "p95_cents"]).view(np.int64) == exp.view(np.int64)


def test_count_burstiness_vs_brute(ev_tbl, ray_session):
    from workbook_exporter_fe_ray.stages.window import count_burstiness

    out = count_burstiness(_ds(ev_tbl)).to_pandas().set_index("source")
    df = ev_tbl.to_pandas()
    tsu = ev_tbl["ts"].cast(pa.int64()).to_numpy()
    mins = tsu - tsu % (60 * US)
    for src, g in pd.DataFrame({"s": df["event_type"], "m": mins}).groupby("s"):
        k = g.groupby("m").size().to_numpy().astype(np.int64)
        n, s, s2 = len(k), int(k.sum()), int((k * k).sum())
        nf, sf, s2f = np.float64(n), np.float64(s), np.float64(s2)
        mean = sf / nf
        var = (s2f - (sf * sf) / nf) / nf
        assert out.loc[src, "n_buckets"] == n
        assert out.loc[src, "sum_counts"] == s
        assert out.loc[src, "sumsq_counts"] == s2
        assert np.float64(out.loc[src, "fano"]).view(np.int64) == np.float64(var / mean).view(np.int64)


def test_bm25_vs_brute(ray_session):
    import math

    from workbook_exporter_fe_ray.stages.text import bm25_score

    texts = [
        "join hash scan join join filter",
        "merge sort merge data table",
        "no query words here at all",
        "scan scan scan scan",
        "join",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    out = bm25_score(ray.data.from_arrow(tbl).repartition(2)).to_pandas()
    terms = ("join", "hash", "scan", "filter", "merge", "sort")
    docs = [t.split(" ") for t in texts]
    N = len(docs)
    tdl = sum(len(d) for d in docs)
    avgdl = np.float64(tdl) / np.float64(N)
    exp = {}
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    for i, d in enumerate(docs):
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(
                (np.float64(N - df[t]) + 0.5) / (np.float64(df[t]) + 0.5)
            )
            frac = (np.float64(tf) * np.float64(2.2)) / (
                np.float64(tf)
                + np.float64(1.2)
                * (np.float64(0.25) + np.float64(0.75) * (np.float64(len(d)) / avgdl))
            )
            exp[(i, t)] = (tf, len(d), idf * frac)
    assert len(out) == len(exp)
    for r in out.itertuples():
        tf, dl, score = exp[(r.doc_id, r.term)]
        assert (r.tf, r.dl) == (tf, dl)
        assert np.float64(r.bm25).view(np.int64) == np.float64(score).view(np.int64)
    # docs with no query term contribute no rows but DO count in N/avgdl
    assert 2 not in set(out["doc_id"])
