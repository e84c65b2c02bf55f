"""Round-4d operators vs brute-force single-process references:
CUSUM drift, lag-1 autocorrelation, and hourly ratio-to-total."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.window import (
    autocorr_lag1,
    cusum_drift,
    ratio_to_total_1h,
)

US = 1_000_000
DAY = 86_400 * US
HOUR = 3_600 * US


def _events_table(n=6000, seed=23) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 3 * DAY, n)
    ts[100:120] = ts[99]  # ties pin the (ts, event_id) tie-break
    # a drifting segment so CUSUM has a real changepoint to find
    vals = np.round(rng.normal(50, 40, n), 2)
    vals[3000:3400] += 250.0
    vals[500:560] = vals[499]  # flat runs: zero variance pairs exist
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 5, n)], pa.string()
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )


def _prepped(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    return df.sort_values(["event_type", "tsu", "event_id"])


def test_cusum_drift_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        cusum_drift(ray.data.from_arrow(tbl).repartition(6), thresh_cents=50_000)
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_expected += 1
        c = g["c"].to_numpy()
        med = int(np.sort(c)[(len(c) + 1) // 2 - 1])
        s = 0
        mx = 0
        n_over = 0
        for v in c:
            s = max(0, s + (int(v) - med))
            mx = max(mx, s)
            n_over += s > 50_000
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_events"] == len(c)
        assert r["med_cents"] == med
        assert r["max_cusum"] == mx
        assert r["n_over"] == n_over
    assert len(out) == n_expected


def test_autocorr_lag1_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        autocorr_lag1(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        c = g["c"].to_numpy()
        if len(c) < 3:
            continue
        x, y = c[:-1].astype(object), c[1:].astype(object)
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxx, syy, sxy = sum(x * x), sum(y * y), sum(x * y)
        if n < 2 or n * sxx - sx * sx <= 0 or n * syy - sy * sy <= 0:
            continue
        n_expected += 1
        f = np.float64
        corr = (f(n) * f(sxy) - f(sx) * f(sy)) / (
            np.sqrt(f(n) * f(sxx) - f(sx) * f(sx))
            * np.sqrt(f(n) * f(syy) - f(sy) * f(sy))
        )
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_pairs"] == n
        # bit-identical: same pinned float evaluation order
        assert np.float64(r["corr_lag1"]).view(np.int64) == corr.view(np.int64)
    assert len(out) == n_expected


def test_autocorr_constant_run_filtered(ray_session):
    # one source whose values never change -> zero variance -> no row
    n = 64
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (1_700_000_000 * US + np.arange(n) * US).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["flat"] * n, pa.string()),
            "value": pa.array(np.full(n, 7.25), pa.float64()),
        }
    )
    out = autocorr_lag1(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 0


def test_ratio_to_total_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        ratio_to_total_1h(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .sort_values(["hour", "source"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["hour"] = df["tsu"] - df["tsu"] % HOUR
    g = (
        df.groupby(["hour", "event_type"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    g["tot"] = g.groupby("hour")["n"].transform("sum")
    assert len(out) == len(g)
    assert (out["source"].to_numpy() == g["event_type"].to_numpy()).all()
    assert (out["n_events"].to_numpy() == g["n"].to_numpy()).all()
    assert (out["n_total"].to_numpy() == g["tot"].to_numpy()).all()
    share = g["n"].to_numpy().astype(np.float64) / g["tot"].to_numpy().astype(
        np.float64
    )
    assert (out["share"].to_numpy().view(np.int64) == share.view(np.int64)).all()
    # shares of one hour sum to ~1
    sums = out.groupby("hour")["share"].sum()
    assert np.allclose(sums.to_numpy(), 1.0)


def test_seasonal_naive_mae_vs_brute(ray_session):
    tbl = _events_table(n=8000, seed=31)
    from workbook_exporter_fe_ray.stages.window import seasonal_naive_mae

    out = (
        seasonal_naive_mae(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["hour"] = df["tsu"] - df["tsu"] % HOUR
    b = df.groupby(["event_type", "hour"])["c"].sum().rename("s").reset_index()
    n_expected = 0
    for src, g in b.groupby("event_type"):
        m = dict(zip(g["hour"], g["s"]))
        errs = [
            abs(int(s) - int(m[h - 24 * HOUR]))
            for h, s in zip(g["hour"], g["s"])
            if h - 24 * HOUR in m
        ]
        if not errs:
            continue
        n_expected += 1
        r = out.loc[src]
        assert r["n_scored"] == len(errs)
        assert r["total_abs_err"] == sum(errs)
        exp = np.float64(np.int64(sum(errs))) / np.float64(np.int64(len(errs)))
        assert np.float64(r["mae_cents"]).view(np.int64) == exp.view(np.int64)
    assert len(out) == n_expected


def _docs_table(n=400, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = [
        " ".join(vocab[rng.integers(0, 50, rng.integers(1, 30))]) for _ in range(n)
    ]
    # planted shared prefixes: 3 SAME-SOURCE docs (9 % 3 == 12 % 3 ==
    # 15 % 3 == 0) with an identical 8-token intro
    intro = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts[9] = intro + " " + texts[9]
    texts[12] = intro + " " + texts[12]
    texts[15] = intro + " " + texts[15]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        }
    )


def test_prefix_dup_groups_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.text import prefix_dup_groups

    tbl = _docs_table()
    out = (
        prefix_dup_groups(ray.data.from_arrow(tbl).repartition(5), k=8)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["pre"] = df["text"].str.split(" ").apply(lambda l: " ".join(l[:8]))
    g = df.groupby(["source", "pre"]).size().rename("n").reset_index()
    for src, gg in g.groupby("source"):
        r = out.loc[src]
        assert r["n_docs"] == gg["n"].sum()
        assert r["n_prefix_groups"] == len(gg)
        assert r["n_dup_docs"] == gg.loc[gg["n"] > 1, "n"].sum()
    # the planted intro produced at least one dup group somewhere
    assert out["n_dup_docs"].sum() >= 3


def test_bigram_vocab_size_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.text import bigram_vocab_size

    tbl = _docs_table(seed=11)
    out = (
        bigram_vocab_size(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    agg: dict[str, set] = {}
    for src, t in zip(df["source"], df["text"]):
        l = t.split(" ")
        agg.setdefault(src, set()).update(
            l[i] + " " + l[i + 1] for i in range(len(l) - 1)
        )
    assert len(out) == len(agg)
    for src, v in agg.items():
        assert out.loc[src, "n_distinct_bigrams"] == len(v)


def test_embedding_quant_stats_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.similarity import embedding_quant_stats

    rng = np.random.default_rng(3)
    vecs = [rng.normal(0, 0.2, 64).astype(np.float32) for _ in range(200)]
    vecs[5] = rng.normal(0, 0.2, 32).astype(np.float32)  # ragged dim
    vecs[7] = np.zeros(0, np.float32)  # empty vector
    labels = rng.integers(0, 4, 200).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = (
        embedding_quant_stats(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    exp: dict[int, list] = {}
    for v, lb in zip(vecs, labels):
        q = np.floor(v.astype(np.float64) * 1e6).astype(np.int64)
        r = exp.setdefault(int(lb), [0, 1 << 62, -1, 0, 0])
        r[0] += 1
        r[1] = min(r[1], len(v))
        r[2] = max(r[2], len(v))
        r[3] += int(q.sum())
        r[4] += int((q * q).sum())
    assert len(out) == len(exp)
    for lb, (n, dmin, dmax, sq, sq2) in exp.items():
        r = out.loc[lb]
        assert r["n_vecs"] == n
        assert r["dim_min"] == dmin
        assert r["dim_max"] == dmax
        assert r["sum_q"] == sq
        assert r["sum_q2"] == sq2


def test_pmi_top_bigrams_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.text import pmi_top_bigrams

    tbl = _docs_table(n=600, seed=13)
    out = (
        pmi_top_bigrams(
            ray.data.from_arrow(tbl).repartition(5), k=15, min_count=4
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    # brute force
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    total = 0
    for t in tbl["text"].to_pylist():
        l = t.split(" ")
        total += len(l)
        for w in l:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(l[:-1], l[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    import math

    f = np.float64
    cand = []
    for (a, b), cxy in bi.items():
        if cxy < 4:
            continue
        # libm log, matching the engine and DuckDB ln
        pmi = np.float64(math.log((f(cxy) * f(total)) / (f(uni[a]) * f(uni[b]))))
        cand.append((a, b, cxy, uni[a], uni[b], pmi))
    cand.sort(key=lambda r: (-r[5], r[0], r[1]))
    exp = cand[:15]
    assert len(out) == len(exp)
    for i, (a, b, cxy, cx, cy, pmi) in enumerate(exp):
        r = out.iloc[i]
        assert (r["w1"], r["w2"]) == (a, b)
        assert r["c_xy"] == cxy and r["c_x"] == cx and r["c_y"] == cy
        assert np.float64(r["pmi"]).view(np.int64) == np.float64(pmi).view(np.int64)


def test_ndjson_ingest_stats_vs_brute(ray_session):
    import json

    import __ray_entry__ as E

    out = (
        E.queries()["ndjson_ingest_stats"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    exp: dict[str, list] = {}
    with open(E._NDJSON_FIXTURE) as fh:
        for line in fh:
            d = json.loads(line)
            r = exp.setdefault(d["lang"], [0, 0, 0, 0])
            r[0] += 1
            r[1] += d["n_chars"]
            r[2] += d["n_lines"]
            r[3] = max(r[3], d["n_chars"])
    assert len(out) == len(exp)
    for lang, (n, sc, sl, mx) in exp.items():
        r = out.loc[lang]
        assert r["n_docs"] == n
        assert r["sum_chars"] == sc
        assert r["sum_lines"] == sl
        assert r["max_chars"] == mx


def test_token_len_histogram_vs_brute(ray_session):
    from collections import Counter

    from workbook_exporter_fe_ray.stages.text import token_len_histogram

    tbl = _docs_table(n=300, seed=19)
    out = (
        token_len_histogram(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("tok_len")
        .sort_index()
    )
    c: Counter = Counter()
    for t in tbl["text"].to_pylist():
        for w in t.split(" "):
            c[len(w)] += 1
    assert len(out) == len(c)
    for ln, n in c.items():
        assert out.loc[ln, "n_tokens"] == n


def test_dup_cluster_size_hist_planted(ray_session):
    from collections import Counter

    from workbook_exporter_fe_ray.stages.text import dup_cluster_size_hist

    tbl = _docs_table(n=300, seed=29)
    texts = tbl["text"].to_pylist()
    # plant a size-4 and a size-3 exact-duplicate cluster
    for i in (40, 80, 120, 160):
        texts[i] = "dup cluster alpha body"
    for i in (55, 95, 135):
        texts[i] = "dup cluster beta body"
    tbl = tbl.set_column(1, "text", pa.array(texts, pa.string()))
    out = (
        dup_cluster_size_hist(ray.data.from_arrow(tbl).repartition(7))
        .to_pandas()
        .set_index("cluster_size")
        .sort_index()
    )
    sizes = Counter(Counter(texts).values())
    assert len(out) == len(sizes)
    for sz, n in sizes.items():
        assert out.loc[sz, "n_clusters"] == n
        assert out.loc[sz, "n_docs"] == sz * n
    assert out.loc[4, "n_clusters"] == 1 and out.loc[3, "n_clusters"] == 1


def test_top_event_per_day_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import top_event_per_day

    tbl = _events_table(n=5000, seed=41)
    # plant a tie: two events same day/source/value -> min event_id wins
    out = (
        top_event_per_day(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_expected += 1
        g = g.sort_values(["c", "event_id"], ascending=[False, True])
        r0 = g.iloc[0]
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["event_id"] == r0["event_id"]
        assert r["max_cents"] == r0["c"]
        assert r["ts"].value // 1000 == r0["tsu"]  # Timestamp.value is ns
    assert len(out) == n_expected


def test_user_retention_cohorts_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import user_retention_cohorts

    tbl = _events_table(n=6000, seed=53)
    out = (
        user_retention_cohorts(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["cohort_day", "age_days"])
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    d = df[["user_id", "day"]].drop_duplicates()
    first = d.groupby("user_id")["day"].min().rename("cohort")
    j = d.join(first, on="user_id")
    j["age"] = (j["day"] - j["cohort"]) // DAY
    exp = j.groupby(["cohort", "age"]).size()
    assert len(out) == len(exp)
    for (coh, age), n in exp.items():
        assert out.loc[(pd.Timestamp(coh, unit="us"), age), "n_users"] == n


def test_inter_arrival_hist_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import inter_arrival_hist

    tbl = _events_table(n=6000, seed=59)
    out = (
        inter_arrival_hist(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "bucket"])
        .sort_index()
    )
    df = _prepped(tbl)
    rows: dict = {}
    for (src, day), g in df.groupby(["event_type", "day"]):
        for gp in np.diff(g["tsu"].to_numpy()):
            b = max(int(gp).bit_length(), 1)
            rows[(src, b)] = rows.get((src, b), 0) + 1
    assert len(out) == len(rows)
    for (src, b), n in rows.items():
        assert out.loc[(src, b), "n_gaps"] == n
    # tied timestamps exist in the fixture -> gap-0 gaps land in bucket 1
    assert any(b == 1 for (_, b) in rows)


def test_local_supplier_revenue_vs_brute(ray_session):
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = (
        E.queries()["local_supplier_revenue"](sf)
        .to_pandas()
        .set_index("n_name")
        .sort_index()
    )
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    sup = pq.read_table(f"{sf}/supplier.parquet").to_pandas()
    nat = pq.read_table(f"{sf}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf}/region.parquet").to_pandas()
    natr = nat[nat["n_regionkey"].isin(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])]
    o = orders[
        (orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
        & (orders["o_orderdate"] < pd.Timestamp("1997-01-01"))
    ]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[(j["c_nationkey"] == j["s_nationkey"]) & j["s_nationkey"].isin(natr["n_nationkey"])]
    rev = np.round(j["l_extendedprice"].to_numpy() * 100).astype(np.int64) * (
        100 - np.round(j["l_discount"].to_numpy() * 100).astype(np.int64)
    )
    j = j.assign(rev=rev).merge(natr, left_on="s_nationkey", right_on="n_nationkey")
    exp = j.groupby("n_name")["rev"].sum()
    assert len(out) == len(exp)
    for name, r in exp.items():
        assert out.loc[name, "revenue_e4"] == r
        e = np.int64(r).astype(np.float64) / np.float64(10_000.0)
        assert np.float64(out.loc[name, "revenue"]).view(np.int64) == e.view(np.int64)


def test_lang_confusion_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.text import _STOPWORDS, lang_confusion

    rng = np.random.default_rng(67)
    langs = ["en", "de", "fr", "zh"]
    # texts with known stopword mixes, incl. und rows (no stopwords)
    pool = {
        "en": "the cat of doom and more",
        "de": "der hund und die katze",
        "fr": "le chat et la mer",
        "zh": "pure opaque tokens here",
    }
    rows = [(f"d{i}", langs[i % 4], pool[langs[rng.integers(0, 4)]]) for i in range(200)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "lang": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    out = (
        lang_confusion(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .set_index(["lang", "lang_pred"])
        .sort_index()
    )
    from collections import Counter

    cm: Counter = Counter()
    names = sorted(_STOPWORDS)
    for _, lang, text in rows:
        toks = text.lower().split(" ")
        sc = {k: sum(1 for w in toks if w in _STOPWORDS[k]) for k in names}
        best = max(sc.values())
        pred = "und" if best == 0 else min(k for k in names if sc[k] == best)
        cm[(lang, pred)] += 1
    assert len(out) == len(cm)
    for (lang, pred), n in cm.items():
        assert out.loc[(lang, pred), "n_docs"] == n


def test_hapax_rate_planted(ray_session):
    from workbook_exporter_fe_ray.stages.text import hapax_rate_by_source

    tbl = _docs_table(n=200, seed=71)
    texts = tbl["text"].to_pylist()
    texts[3] = texts[3] + " zzqx9unique"  # planted global hapax in s0
    texts[4] = texts[4] + " sharedrare"
    texts[5] = texts[5] + " sharedrare"  # count 2 -> NOT hapax
    tbl = tbl.set_column(1, "text", pa.array(texts, pa.string()))
    out = (
        hapax_rate_by_source(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    from collections import Counter, defaultdict

    sv: Counter = Counter()
    tot: Counter = Counter()
    for src, text in zip(tbl["source"].to_pylist(), texts):
        for w in text.split(" "):
            sv[(src, w)] += 1
            tot[w] += 1
    per: dict = defaultdict(lambda: [0, 0])
    for (src, w), _ in sv.items():
        per[src][0] += 1
        per[src][1] += tot[w] == 1
    assert len(out) == len(per)
    for src, (nv, nh) in per.items():
        r = out.loc[src]
        assert r["n_vocab"] == nv
        assert r["n_hapax"] == nh
        exp = np.float64(np.int64(nh)) / np.float64(np.int64(nv))
        assert np.float64(r["hapax_rate"]).view(np.int64) == exp.view(np.int64)
    assert per["s0"][1] >= 1  # the planted hapax registered


def test_ship_delay_hist_vs_brute(ray_session):
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = (
        E.queries()["ship_delay_hist"](sf)
        .to_pandas()
        .set_index("delay_days")
        .sort_index()
    )
    import pyarrow.parquet as pq

    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    delay = (
        (j["l_shipdate"].astype("int64") - j["o_orderdate"].astype("int64"))
        // 86_400_000_000
    ).astype(int)
    from collections import Counter

    exp = Counter(delay)
    assert len(out) == len(exp)
    for d, n in exp.items():
        assert out.loc[d, "n_items"] == n


def test_cross_corr_sources_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import cross_corr_sources

    tbl = _events_table(n=7000, seed=79)
    out = (
        cross_corr_sources(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["src_a", "src_b"])
        .sort_index()
    )
    df = _prepped(tbl)
    df["hour"] = df["tsu"] - df["tsu"] % HOUR
    b = df.groupby(["event_type", "hour"])["c"].sum().rename("s").reset_index()
    piv = b.pivot(index="hour", columns="event_type", values="s")
    srcs = sorted(piv.columns)
    f = np.float64
    n_expected = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            sub = piv[[srcs[i], srcs[j]]].dropna()
            x = sub[srcs[i]].to_numpy().astype(object)
            y = sub[srcs[j]].to_numpy().astype(object)
            n = len(x)
            if n < 2:
                continue
            sx, sy = sum(x), sum(y)
            sxx, syy, sxy = sum(x * x), sum(y * y), sum(x * y)
            varx = f(n) * f(sxx) - f(sx) * f(sx)
            vary = f(n) * f(syy) - f(sy) * f(sy)
            if not (varx > 0 and vary > 0):
                continue
            n_expected += 1
            corr = (f(n) * f(sxy) - f(sx) * f(sy)) / (
                np.sqrt(varx) * np.sqrt(vary)
            )
            r = out.loc[(srcs[i], srcs[j])]
            assert r["n_hours"] == n
            assert np.float64(r["corr_hourly"]).view(np.int64) == corr.view(
                np.int64
            )
    assert len(out) == n_expected


def test_quantile_over_time_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import quantile_over_time_daily

    tbl = _events_table(n=6000, seed=83)
    out = (
        quantile_over_time_daily(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_expected += 1
        c = np.sort(g["c"].to_numpy())
        n = len(c)
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        for q, col in ((50, "p50_cents"), (90, "p90_cents"), (99, "p99_cents")):
            assert r[col] == c[(q * n + 99) // 100 - 1]
        assert r["n_events"] == n
    assert len(out) == n_expected


def test_weekday_weekend_contrast_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import weekday_weekend_contrast

    # 7-day span (the shared fixture covers Tue-Fri only — no weekend)
    rng = np.random.default_rng(89)
    n = 9000
    ts = 1_700_000_000 * US + rng.integers(0, 7 * DAY, n)
    tbl = pa.table(
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
    out = (
        weekday_weekend_contrast(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = _prepped(tbl)
    df["we"] = ((df["tsu"] // DAY + 3) % 7) >= 5
    f = np.float64
    n_expected = 0
    for src, g in df.groupby("event_type"):
        nwd = int((~g["we"]).sum())
        nwe = int(g["we"].sum())
        if nwd == 0 or nwe == 0:
            continue
        n_expected += 1
        swd = int(g.loc[~g["we"], "c"].sum())
        swe = int(g.loc[g["we"], "c"].sum())
        r = out.loc[src]
        assert r["n_weekday"] == nwd and r["n_weekend"] == nwe
        assert r["sum_weekday_cents"] == swd and r["sum_weekend_cents"] == swe
        for s, n, col in ((swd, nwd, "mean_weekday"), (swe, nwe, "mean_weekend")):
            exp = f(np.int64(s)) / f(np.int64(n))
            assert np.float64(r[col]).view(np.int64) == exp.view(np.int64)
    assert len(out) == n_expected


def test_value_change_quantiles_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import value_change_quantiles

    tbl = _events_table(n=6000, seed=97)
    out = (
        value_change_quantiles(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        ad = np.abs(np.diff(g["c"].to_numpy()))
        if len(ad) == 0:
            continue
        n_expected += 1
        ads = np.sort(ad)
        n = len(ads)
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_deltas"] == n
        assert r["p50_abs_delta"] == ads[(50 * n + 99) // 100 - 1]
        assert r["p90_abs_delta"] == ads[(90 * n + 99) // 100 - 1]
    assert len(out) == n_expected


def test_incremental_merge_audit_agrees(ray_session):
    from workbook_exporter_fe_ray.pipelines.events import incremental_merge_audit

    out = incremental_merge_audit("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    # the merge of disjoint half-stream tiers must equal the
    # single-pass tier in EVERY bucket — this is resume soundness
    assert (out["n_buckets"].to_numpy() == out["n_agree"].to_numpy()).all()


def test_dup_graph_degree_hist_planted(ray_session):
    from workbook_exporter_fe_ray.stages.dedup import dup_graph_degree_hist

    rng = np.random.default_rng(101)
    vocab = np.array([f"tk{i}" for i in range(4000)])
    # 40 unique long docs + one planted template family of 4 near-identical
    texts = [
        " ".join(vocab[rng.integers(0, 4000, 60)]) for _ in range(40)
    ]
    base = " ".join(vocab[rng.integers(0, 4000, 60)])
    fam = [base + f" extra{i}" for i in range(4)]  # pairwise jaccard ~ .94
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(44, dtype=np.int64)),
            "text": pa.array(texts + fam, pa.string()),
        }
    )
    out = (
        dup_graph_degree_hist(ray.data.from_arrow(tbl).repartition(4), threshold=0.35)
        .to_pandas()
        .set_index("degree")
        .sort_index()
    )
    # the 4-doc family forms a clique: every member has degree 3
    assert out.loc[3, "n_docs"] == 4


def test_rollup_1mo_calendar_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import rollup_1mo_calendar

    # span three calendar months incl. a month boundary mid-fixture
    rng = np.random.default_rng(103)
    n = 5000
    ts = 1_700_000_000 * US + rng.integers(0, 80 * DAY, n)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 4, n)], pa.string()
            ),
            "value": pa.array(np.round(rng.normal(50, 40, n), 2), pa.float64()),
        }
    )
    out = (
        rollup_1mo_calendar(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["source", "bucket_ts"])
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    tsu = tbl["ts"].cast(pa.int64()).to_numpy()
    df["m"] = (
        tsu.astype("datetime64[us]")
        .astype("datetime64[M]")
        .astype("datetime64[us]")
        .view(np.int64)
    )
    g = df.groupby(["event_type", "m"])["c"].agg(["count", "sum", "min", "max"])
    assert len(out) == len(g)
    assert g.index.get_level_values("m").nunique() >= 3
    for (src, m), r0 in g.iterrows():
        r = out.loc[(src, pd.Timestamp(m, unit="us"))]
        assert r["n_points"] == r0["count"]
        assert r["sum_cents"] == r0["sum"]
        assert r["min_cents"] == r0["min"] and r["max_cents"] == r0["max"]
        exp = np.float64(np.int64(r0["sum"])) / np.float64(np.int64(r0["count"]))
        assert np.float64(r["mean_cents"]).view(np.int64) == exp.view(np.int64)


def test_user_gini_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import user_gini_concentration

    tbl = _events_table(n=6000, seed=107)
    out = (
        user_gini_concentration(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    n_expected = 0
    for src, g in df.groupby("event_type"):
        x = np.sort(g.groupby("user_id").size().to_numpy()).astype(object)
        n = len(x)
        sx = sum(x)
        six = sum((i + 1) * v for i, v in enumerate(x))
        num, den = 2 * six - (n + 1) * sx, n * sx
        if den <= 0:
            continue
        n_expected += 1
        r = out.loc[src]
        assert r["n_users"] == n
        assert r["gini_num"] == num and r["gini_den"] == den
        exp = np.float64(np.int64(num)) / np.float64(np.int64(den))
        assert np.float64(r["gini"]).view(np.int64) == exp.view(np.int64)
    assert len(out) == n_expected


def test_label_centroid_sums_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.similarity import label_centroid_sums

    rng = np.random.default_rng(109)
    vecs = [rng.normal(0, 0.2, 16).astype(np.float32) for _ in range(150)]
    vecs[3] = rng.normal(0, 0.2, 8).astype(np.float32)  # ragged vector
    labels = rng.integers(0, 3, 150).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(150, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = (
        label_centroid_sums(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["label", "dim"])
        .sort_index()
    )
    exp: dict = {}
    for v, lb in zip(vecs, labels):
        q = np.floor(v.astype(np.float64) * 1e6).astype(np.int64)
        for d in range(len(v)):
            r = exp.setdefault((int(lb), d), [0, 0])
            r[0] += 1
            r[1] += int(q[d])
    assert len(out) == len(exp)
    for (lb, d), (n, sq) in exp.items():
        r = out.loc[(lb, d)]
        assert r["n_vecs"] == n and r["sum_q"] == sq
    # the ragged vector shortened exactly its label's high dims
    lb3 = int(labels[3])
    assert out.loc[(lb3, 15), "n_vecs"] == out.loc[(lb3, 0), "n_vecs"] - 1


def test_above_avg_customers_vs_brute(ray_session):
    import __ray_entry__ as E

    out = (
        E.queries()["above_avg_customers"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("n_nationkey")
        .sort_index()
    )
    import pyarrow.parquet as pq

    c = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_nationkey", "c_acctbal"],
    ).to_pandas()
    c["b"] = np.round(c["c_acctbal"].to_numpy() * 100).astype(np.int64)
    for nk, g in c.groupby("c_nationkey"):
        n = len(g)
        sb = int(g["b"].sum())
        na = int((g["b"].to_numpy().astype(object) * n > sb).sum())
        r = out.loc[nk]
        assert r["n_customers"] == n
        assert r["sum_bal_cents"] == sb
        assert r["n_above"] == na
    assert len(out) == c["c_nationkey"].nunique()


def test_max_drawdown_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import max_drawdown

    tbl = _events_table(seed=311)
    # plant a single-row (source, day) run and a monotone-climb day
    extra = pa.table(
        {
            "event_id": pa.array([9_000_001], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_700_000_000 * US + 10 * DAY], pa.timestamp("us")),
            "event_type": pa.array(["solo"], pa.string()),
            "value": pa.array([7.25], pa.float64()),
        }
    )
    tbl = pa.concat_tables([tbl, extra])
    out = (
        max_drawdown(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_expected += 1
        c = g["c"].to_numpy()
        rmax = np.maximum.accumulate(c)
        rmin = np.minimum.accumulate(c)
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_events"] == len(c)
        assert r["max_drawdown_cents"] == int((rmax - c).max())
        assert r["max_runup_cents"] == int((c - rmin).max())
    assert len(out) == n_expected
    # the planted single-row day: both extrema are the row itself -> 0/0
    solo = out.loc[("solo",)].iloc[0]
    assert solo["n_events"] == 1
    assert solo["max_drawdown_cents"] == 0 and solo["max_runup_cents"] == 0


def test_longest_up_streak_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import longest_up_streak

    tbl = _events_table(seed=313)
    df0 = tbl.to_pandas()
    # plant: an 80-row strictly-increasing climb and a 60-row flat run
    df0.loc[200:279, "value"] = np.arange(80) * 1.5 + 3.0
    df0.loc[200:279, "event_type"] = "type_0"
    base_ts = int(df0.loc[200, "ts"].value // 1000)  # ns -> us
    df0.loc[200:279, "ts"] = pd.to_datetime(
        base_ts + np.arange(80), unit="us"
    )
    df0.loc[400:459, "value"] = 42.0  # flat: zero up-steps inside
    tbl = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)
    out = (
        longest_up_streak(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_expected += 1
        c = g["c"].to_numpy()
        best = cur = 0
        for i in range(1, len(c)):
            cur = cur + 1 if c[i] > c[i - 1] else 0
            best = max(best, cur)
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_events"] == len(c)
        assert r["max_up_streak"] == best
    assert len(out) == n_expected
    # the planted climb is contiguous in (ts, event_id) order -> >= 79
    day0 = (df["event_type"] == "type_0") & (
        df["day"] == (base_ts - base_ts % DAY)
    )
    assert day0.any()
    planted = out.loc[("type_0", pd.Timestamp(base_ts - base_ts % DAY, unit="us"))]
    assert planted["max_up_streak"] >= 79


def test_emb_argmax_hist_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.similarity import emb_argmax_hist

    rng = np.random.default_rng(317)
    vecs = [rng.normal(0, 0.2, 16).astype(np.float32) for _ in range(200)]
    vecs[5] = np.array([1.0, 3.0, 3.0, 2.0], np.float32)  # tie -> first wins
    vecs[7] = rng.normal(0, 0.2, 8).astype(np.float32)  # ragged
    vecs[9] = np.array([], np.float32)  # empty -> skipped
    labels = rng.integers(0, 3, 200).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = (
        emb_argmax_hist(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["label", "dim"])
        .sort_index()
    )
    exp: dict = {}
    for v, lb in zip(vecs, labels):
        if len(v) == 0:
            continue
        k = (int(lb), int(np.argmax(v)))
        exp[k] = exp.get(k, 0) + 1
    assert len(out) == len(exp)
    for k, n in exp.items():
        assert out.loc[k, "n_vecs"] == n
    assert int(out["n_vecs"].sum()) == 199  # the empty vector was skipped
    # the planted tie picked dim 1, not 2
    assert (int(labels[5]), 1) in exp


def test_custdist_hist_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.relational import custdist_hist

    rng = np.random.default_rng(331)
    n_cust, n_ord = 500, 3000
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    cust = pa.table({"c_custkey": pa.array(custkeys)})
    # orders over a SUBSET of customers (so zero-order customers exist),
    # plus orphan orders referencing custkeys not in the dim (LEFT-join
    # semantics must drop them), plus excluded-status rows
    ock = rng.integers(1, 400, n_ord).astype(np.int64)
    ock[:30] = rng.integers(10_000, 10_100, 30)  # orphans
    status = np.where(rng.random(n_ord) < 0.3, "F", "O")
    orders = pa.table(
        {
            "o_custkey": pa.array(ock),
            "o_orderstatus": pa.array(status.tolist(), pa.string()),
        }
    )
    out = (
        custdist_hist(
            ray.data.from_arrow(cust).repartition(4),
            ray.data.from_arrow(orders).repartition(6),
            n_buckets=7,  # non-power-of-two exercises the mod path
        )
        .to_pandas()
        .set_index("c_count")
        .sort_index()
    )
    qual = (status != "F") & np.isin(ock, custkeys)
    per_cust = {int(k): 0 for k in custkeys}
    for k in ock[qual]:
        per_cust[int(k)] += 1
    exp: dict = {}
    for c in per_cust.values():
        exp[c] = exp.get(c, 0) + 1
    assert len(out) == len(exp)
    for c, d in exp.items():
        assert out.loc[c, "custdist"] == d
    assert int(out["custdist"].sum()) == n_cust  # every customer counted once
    assert out.loc[0, "custdist"] >= 100  # the planted zero-order block


def test_trend_slope_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import trend_slope

    tbl = _events_table(seed=337)
    df0 = tbl.to_pandas()
    # plant an exactly-linear climb: y = 2.5 cents/s * x + 300 cents
    base_ns = int(df0.loc[100, "ts"].value)
    day_start_us = (base_ns // 1000) // (86_400 * US) * (86_400 * US)
    xs = np.arange(60, dtype=np.int64) * 7 + 1000  # distinct seconds
    df0.loc[100:159, "ts"] = pd.to_datetime(day_start_us + xs * US, unit="us")
    df0.loc[100:159, "value"] = (250 * xs + 300) / 100.0  # 2.5 c/s exactly
    df0.loc[100:159, "event_type"] = "linear"
    # plant a same-timestamp day: x-variance 0 -> filtered out
    df0.loc[300:320, "ts"] = df0.loc[300, "ts"]
    df0.loc[300:320, "event_type"] = "samex"
    tbl = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)
    out = (
        trend_slope(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = _prepped(tbl)
    df["x"] = (df["tsu"] - df["day"]) // US
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        x = g["x"].to_numpy().astype(object)
        y = g["c"].to_numpy().astype(object)
        n = len(x)
        if n < 2 or x.min() == x.max():
            assert (src, pd.Timestamp(day, unit="us")) not in out.index
            continue
        n_expected += 1
        sx, sy, sxx, sxy = sum(x), sum(y), sum(x * x), sum(x * y)
        f = np.float64
        exp = (f(n) * f(sxy) - f(sx) * f(sy)) / (f(n) * f(sxx) - f(sx) * f(sx))
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_events"] == n
        assert np.float64(r["slope_cents_per_s"]).view(np.int64) == exp.view(
            np.int64
        )
    assert len(out) == n_expected
    # the planted linear day recovers its slope exactly (OLS on exact
    # points): 250 cents per second
    lin = out.loc[("linear",)]
    assert np.isclose(lin["slope_cents_per_s"].iloc[0], 250.0, atol=1e-9)


def test_session_duration_hist_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.relational import session_duration_hist

    tbl = _events_table(seed=347)
    df0 = tbl.to_pandas()
    # plant: one user whose events all share a timestamp (zero-duration
    # session -> bucket 0) and one user with a single long session
    df0.loc[50:59, "user_id"] = 9001
    df0.loc[50:59, "ts"] = df0.loc[50, "ts"]
    df0.loc[70:89, "user_id"] = 9002
    base_us = int(df0.loc[70, "ts"].value // 1000)
    df0.loc[70:89, "ts"] = pd.to_datetime(
        base_us + np.arange(20) * 1000 * US, unit="us"  # 1000 s apart < gap
    )
    tbl = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)
    out = (
        session_duration_hist(
            ray.data.from_arrow(tbl).repartition(6), gap_s=1800
        )
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    df = df0.copy()
    df["tsu"] = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)[
        "ts"
    ].cast(pa.int64()).to_numpy()
    exp: dict = {}
    for _, g in df.sort_values(["user_id", "tsu"]).groupby("user_id"):
        t = g["tsu"].to_numpy()
        brk = np.r_[True, (t[1:] - t[:-1]) > 1800 * US]
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            seg = t[sid == s]
            d = int(seg.max() - seg.min())
            b = d.bit_length() if d > 0 else 0
            exp[b] = exp.get(b, 0) + 1
    assert len(out) == len(exp)
    for b, c in exp.items():
        assert out.loc[b, "n_sessions"] == c
    assert 0 in exp and exp[0] >= 1  # the planted zero-duration session


def test_minmax_scale_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.relational import minmax_scale_per_source

    tbl = _events_table(seed=353)
    df0 = tbl.to_pandas()
    # plant a constant-value source: max == min -> all its rows filtered
    df0.loc[100:140, "event_type"] = "const"
    df0.loc[100:140, "value"] = 3.5
    tbl = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)
    out = (
        minmax_scale_per_source(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = df0.copy()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    g = df.groupby("event_type")["c"]
    mn, mx = g.transform("min"), g.transform("max")
    keep = (mx > mn).to_numpy()
    assert len(out) == int(keep.sum())
    assert "const" not in set(out["source"])
    exp = (df["c"] - mn).to_numpy().astype(np.float64)[keep] / (
        (mx - mn).to_numpy().astype(np.float64)[keep]
    )
    got = out.loc[df.loc[keep, "event_id"].to_numpy(), "scaled"].to_numpy()
    assert (got.view(np.int64) == exp.view(np.int64)).all()
    assert got.min() >= 0.0 and got.max() <= 1.0
    # each non-degenerate source hits both endpoints exactly
    for src, sg in out.groupby("source"):
        assert sg["scaled"].min() == 0.0 and sg["scaled"].max() == 1.0


def test_active_days_hist_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import active_days_hist

    tbl = _events_table(seed=359)
    out = (
        active_days_hist(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("n_days")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    per_user = df.groupby("user_id")["day"].nunique()
    exp = per_user.value_counts().sort_index()
    assert len(out) == len(exp)
    for n_days, n_users in exp.items():
        assert out.loc[n_days, "n_users"] == n_users
    assert int(out["n_users"].sum()) == df["user_id"].nunique()


def test_hour_value_heatmap_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import hour_value_heatmap

    tbl = _events_table(seed=367)
    df0 = tbl.to_pandas()
    df0.loc[10, "value"] = 0.0  # exact-zero bucket
    df0.loc[11, "value"] = -5.0  # negative branch
    tbl = pa.Table.from_pandas(df0, preserve_index=False).cast(tbl.schema)
    out = (
        hour_value_heatmap(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["hour_of_day", "bucket"])
        .sort_index()
    )
    df = df0.copy()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["hour"] = (df["tsu"] // HOUR) % 24
    exp: dict = {}
    for h, c in zip(df["hour"], df["c"]):
        b = 0 if c == 0 else (int(c).bit_length() if c > 0 else -int(-c).bit_length())
        k = (int(h), b)
        exp[k] = exp.get(k, 0) + 1
    assert len(out) == len(exp)
    for k, n in exp.items():
        assert out.loc[k, "n_events"] == n
    assert (0 in [b for _, b in exp]) and any(b < 0 for _, b in exp)


def test_vocab_coverage_topk_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.pack import vocab_coverage_topk

    rng = np.random.default_rng(373)
    # zipf-ish token draws over a 40-token vocab, with planted boundary
    # ties: several tokens share the count at the k=10 cut
    toks = rng.zipf(1.3, 5000) % 40
    lists = np.array_split(toks.astype(np.int32), 300)
    tbl = pa.table(
        {"tokens": pa.array([x.tolist() for x in lists], pa.list_(pa.int32()))}
    )
    out = vocab_coverage_topk(
        ray.data.from_arrow(tbl).repartition(5), ks=(3, 10, 1000)
    ).to_pandas()
    counts = np.bincount(toks, minlength=40)
    order = np.lexsort((np.arange(40), -counts))
    cum = np.cumsum(counts[order])
    total = int(counts.sum())
    for i, k in enumerate((3, 10, 1000)):
        top = int(cum[min(k, len(cum)) - 1])
        assert out.loc[i, "k"] == k
        assert out.loc[i, "topk_occ"] == top
        assert out.loc[i, "total_occ"] == total
        exp = np.float64(np.int64(top)) / np.float64(np.int64(total))
        assert np.float64(out.loc[i, "coverage"]).view(np.int64) == exp.view(
            np.int64
        )
    # k beyond vocab covers everything
    assert out.loc[2, "coverage"] == 1.0


def test_nearest_event_join_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.relational import nearest_event_join

    rng = np.random.default_rng(379)
    n = 4000
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, DAY, n)
    types = np.where(rng.random(n) < 0.4, "purchase", "click")
    # planted equidistant tie: clicks at t-5s and t+5s around purchase
    ts[0], types[0] = base + 1000 * US, "purchase"
    ts[1], types[1] = base + 995 * US, "click"
    ts[2], types[2] = base + 1005 * US, "click"
    # planted equal-timestamp click group (min event_id must win)
    ts[10], types[10] = base + 7000 * US, "purchase"
    ts[11], types[11] = base + 7003 * US, "click"
    ts[12], types[12] = base + 7003 * US, "click"
    uid = rng.integers(0, 40, n).astype(np.int64)
    uid[:3] = 777
    uid[10:13] = 778
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(np.zeros(n), pa.float64()),
        }
    )
    out = (
        nearest_event_join(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    L = df[df.event_type == "purchase"]
    R = df[df.event_type == "click"]
    exp = {}
    for _, lr in L.iterrows():
        cands = R[R.user_id == lr.user_id].copy()
        if not len(cands):
            continue
        cands["d"] = cands["tsu"] - lr.tsu
        cands["a"] = cands["d"].abs()
        cands = cands[cands["a"] <= 600 * US]
        if not len(cands):
            continue
        best = cands.sort_values(["a", "tsu", "event_id"]).iloc[0]
        exp[int(lr.event_id)] = (int(best.event_id), int(best.d))
    assert len(out) == len(exp)
    for lid, (rid, d) in exp.items():
        assert out.loc[lid, "near_event_id"] == rid
        assert out.loc[lid, "delta_us"] == d
    # planted equidistant tie resolved to the EARLIER click (id 1)
    assert out.loc[0, "near_event_id"] == 1 and out.loc[0, "delta_us"] == -5 * US
    # planted equal-ts group resolved to the smaller event_id (11)
    assert out.loc[10, "near_event_id"] == 11 and out.loc[10, "delta_us"] == 3 * US
