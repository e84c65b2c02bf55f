"""Round-4c operators vs brute-force single-process references:
delta sign-flip oscillation profile and per-document type/token ratio."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from workbook_exporter_fe_ray.stages.text import type_token_ratio
from workbook_exporter_fe_ray.stages.window import delta_sign_flips

US = 1_000_000
DAY = 86_400 * US


def _events_table(n=6000, seed=17) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 3 * DAY, n)
    ts[100:120] = ts[99]  # ties pin the (ts, event_id) tie-break
    vals = np.round(rng.normal(50, 40, n), 2)
    vals[200:260] = vals[199]  # flat runs: zero deltas must break chains
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


def test_delta_sign_flips_vs_brute(ray_session):
    tbl = _events_table()
    out = (
        delta_sign_flips(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    df = df.sort_values(["event_type", "tsu", "event_id"])
    n_expected = 0
    for (src, day), g in df.groupby(["event_type", "day"]):
        if len(g) < 2:
            continue
        n_expected += 1
        s = np.sign(np.diff(g["c"].to_numpy()))
        flips = int(np.sum(s[1:] * s[:-1] < 0))
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_deltas"] == len(s)
        assert r["n_up"] == int((s > 0).sum())
        assert r["n_down"] == int((s < 0).sum())
        assert r["n_flat"] == int((s == 0).sum())
        assert r["n_flips"] == flips
    assert len(out) == n_expected


def test_delta_sign_flips_zero_breaks_chain(ray_session):
    # up, flat, down is NOT a flip (sign 0 in between); up, down, up is 2
    t0 = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(7, dtype=np.int64)),
            "user_id": pa.array([0] * 7, pa.int64()),
            "ts": pa.array(
                [t0 + i * US for i in range(7)], pa.timestamp("us")
            ),
            "event_type": pa.array(["a"] * 7),
            "value": pa.array([1.0, 2.0, 2.0, 1.0, 2.0, 1.0, 2.0]),
        }
    )
    out = delta_sign_flips(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # deltas: +, 0, -, +, -, + -> flips at (-,+), (+,-), (-,+) = 3
    assert (r.n_deltas, r.n_up, r.n_down, r.n_flat, r.n_flips) == (6, 3, 2, 1, 3)


def test_type_token_ratio_vs_brute(ray_session):
    docs = [
        "the cat sat on the mat",
        "a a a a",
        "",
        "one",
        "x y z x y z x",
        "dup  dup",  # double space -> empty token counts as a type
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs),
        }
    )
    out = (
        type_token_ratio(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, d in enumerate(docs):
        toks = d.split(" ")
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_types"] == len(set(toks))


def test_top_terms_per_source_vs_brute(ray_session):
    from collections import Counter

    from workbook_exporter_fe_ray.stages.text import top_terms_per_source

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    srcs, texts = [], []
    for i in range(200):
        srcs.append(f"s{i % 3}")
        texts.append(" ".join(rng.choice(vocab, rng.integers(1, 40))))
    tbl = pa.table({"doc_id": pa.array(np.arange(200, dtype=np.int64)),
                    "source": pa.array(srcs), "text": pa.array(texts)})
    out = top_terms_per_source(
        ray.data.from_arrow(tbl).repartition(5), k=4
    ).to_pandas()
    for s in ("s0", "s1", "s2"):
        cnt = Counter()
        for src, t in zip(srcs, texts):
            if src == s:
                cnt.update(t.split(" "))
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        got = out[out.source == s].sort_values("rank")
        assert list(zip(got.token, got.n)) == exp
        assert list(got["rank"]) == [1, 2, 3, 4]


def test_vocab_jaccard_sources_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.text import vocab_jaccard_sources

    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(40)]
    srcs, texts = [], []
    for i in range(150):
        srcs.append(f"s{i % 4}")
        texts.append(" ".join(rng.choice(vocab, rng.integers(1, 25))))
    tbl = pa.table({"doc_id": pa.array(np.arange(150, dtype=np.int64)),
                    "source": pa.array(srcs), "text": pa.array(texts)})
    out = (
        vocab_jaccard_sources(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    sets = {}
    for src, t in zip(srcs, texts):
        sets.setdefault(src, set()).update(t.split(" "))
    names = sorted(sets)
    n_pairs = 0
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            common = len(sets[a] & sets[b])
            if len(sets[a] | sets[b]) == 0:
                continue
            n_pairs += 1
            r = out.loc[(a, b)]
            assert r["n_common"] == common
            assert r["n_a"] == len(sets[a])
            assert r["n_b"] == len(sets[b])
            assert r["n_union"] == len(sets[a] | sets[b])
    assert len(out) == n_pairs


def test_tier_consistency_audit(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.pipelines.events import tier_consistency_audit

    rng = np.random.default_rng(9)
    n = 4000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 2 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 4, n)], pa.string()
            ),
            "value": pa.array(np.round(rng.normal(50, 40, n), 2), pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = tier_consistency_audit(str(tmp_path)).to_pandas()
    # a correct cascade agrees on every bucket, and per-source totals
    # match a brute-force hour rollup
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["h"] = tbl["ts"].cast(pa.int64()).to_numpy() // (3600 * US)
    exp = df.groupby("event_type").agg(
        n_buckets=("h", "nunique"), sum_cents=("c", "sum")
    )
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert r.n_agree == r.n_buckets == exp.loc[r.source, "n_buckets"]
        assert r.sum_cents == exp.loc[r.source, "sum_cents"]


def test_late_arrival_stats_vs_brute(ray_session):
    from workbook_exporter_fe_ray.stages.window import late_arrival_stats

    rng = np.random.default_rng(21)
    n = 5000
    base = 1_700_000_000 * US
    # arrival order (event_id) deliberately decoupled from ts so most
    # days contain genuine late arrivals
    tbl = pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 2 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 4, n)], pa.string()
            ),
            "value": pa.array(np.round(rng.normal(50, 40, n), 2)),
        }
    )
    out = (
        late_arrival_stats(ray.data.from_arrow(tbl).repartition(7))
        .to_pandas()
        .set_index(["source", "day"])
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["day"] = df["tsu"] - df["tsu"] % DAY
    df = df.sort_values(["event_type", "day", "event_id"])
    n_rows = 0
    any_late = False
    for (src, day), g in df.groupby(["event_type", "day"]):
        n_rows += 1
        tsu = g["tsu"].to_numpy()
        prevmax = np.maximum.accumulate(tsu)[:-1]
        late = prevmax > tsu[1:]
        any_late = any_late or late.any()
        r = out.loc[(src, pd.Timestamp(day, unit="us"))]
        assert r["n_events"] == len(g)
        assert r["n_late"] == int(late.sum())
        exp_max = int((prevmax - tsu[1:])[late].max()) if late.any() else 0
        assert r["max_lateness_us"] == exp_max
    assert len(out) == n_rows
    assert any_late  # the fixture must actually exercise the late path
