"""Round-4i operators: conversion-latency histogram, winsorization
audit, posting-pair inverted index — vs brute-force references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.sketch import winsorized_stats
from workbook_exporter_fe_ray.stages.text import posting_pairs_top_tokens
from workbook_exporter_fe_ray.stages.window import conversion_latency_hist

US = 1_000_000


def _events(n=3000, seed=71) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 3 * 86_400 * US, n)
    types = np.array(["view", "purchase", "click"])[rng.integers(0, 3, n)]
    # planted: a purchase at EXACTLY its user's view ts (d == 0 bucket)
    ts[10] = ts[11]
    types[10], types[11] = "purchase", "view"
    uid = rng.integers(0, 25, n).astype(np.int64)
    uid[10] = uid[11]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(np.round(rng.normal(0, 500, n), 2), pa.float64()),
        }
    )


def test_conversion_latency_vs_brute(ray_session):
    tbl = _events()
    out = (
        conversion_latency_hist(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("latency_bucket")["n_conversions"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    buckets = []
    for _, g in df.groupby("user_id"):
        vts = np.sort(g.loc[g["event_type"] == "view", "tsu"].to_numpy())
        for t in g.loc[g["event_type"] == "purchase", "tsu"]:
            pos = np.searchsorted(vts, t, side="right") - 1
            if pos >= 0:
                d = (t - vts[pos]) // US
                buckets.append(0 if d == 0 else int(d).bit_length())
    exp = pd.Series(buckets).value_counts().sort_index()
    assert list(out.index) == list(exp.index)
    assert list(out.values) == list(exp.values)
    assert 0 in out.index  # the planted zero-latency conversion


def test_winsorized_stats_vs_brute(ray_session):
    tbl = _events(seed=5)
    out = winsorized_stats(
        ray.data.from_arrow(tbl).repartition(4)
    ).to_pandas().set_index("source")
    df = tbl.to_pandas()
    c = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    for src, g in pd.DataFrame(
        {"s": df["event_type"], "c": c}
    ).groupby("s"):
        v = np.sort(g["c"].to_numpy())
        n = len(v)
        lo = v[max((5 * n + 99) // 100 - 1, 0)]
        hi = v[max((95 * n + 99) // 100 - 1, 0)]
        r = out.loc[src]
        assert r["p_lo_cents"] == lo and r["p_hi_cents"] == hi
        assert r["n_clamped_lo"] == int((g["c"] < lo).sum())
        assert r["n_clamped_hi"] == int((g["c"] > hi).sum())
        assert r["sum_winsorized_cents"] == int(
            np.clip(g["c"].to_numpy(), lo, hi).sum()
        )
        assert r["n_events"] == n


def test_posting_pairs_vs_brute(ray_session):
    rng = np.random.default_rng(9)
    vocab = [f"w{k}" for k in range(30)]
    texts = [
        " ".join(vocab[k] for k in rng.zipf(1.6, 12) % 30) for _ in range(300)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = posting_pairs_top_tokens(
        ray.data.from_arrow(tbl).repartition(6), k=5
    ).to_pandas()
    got = set(zip(out["token"], out["doc_id"]))
    df_counts: dict[str, set] = {}
    for i, t in enumerate(texts):
        for tok in set(t.split(" ")):
            df_counts.setdefault(tok, set()).add(i)
    ranked = sorted(df_counts, key=lambda t: (-len(df_counts[t]), t))
    exp = {(t, d) for t in ranked[:5] for d in df_counts[t]}
    assert got == exp
