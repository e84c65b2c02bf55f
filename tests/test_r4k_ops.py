"""Round-4k operators: type trigrams, windowed stream dedup, session
paths, k-means M-step — vs brute-force references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.similarity import kmeans_update_exact
from workbook_exporter_fe_ray.stages.window import (
    near_duplicate_events,
    session_path_counts,
    type_trigram_counts,
)

US = 1_000_000
HOUR = 3_600 * US


def _events(n=2500, seed=13) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 2 * 86_400 * US, n)
    vals = np.round(rng.normal(0, 50, n), 2)
    # planted double-fire: same user/type/value 10 s apart, and an
    # equal-ts twin
    ts[40], ts[41] = ts[39] + 10 * US, ts[39]
    vals[39:42] = 7.77
    uid = rng.integers(0, 30, n).astype(np.int64)
    uid[40] = uid[41] = uid[39]
    types = np.array([f"t{k}" for k in rng.integers(0, 4, n)])
    types[40] = types[41] = types[39]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )


def _ordered(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["user_id", "tsu", "event_id"], kind="stable")


def test_type_trigram_vs_brute(ray_session):
    tbl = _events()
    out = (
        type_trigram_counts(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["t1", "t2", "t3"])["n_trigrams"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    exp: dict = {}
    for _, g in _ordered(df).groupby("user_id"):
        t = g["event_type"].tolist()
        for i in range(len(t) - 2):
            exp[(t[i], t[i + 1], t[i + 2])] = (
                exp.get((t[i], t[i + 1], t[i + 2]), 0) + 1
            )
    assert dict(out) == dict(sorted(exp.items()))


def test_near_duplicate_events_vs_brute(ray_session):
    tbl = _events()
    out = (
        near_duplicate_events(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    df["c"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    dups = {}
    tot = df["event_type"].value_counts()
    for (_, src, _), g in df.sort_values(
        ["tsu", "event_id"], kind="stable"
    ).groupby(["user_id", "event_type", "c"]):
        t = g["tsu"].to_numpy()
        dups[src] = dups.get(src, 0) + int(((t[1:] - t[:-1]) <= HOUR).sum())
    for src in tot.index:
        assert out.loc[src, "n_events"] == tot[src]
        assert out.loc[src, "n_near_dups"] == dups.get(src, 0)
    # the planted pair contributes 2 dups (equal-ts twin + 10s retry)
    assert out["n_near_dups"].sum() >= 2


def test_session_path_vs_brute(ray_session):
    tbl = _events(seed=99)
    out = (
        session_path_counts(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("path")["n_sessions"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    exp: dict = {}
    for _, g in _ordered(df).groupby("user_id"):
        t = g["tsu"].to_numpy()
        et = g["event_type"].tolist()
        brk = np.r_[True, (t[1:] - t[:-1]) > 1_800 * US]
        sid = np.cumsum(brk) - 1
        for s in range(sid[-1] + 1):
            toks = [et[i] for i in np.flatnonzero(sid == s)[:3]]
            p = ">".join(toks)
            exp[p] = exp.get(p, 0) + 1
    assert dict(out) == dict(sorted(exp.items()))


def test_kmeans_update_vs_brute(ray_session):
    rng = np.random.default_rng(55)
    n, d, k = 300, 10, 5
    X = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    out = (
        kmeans_update_exact(ray.data.from_arrow(tbl).repartition(6), k=k)
        .to_pandas()
        .set_index(["centroid_id", "dim"])
        .sort_index()
    )
    Q = np.floor(X.astype(np.float64) * 1e6).astype(np.int64)
    C = Q[:k]
    D = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = np.argmin(D, axis=1)
    for c in range(k):
        m = best == c
        for dim in range(d):
            r = out.loc[(c, dim)]
            assert r["n_vecs"] == int(m.sum())
            assert r["sum_q"] == int(Q[m, dim].sum())
