"""Round-4m operators: exact-integer rolling z-score outliers,
embedding norm histogram."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.similarity import embedding_norm_hist
from workbook_exporter_fe_ray.stages.window import rolling_zscore_outliers

US = 1_000_000
HOUR = 3_600 * US


def test_rolling_zscore_vs_brute(ray_session):
    rng = np.random.default_rng(17)
    n = 2000
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 12 * HOUR, n)
    vals = np.round(rng.normal(0, 10, n), 2)
    vals[500:520] = 400.0  # planted spikes -> guaranteed outliers
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 10, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"s{k}" for k in rng.integers(0, 3, n)], pa.string()
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )
    out = (
        rolling_zscore_outliers(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    for src, g in df.groupby("event_type"):
        t = g["tsu"].to_numpy()
        c = g["c"].to_numpy().astype(object)  # python ints: no overflow
        cnt = 0
        for i in range(len(g)):
            m = (t >= t[i] - HOUR) & (t <= t[i])
            nn, s, q = int(m.sum()), sum(c[m]), sum(x * x for x in c[m])
            if (int(c[i]) * nn - s) ** 2 > 9 * (nn * q - s * s):
                cnt += 1
        assert out.loc[src, "n_outliers"] == cnt, src
        assert out.loc[src, "n_events"] == len(g)
    assert out["n_outliers"].sum() > 0  # the planted spikes flag


def test_embedding_norm_hist_planted(ray_session):
    rng = np.random.default_rng(31)
    X = [np.zeros(8, np.float32)]  # zero vector -> bucket 0
    for scale in (0.001, 0.01, 0.1, 1.0):
        for _ in range(10):
            X.append((rng.normal(0, scale, 8)).astype(np.float32))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(X), np.int32)),
        }
    )
    out = (
        embedding_norm_hist(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .set_index("norm2_bucket")["n_vecs"]
        .sort_index()
    )
    Q = np.floor(np.stack(X).astype(np.float64) * 1e6).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)
    exp: dict = {}
    for v in n2:
        b = 0 if v == 0 else int(v).bit_length()
        exp[b] = exp.get(b, 0) + 1
    assert dict(out) == dict(sorted(exp.items()))
    assert 0 in out.index and out.sum() == len(X)
