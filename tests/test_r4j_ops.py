"""Round-4j ML-composition operators: exact k-means E-step, type
affinity matrix, gram-PCA spectrum — vs numpy/pandas brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.similarity import (
    kmeans_assign_exact,
    pca_top_components,
)
from workbook_exporter_fe_ray.stages.window import type_affinity_matrix


def _embs(n=400, d=12, seed=23) -> pa.Table:
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 0.25, (n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )


def test_kmeans_assign_vs_brute(ray_session):
    tbl = _embs()
    out = (
        kmeans_assign_exact(ray.data.from_arrow(tbl).repartition(5), k=6)
        .to_pandas()
        .set_index("centroid_id")
        .sort_index()
    )
    X = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Q = np.floor(X * 1e6).astype(np.int64)
    C = Q[:6]
    D = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = np.argmin(D, axis=1)
    d2 = D[np.arange(len(Q)), best]
    exp_n = pd.Series(best).value_counts().sort_index()
    assert list(out.index) == list(exp_n.index)
    assert list(out["n_assigned"]) == list(exp_n.values)
    for c in exp_n.index:
        assert out.loc[c, "inertia_units"] == int(d2[best == c].sum())
    # seeds assign to themselves with zero distance
    assert out["inertia_units"].sum() == int(d2.sum())


def test_type_affinity_vs_brute(ray_session):
    rng = np.random.default_rng(77)
    n = 5000
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 60, n).astype(np.int64)),
            "event_type": pa.array(
                [f"t{k}" for k in rng.integers(0, 5, n)], pa.string()
            ),
        }
    )
    out = (
        type_affinity_matrix(ray.data.from_arrow(tbl).repartition(7))
        .to_pandas()
        .set_index(["type_a", "type_b"])["affinity_units"]
        .sort_index()
    )
    df = tbl.to_pandas()
    cnt = df.groupby(["user_id", "event_type"]).size().unstack(fill_value=0)
    types = sorted(cnt.columns)
    exp = {}
    for i, a in enumerate(types):
        for b in types[i:]:
            exp[(a, b)] = int((cnt[a] * cnt[b]).sum())
    assert dict(out) == exp


def test_pca_top_components_vs_numpy(ray_session):
    tbl = _embs(seed=3)
    out = pca_top_components(
        ray.data.from_arrow(tbl).repartition(4), n_components=3
    ).to_pandas()
    X = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Q = np.floor(X * 1e6).astype(np.int64).astype(np.float64)
    w = np.linalg.eigvalsh(Q.T @ Q)[::-1]
    assert np.allclose(out["eigenvalue"], w[:3] / 1e12, rtol=1e-12)
    assert np.allclose(out["explained_share"], w[:3] / w.sum(), rtol=1e-12)
    assert (np.diff(out["eigenvalue"]) <= 0).all()
