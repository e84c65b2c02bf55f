"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and read zero-copy inside every task (never re-shipped
per batch); each batch computes a vectorized matmul and emits only its
local top-k candidates, so the global merge sorts k × num_blocks rows,
not the corpus.

Scale path: LSH-bucketed variant — random-hyperplane signatures route
vectors into buckets; only the query's bucket (and its hamming-1
neighbors) is scanned. Both deterministic (seeded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch)
    return flat.reshape(len(batch), dim)


class _TopKScorer:
    """Actor-pool stage: query matrix fetched from the object store once
    per actor (``__init__``), reused for every batch."""

    def __init__(self, query_ref, k: int, vec_col: str, id_col: str):
        self.q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (m / norms) @ self.qn.T  # (rows, n_queries)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_cos = [], [], []
        for qi in range(cos.shape[1]):
            c = cos[:, qi]
            k = min(self.k, len(c))
            # local top-k candidates only (global merge happens downstream)
            idx = np.argpartition(-c, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[idx].tolist())
            out_cos.extend(c[idx].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )


def topk_cosine(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Global top-k by cosine for each query row (query: (n_queries, dim)).

    Deterministic tie-break: (-cosine, id).
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    query_ref = ray.put(query)  # broadcast once, not per batch
    candidates = ds.map_batches(
        _TopKScorer,
        fn_constructor_args=(query_ref, k, vec_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _merge(group: pa.Table) -> pa.Table:
        cos = group["cosine"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "query_idx": group["query_idx"].take(pa.array(order)),
                id_col: pa.array(ids[order]),
                "cosine": pa.array(cos[order]),
                "rank": pa.array(np.arange(len(order), dtype=np.int32)),
            }
        )

    return candidates.groupby("query_idx").map_groups(_merge, batch_format="pyarrow")


def lsh_bucket_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane LSH prefilter, then exact
    cosine within the query's bucket and hamming-1 neighbor buckets."""
    query = np.asarray(query, dtype=np.float64).reshape(1, -1)
    dim = query.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q_sig = int(((query @ planes.T) > 0).astype(np.uint32)[0].dot(1 << np.arange(n_planes)))
    ok_sigs = {q_sig} | {q_sig ^ (1 << i) for i in range(n_planes)}
    planes_ref = ray.put(planes)

    def _filter(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        p = ray.get(planes_ref)
        sigs = ((m @ p.T) > 0).astype(np.uint32).dot(1 << np.arange(n_planes))
        mask = np.isin(sigs, list(ok_sigs))
        return batch.filter(pa.array(mask))

    bucketed = ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)
    return topk_cosine(bucketed, query, k=k, vec_col=vec_col, id_col=id_col)


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> ray.data.Dataset:
    """Approximate top-k via IVF (inverted-file) prefilter: k-means-lite
    centroids trained on a bounded sample (the standard IVF recipe — at
    100 TB you train on a sample too), then only vectors whose nearest
    centroid is among the query's ``nprobe`` closest lists are scored
    exactly. Deterministic: seeded init, fixed iteration count.

    The centroid matrix is broadcast once (``ray.put``) and read
    zero-copy in every assignment task."""
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))

    # --- train on a bounded sample (driver-side; sample is small by design).
    # Sorted by id: block arrival order is nondeterministic, and k-means
    # init indexes into the sample, so training must not depend on it.
    sample_tbl = (
        ds.select_columns([id_col, vec_col])
        .limit(train_sample)
        .to_pandas()
        .sort_values(id_col, kind="stable")
    )
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ cents.T, axis=1)  # cosine on normalized
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    cents_ref = ray.put(cents)

    qn = query / np.linalg.norm(query, axis=1, keepdims=True)
    probe = set(np.argsort(-(qn @ cents.T))[0][:nprobe].tolist())

    def _assign_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _batch_matrix(batch, vec_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        a = np.argmax(mn @ c.T, axis=1)
        return batch.filter(pa.array(np.isin(a, list(probe))))

    bucketed = ds.map_batches(_assign_filter, batch_format="pyarrow", zero_copy_batch=True)
    return topk_cosine(bucketed, query, k=k, vec_col=vec_col, id_col=id_col)


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Embedding near-dup pairs (cosine ≥ threshold, id_a < id_b).

    Small-corpus baseline: the corpus fits the object store, so each
    batch compares against the full broadcast matrix (ray.put once).
    At 100 TB you'd LSH-bucket first (see lsh_bucket_topk) and compare
    within buckets only.
    """
    tbl = ds.select_columns([id_col, vec_col]).materialize()
    full = tbl.to_pandas()
    ids_all = full[id_col].to_numpy()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids_all, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_a, mat_all = ray.get(mat_ref)
        m = _batch_matrix(batch, vec_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids_b = batch[id_col].to_numpy(zero_copy_only=False)
        cos = m @ mat_all.T
        bi, ai = np.nonzero(cos >= threshold)
        keep = ids_b[bi] < ids_a[ai]
        return pa.table(
            {
                "id_a": pa.array(ids_b[bi][keep], pa.int64()),
                "id_b": pa.array(ids_a[ai][keep], pa.int64()),
                "cosine": pa.array(cos[bi, ai][keep], pa.float64()),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow")
