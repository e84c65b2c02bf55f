"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and read zero-copy inside every task (never re-shipped
per batch); each batch computes a vectorized matmul and emits only its
local top-k candidates, so the global merge sorts k × num_blocks rows,
not the corpus.

Scale path: LSH-bucketed variant — random-hyperplane signatures route
vectors into buckets; only the query's bucket (and its hamming-1
neighbors) is scanned. Both deterministic (seeded).

All-pairs near-dup mining: :func:`cosine_neardup_pairs` is the EXACT
path (distributed block-pair triangle join — bounded per-task memory,
no whole-dataset materialization); :func:`cosine_neardup_lsh_pairs`
is the approximate scale path (hyperplane candidate buckets + exact
in-bucket verification).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
    ok_sigs = np.array(
        sorted({q_sig} | {q_sig ^ (1 << i) for i in range(n_planes)}), dtype=np.int64
    )
    planes_ref = ray.put(planes)

    class _BucketFilter:
        """Planes fetched from the object store ONCE per actor."""

        def __init__(self, ref):
            self.planes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, vec_col)
            sigs = ((m @ self.planes.T) > 0).astype(np.int64).dot(
                1 << np.arange(n_planes)
            )
            return batch.filter(pa.array(np.isin(sigs, ok_sigs)))

    bucketed = ds.map_batches(
        _BucketFilter,
        fn_constructor_args=(planes_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
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

    probe_arr = np.array(sorted(probe), dtype=np.int64)

    class _AssignFilter:
        """Centroids fetched from the object store ONCE per actor."""

        def __init__(self, ref):
            self.cents = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch, vec_col)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            a = np.argmax(mn @ self.cents.T, axis=1)
            return batch.filter(pa.array(np.isin(a, probe_arr)))

    bucketed = ds.map_batches(
        _AssignFilter,
        fn_constructor_args=(cents_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return topk_cosine(bucketed, query, k=k, vec_col=vec_col, id_col=id_col)


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> ray.data.Dataset:
    """EXACT embedding near-dup pairs (cosine ≥ threshold, id_a < id_b)
    via a distributed block-pair (triangle) join — no driver-side or
    whole-dataset materialization anywhere in the plan.

    Each vector is routed to ``n_blocks`` cells: vector in id-block g
    joins cells (i, g) for i ≤ g and (g, j) for j ≥ g, so every
    unordered block pair (i ≤ j) meets in exactly ONE cell and every
    candidate pair is scored exactly once. A cell task holds ≤
    2·N/n_blocks vectors (size ``n_blocks`` so that fits a worker
    heap) and scores its pair block with one matmul. Exchange cost is
    ``n_blocks`` copies of the vectors; compute is the true all-pairs
    O(N²/2) spread over ``n_blocks·(n_blocks+1)/2`` tasks — inherent
    to EXACT all-pairs. For corpora where exact is infeasible, use
    :func:`cosine_neardup_lsh_pairs` (candidate buckets + exact
    verify), which this function is the small-scale oracle for.
    """

    def _route(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        g = (ids % n_blocks).astype(np.int64)
        # cells (i, g) for i <= g and (g, j) for j > g → n_blocks cells/row
        cells = np.empty((n, n_blocks), dtype=np.int32)
        for k in range(n_blocks):
            i = np.minimum(g, k)
            j = np.maximum(g, k)
            cells[:, k] = (i * n_blocks + j).astype(np.int32)
        rep = np.repeat(np.arange(n), n_blocks)
        out = batch.select([id_col, vec_col]).take(pa.array(rep))
        return out.append_column("cell", pa.array(cells.reshape(-1)))

    routed = ds.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)

    def _cell_pairs(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        i, j = divmod(cell, n_blocks)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        m = _batch_matrix(group, vec_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        blk = ids % n_blocks
        ai_mask = blk == i
        bj_mask = blk == j
        ids_a, ids_b = ids[ai_mask], ids[bj_mask]
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        cos = m[ai_mask] @ m[bj_mask].T
        ra, rb = np.nonzero(cos >= threshold)
        ida, idb = ids_a[ra], ids_b[rb]
        if i == j:
            # both sides are the same block: (a,b) and (b,a) both appear
            keep = ida < idb
            lo, hi, cv = ida[keep], idb[keep], cos[ra, rb][keep]
        else:
            # cross-block: each unordered pair appears exactly once;
            # normalize output ordering to id_a < id_b
            lo = np.minimum(ida, idb)
            hi = np.maximum(ida, idb)
            cv = cos[ra, rb]
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(cv, pa.float64()),
            }
        )

    return routed.groupby("cell").map_groups(_cell_pairs, batch_format="pyarrow")


def cosine_neardup_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
    num_partitions: int = 64,
    max_bucket: int = 4096,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Approximate embedding near-dup pairs — the 100 TB path: random-
    hyperplane LSH candidate buckets + EXACT cosine verification within
    buckets, so precision is exact and only recall is probabilistic
    (P(miss) = (1 - p^n_bits)^n_tables with p = 1 - θ/π; at cosine
    0.95 and 8×8 the miss rate is ~1%).

    Shape: each vector is routed to ``n_tables`` buckets (signature =
    n_bits hyperplane signs per table); buckets are swept per coarse
    partition (``bucket % num_partitions`` → vectorized matmul per
    bucket run, no per-bucket UDF calls); duplicate pairs from
    different tables collapse in an associative Max groupby. Buckets
    larger than ``max_bucket`` (degenerate direction clusters) are
    skipped and COUNTED — the count is logged per sweep task (no
    silent caps). :func:`cosine_neardup_pairs` is the exact oracle at
    test scale.
    """
    from ray.data.aggregate import Max

    if dim is None:
        first = ds.select_columns([vec_col]).limit(1).take_all()
        dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_bits, dim))
    planes_ref = ray.put(planes)
    powers = (1 << np.arange(n_bits)).astype(np.int64)

    class _Route:
        def __init__(self, ref):
            self.planes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            m = _batch_matrix(batch, vec_col)
            bits = (m @ self.planes.T) > 0  # (n, n_tables*n_bits)
            bits = bits.reshape(n, n_tables, n_bits)
            buckets = bits.astype(np.int64) @ powers  # (n, n_tables)
            buckets += (np.arange(n_tables, dtype=np.int64) << np.int64(n_bits + 1))[
                None, :
            ] * (1 << 20)
            rep = np.repeat(np.arange(n), n_tables)
            out = batch.select([id_col, vec_col]).take(pa.array(rep))
            out = out.append_column("bucket", pa.array(buckets.reshape(-1)))
            part = (buckets.reshape(-1) % num_partitions).astype(np.int32)
            return out.append_column("__part", pa.array(part))

    routed = ds.map_batches(
        _Route,
        fn_constructor_args=(planes_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def _sweep(group: pa.Table) -> pa.Table:
        import logging

        order = pc.sort_indices(group, sort_keys=[("bucket", "ascending")])
        g = group.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        m = _batch_matrix(g, vec_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        skipped = 0
        for s, e in zip(starts, ends):
            sz = e - s
            if sz < 2:
                continue
            if sz > max_bucket:
                skipped += 1
                continue
            cos = m[s:e] @ m[s:e].T
            ra, rb = np.nonzero(cos >= threshold)
            ida, idb = ids[s:e][ra], ids[s:e][rb]
            keep = ida < idb
            out_a.append(ida[keep])
            out_b.append(idb[keep])
            out_c.append(cos[ra, rb][keep])
        if skipped:
            logging.getLogger(__name__).warning(
                "cosine_neardup_lsh_pairs: skipped %d oversized buckets "
                "(> %d vectors) in one partition sweep — raise max_bucket "
                "or n_bits if these hold real near-dups",
                skipped,
                max_bucket,
            )
        if out_a:
            aa, bb, cc = (
                np.concatenate(out_a),
                np.concatenate(out_b),
                np.concatenate(out_c),
            )
        else:
            aa = np.array([], np.int64)
            bb = np.array([], np.int64)
            cc = np.array([], np.float64)
        return pa.table(
            {
                "id_a": pa.array(aa, pa.int64()),
                "id_b": pa.array(bb, pa.int64()),
                "cosine": pa.array(cc, pa.float64()),
            }
        )

    pairs = routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")
    agg = pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine"))
    return agg.map_batches(
        lambda b: pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "cosine": b["max(cosine)"]}
        ),
        batch_format="pyarrow",
    )


def embedding_quant_stats(
    embs: ray.data.Dataset,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """Per-label embedding-distribution summary with EXACT integer
    arithmetic: components are quantized with ``floor(f8(x) * scale)``
    (floor is exact on IEEE doubles — no rounding-mode parity trap),
    then per-block int64 partial sums (n, Σq, Σq²) combine
    associatively into per-label first/second moments. The schema gate
    (min/max vector length per label) rides along, so a ragged column
    is caught in the same pass that profiles it. Map-side work is one
    zero-copy flatten + reshape per batch; the exchange carries one
    row per (label, block).

    Output: (label, n_vecs, dim_min, dim_max, sum_q, sum_q2) —
    all int64, hash-exact vs the list-comprehension SQL.
    """
    from ray.data.aggregate import Max, Min, Sum

    def _partial(b: pa.Table) -> pa.Table:
        arr = b[vec_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * np.float64(scale)).astype(np.int64)
        if np.abs(q).max(initial=0) >= (1 << 31):
            raise ValueError(
                "embedding_quant_stats: |quantized component| >= 2**31 — "
                "Σq² headroom exhausted, lower the scale"
            )
        # per-row segment sums, then per-(label) block partials
        if len(q):
            # clip run starts into range (a trailing empty vector would
            # index past the end — the reduceat trap from ADVICE r3),
            # then zero the empty rows explicitly
            offs = np.minimum(np.r_[0, np.cumsum(lens)[:-1]], len(q) - 1)
            row_q = np.add.reduceat(q, offs)
            row_q2 = np.add.reduceat(q * q, offs)
            row_q[lens == 0] = 0
            row_q2[lens == 0] = 0
        else:
            row_q = np.zeros(len(b), np.int64)
            row_q2 = np.zeros(len(b), np.int64)
        t = pa.table(
            {
                "label": pc.cast(b[label_col], pa.int64()),
                "n_vecs": pa.array(np.ones(len(b), np.int64)),
                "dim_min": pa.array(lens.astype(np.int64)),
                "dim_max": pa.array(lens.astype(np.int64)),
                "sum_q": pa.array(row_q),
                "sum_q2": pa.array(row_q2),
            }
        )
        g = t.group_by("label").aggregate(
            [
                ("n_vecs", "sum"),
                ("dim_min", "min"),
                ("dim_max", "max"),
                ("sum_q", "sum"),
                ("sum_q2", "sum"),
            ]
        )
        return g.rename_columns(
            ["label", "n_vecs", "dim_min", "dim_max", "sum_q", "sum_q2"]
        )

    agg = (
        embs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Sum("n_vecs"), Min("dim_min"), Max("dim_max"), Sum("sum_q"), Sum("sum_q2")
        )
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(b["label"], pa.int64()),
                "n_vecs": pc.cast(b["sum(n_vecs)"], pa.int64()),
                "dim_min": pc.cast(b["min(dim_min)"], pa.int64()),
                "dim_max": pc.cast(b["max(dim_max)"], pa.int64()),
                "sum_q": pc.cast(b["sum(sum_q)"], pa.int64()),
                "sum_q2": pc.cast(b["sum(sum_q2)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def label_centroid_sums(
    embs: ray.data.Dataset,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """Per-label, per-dimension centroid NUMERATORS over the embedding
    column — the single k-means/cluster-profile step expressed as an
    exact columnar reduction: components floor-quantize to int64
    (:func:`embedding_quant_stats`'s parity-safe trick) and each
    block contributes a (labels × dims) partial-sum tablet, so the
    exchange is label·dim-bounded regardless of corpus size.  The
    caller divides sum_q/n for the centroid — shipping the exact
    ints keeps the driver hash deterministic.

    Output: (label, dim, n_vecs, sum_q) — one row per (label,
    dimension); ragged vectors contribute to the dims they have.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        arr = b[vec_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * np.float64(scale)).astype(np.int64)
        labels = pc.cast(b[label_col], pa.int64()).to_numpy(zero_copy_only=False)
        lab_rep = np.repeat(labels, lens)
        # dimension index within each vector
        offs = np.r_[0, np.cumsum(lens)[:-1]]
        dim_idx = np.arange(len(q), dtype=np.int64) - np.repeat(offs, lens)
        t = pa.table(
            {
                "label": pa.array(lab_rep),
                "dim": pa.array(dim_idx),
                "n_vecs": pa.array(np.ones(len(q), np.int64)),
                "sum_q": pa.array(q),
            }
        )
        g = t.group_by(["label", "dim"]).aggregate(
            [("n_vecs", "sum"), ("sum_q", "sum")]
        )
        return g.rename_columns(["label", "dim", "n_vecs", "sum_q"])

    agg = (
        embs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(Sum("n_vecs"), Sum("sum_q"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(b["label"], pa.int64()),
                "dim": pc.cast(b["dim"], pa.int64()),
                "n_vecs": pc.cast(b["sum(n_vecs)"], pa.int64()),
                "sum_q": pc.cast(b["sum(sum_q)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def emb_argmax_hist(
    embs: ray.data.Dataset,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Dominant-dimension histogram: for every vector the index of its
    maximum component (first index on ties — np.argmax semantics),
    counted per (label, dim).  A dead-cheap "is this embedding space
    collapsed onto a few axes" diagnostic run before spending on ANN
    index builds; purely comparisons, so it is hash-exact against the
    ``list_position(v, list_max(v))`` SQL with no float-arithmetic
    parity risk.

    Vectorized segmented argmax over the ragged list column: per-block
    flatten once, np.maximum.reduceat for each vector's max, then the
    FIRST flat position equal to it via a masked np.minimum.reduceat —
    no per-row loop.  Each block emits a (labels × dims)-bounded
    partial-count tablet so the exchange is tiny regardless of corpus
    size.  Zero-length vectors are skipped on both sides.

    Output: (label, dim, n_vecs).
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        arr = b[vec_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        labels = pc.cast(b[label_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = lens > 0
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0 or not keep.any():
            return empty
        # offsets into flat for the kept (non-empty) vectors only
        offs_all = np.r_[np.int64(0), np.cumsum(lens)]
        starts = offs_all[:-1][keep]
        klens = lens[keep]
        segmax = np.maximum.reduceat(flat, starts)
        pos = np.arange(len(flat), dtype=np.int64)
        hit = flat == np.repeat(segmax, klens)
        # first hit per segment: min position among hits (BIG elsewhere)
        BIG = np.int64(len(flat))
        masked = np.where(hit, pos, BIG)
        # masked positions outside kept segments don't matter: reduceat
        # ranges are exactly the kept segments' [start, start+len) spans
        # only when segments are contiguous — they are not (skipped
        # empties contribute no flat values, so kept segments ARE
        # contiguous in flat)
        first = np.minimum.reduceat(masked, starts)
        dim = first - starts
        t = pa.table(
            {
                "label": pa.array(labels[keep]),
                "dim": pa.array(dim),
                "n_vecs": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        g = t.group_by(["label", "dim"]).aggregate([("n_vecs", "sum")])
        return g.rename_columns(["label", "dim", "n_vecs"])

    agg = (
        embs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(Sum("n_vecs"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(b["label"], pa.int64()),
                "dim": pc.cast(b["dim"], pa.int64()),
                "n_vecs": pc.cast(b["sum(n_vecs)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def embedding_gram_matrix(
    embs: ray.data.Dataset,
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """Distributed Gram matrix XᵀX over the embedding column — the
    one-pass building block for PCA / covariance / whitening over a
    100 TB embedding corpus (d×d fits anywhere; the DATA never needs
    to be co-located, only the d² partials move).

    Components quantized ``floor(f8(x) · scale)`` (exact on IEEE
    doubles — :func:`embedding_quant_stats`'s parity-safe idiom) →
    per-block int64 matmul QᵀQ (d×d, tiny) → upper-triangle (i, j,
    partial) rows → ONE d²-sized groupby-sum exchange. Hash-exact vs
    the unnest-ordinality self-join SQL.

    Headroom: per block, ``rows × max|q|² < 2⁶³`` is guarded loudly;
    for the full corpus the combine stays exact while ``n_total ×
    max|q|² < 2⁶³`` — at larger corpora lower ``scale`` (the oracle
    scales with it).

    Output: (i, j, gram_units) int64, i ≤ j, d(d+1)/2 rows.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        arr = b[vec_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "gram_units": pa.array([], pa.int64()),
                }
            )
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("embedding_gram_matrix: ragged embedding column")
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        flat = arr.values.to_numpy(zero_copy_only=False)
        # rebase: flatten()/values of a sliced ListArray (offsets[0]!=0)
        X = flat[offs[0] : offs[0] + len(lens) * d].astype(np.float64)
        Q = np.floor(X * np.float64(scale)).astype(np.int64).reshape(-1, d)
        mq = int(np.abs(Q).max(initial=0))
        if mq and len(Q) * mq * mq >= (1 << 63):
            raise ValueError(
                "embedding_gram_matrix: block rows × max|q|² exceeds int64 "
                "headroom — lower the scale"
            )
        G = Q.T @ Q
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "gram_units": pa.array(G[iu, ju]),
            }
        )

    agg = (
        embs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("gram_units"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "i": pc.cast(b["i"], pa.int64()),
                "j": pc.cast(b["j"], pa.int64()),
                "gram_units": pc.cast(b["sum(gram_units)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def kmeans_assign_exact(
    embs: ray.data.Dataset,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """One EXACT k-means E-step (Lloyd assignment) over the embedding
    corpus: every vector assigns to its nearest of the k seed
    centroids (the vectors with ``id < k`` — deterministic seeding) by
    quantized-int64 squared L2, ties to the smaller centroid id — so
    counts AND inertia are bit-reproducible and SQL-mirrorable, which
    float distance never is.

    Centroids are a k×d int64 matrix fetched by a streaming filter
    (k rows collected, never the corpus) and broadcast via ``ray.put``
    once; each block computes the full distance matrix as THREE int64
    matmuls (‖q‖² + ‖c‖² − 2 Q·Cᵀ — exact: |q| ≤ scale·‖x‖∞ keeps the
    products < 2⁶³ for any realistic scale), argmins row-wise, and
    emits a k-cell (centroid, n, inertia) partial.  ONE k-sized
    exchange.  The M-step (centroid update) is
    :func:`label_centroid_sums` over these assignments — together one
    full distributed Lloyd iteration.

    Output: (centroid_id, n_assigned, inertia_units) — int64.
    """
    import ray

    from ray.data.aggregate import Sum

    def _quant(arr: pa.Array) -> np.ndarray:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return np.zeros((0, 0), np.int64)
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("kmeans_assign_exact: ragged embedding column")
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        flat = arr.values.to_numpy(zero_copy_only=False)
        X = flat[offs[0] : offs[0] + len(lens) * d].astype(np.float64)
        return np.floor(X * np.float64(scale)).astype(np.int64).reshape(-1, d)

    seeds = embs.map_batches(
        lambda b: b.filter(pc.less(b[id_col], k)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    seed_tbl = pa.concat_tables(ray.get(seeds.to_arrow_refs())).combine_chunks()
    order = pc.sort_indices(seed_tbl[id_col])
    seed_tbl = seed_tbl.take(order)
    C = _quant(seed_tbl[vec_col])
    c2 = (C * C).sum(axis=1)
    cref = ray.put((C, c2))

    class _Assign:
        def __init__(self, ref):
            self.C, self.c2 = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            Q = _quant(b[vec_col])
            if Q.shape[0] == 0:
                return pa.table(
                    {
                        "centroid_id": pa.array([], pa.int64()),
                        "n_assigned": pa.array([], pa.int64()),
                        "inertia_units": pa.array([], pa.int64()),
                    }
                )
            q2 = (Q * Q).sum(axis=1)
            D = q2[:, None] + self.c2[None, :] - 2 * (Q @ self.C.T)
            best = np.argmin(D, axis=1)  # first min -> smaller cid on tie
            d2 = D[np.arange(len(best)), best]
            t = pa.table(
                {
                    "centroid_id": pa.array(best.astype(np.int64)),
                    "n_assigned": pa.array(np.ones(len(best), np.int64)),
                    "inertia_units": pa.array(d2),
                }
            )
            g = t.group_by("centroid_id").aggregate(
                [("n_assigned", "sum"), ("inertia_units", "sum")]
            )
            return g.rename_columns(
                ["centroid_id", "n_assigned", "inertia_units"]
            )

    agg = (
        embs.map_batches(_Assign(cref), batch_format="pyarrow", concurrency=4)
        .groupby("centroid_id")
        .aggregate(Sum("n_assigned"), Sum("inertia_units"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "centroid_id": pc.cast(b["centroid_id"], pa.int64()),
                "n_assigned": pc.cast(b["sum(n_assigned)"], pa.int64()),
                "inertia_units": pc.cast(b["sum(inertia_units)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def pca_top_components(
    embs: ray.data.Dataset,
    n_components: int = 4,
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
) -> pa.Table:
    """Exact-gram PCA: eigendecompose the d×d matrix assembled from the
    DISTRIBUTED :func:`embedding_gram_matrix` partials (the corpus
    never co-locates; only d² int64 cells do) and report the top
    spectrum.  The eigensolve itself is a driver-side LAPACK call on a
    d×d matrix — microscopic next to the one-pass gram — so this stage
    is rows-only at the driver gate (float spectrum), with the exact
    int64 gram itself already hash-gated separately.

    Output: (component, eigenvalue, explained_share) — n_components
    rows, eigenvalue in descending order.
    """
    gram = embedding_gram_matrix(embs, vec_col=vec_col, scale=scale).to_pandas()
    d = int(gram["j"].max()) + 1
    G = np.zeros((d, d), np.float64)
    G[gram["i"], gram["j"]] = gram["gram_units"].to_numpy(np.float64)
    G = G + np.triu(G, 1).T
    w = np.linalg.eigvalsh(G)[::-1]
    tot = float(w.sum())
    kk = min(int(n_components), d)
    return pa.table(
        {
            "component": pa.array(np.arange(kk, dtype=np.int64)),
            "eigenvalue": pa.array(w[:kk] / (scale * scale), pa.float64()),
            "explained_share": pa.array(
                (w[:kk] / tot) if tot else np.zeros(kk), pa.float64()
            ),
        }
    )


def _quant_matrix(arr, scale: float, op: str) -> np.ndarray:
    """floor-quantized int64 (n, d) matrix from a list<float> column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.zeros((0, 0), np.int64)
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError(f"{op}: ragged embedding column")
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    flat = arr.values.to_numpy(zero_copy_only=False)
    X = flat[offs[0] : offs[0] + len(lens) * d].astype(np.float64)
    return np.floor(X * np.float64(scale)).astype(np.int64).reshape(-1, d)


def kmeans_update_exact(
    embs: ray.data.Dataset,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """The M-step completing :func:`kmeans_assign_exact`'s E-step into
    one full distributed Lloyd iteration: per (centroid, dimension),
    the exact int64 count and quantized coordinate sum of all vectors
    assigned to that centroid — divide sum_q/n driver-side for the new
    centroid; shipping the exact ints keeps the gate deterministic.

    Same execution shape as the E-step (seed broadcast, three int64
    matmuls per block) plus a k×d-cell partial per block — the
    exchange is centroid·dim-bounded regardless of corpus size.

    Output: (centroid_id, dim, n_vecs, sum_q) — int64, k·d rows.
    """
    import ray

    from ray.data.aggregate import Sum

    seeds = embs.map_batches(
        lambda b: b.filter(pc.less(b[id_col], k)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    seed_tbl = pa.concat_tables(ray.get(seeds.to_arrow_refs())).combine_chunks()
    seed_tbl = seed_tbl.take(pc.sort_indices(seed_tbl[id_col]))
    C = _quant_matrix(seed_tbl[vec_col], scale, "kmeans_update_exact")
    c2 = (C * C).sum(axis=1)
    cref = ray.put((C, c2))

    class _AssignSum:
        def __init__(self, ref):
            self.C, self.c2 = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            Q = _quant_matrix(b[vec_col], scale, "kmeans_update_exact")
            kk, d = self.C.shape
            if Q.shape[0] == 0:
                return pa.table(
                    {
                        "centroid_id": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "n_vecs": pa.array([], pa.int64()),
                        "sum_q": pa.array([], pa.int64()),
                    }
                )
            q2 = (Q * Q).sum(axis=1)
            D = q2[:, None] + self.c2[None, :] - 2 * (Q @ self.C.T)
            best = np.argmin(D, axis=1)
            S = np.zeros((kk, d), np.int64)
            np.add.at(S, best, Q)
            cnt = np.bincount(best, minlength=kk).astype(np.int64)
            cid = np.repeat(np.arange(kk, dtype=np.int64), d)
            return pa.table(
                {
                    "centroid_id": pa.array(cid),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), kk)),
                    "n_vecs": pa.array(np.repeat(cnt, d)),
                    "sum_q": pa.array(S.reshape(-1)),
                }
            )

    agg = (
        embs.map_batches(_AssignSum(cref), batch_format="pyarrow", concurrency=4)
        .groupby(["centroid_id", "dim"])
        .aggregate(Sum("n_vecs"), Sum("sum_q"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "centroid_id": pc.cast(b["centroid_id"], pa.int64()),
                "dim": pc.cast(b["dim"], pa.int64()),
                "n_vecs": pc.cast(b["sum(n_vecs)"], pa.int64()),
                "sum_q": pc.cast(b["sum(sum_q)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def embedding_norm_hist(
    embs: ray.data.Dataset,
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
) -> ray.data.Dataset:
    """Embedding-magnitude histogram — the norm-distribution screen run
    before cosine pipelines (zero/huge-norm vectors break them):
    power-of-two buckets of the EXACT quantized squared norm Σq²
    (int64; bucket = bit_length, frexp-free via pure int arithmetic in
    SQL and numpy alike).  Per-block bincount partials, domain-sized
    exchange.

    Output: (norm2_bucket, n_vecs) — bucket 0 is the all-zero vector.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        Q = _quant_matrix(b[vec_col], scale, "embedding_norm_hist")
        if Q.shape[0] == 0:
            return pa.table(
                {
                    "norm2_bucket": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        n2 = (Q * Q).sum(axis=1)
        _, expo = np.frexp(n2.astype(np.float64))
        bucket = np.where(n2 == 0, 0, expo).astype(np.int64)
        vals, cnts = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "norm2_bucket": pa.array(vals),
                "n_vecs": pa.array(cnts.astype(np.int64)),
            }
        )

    agg = (
        embs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("norm2_bucket")
        .aggregate(Sum("n_vecs"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "norm2_bucket": pc.cast(b["norm2_bucket"], pa.int64()),
                "n_vecs": pc.cast(b["sum(n_vecs)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def pq_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 16,
    train_sample: int = 4096,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Approximate top-k by PRODUCT QUANTIZATION with asymmetric
    distance (PQ-ADC, Jégou et al. 2011) — the memory-compression scale
    path for embedding search: each normalized vector collapses to
    ``n_sub`` uint8 codes (64-float → 8-byte at the defaults, 32×), so
    a 100 TB embedding corpus scans as ~3 TB of codes, and per-batch
    scoring is a table LOOKUP (gather + sum over the per-query
    subspace-distance LUT), not a matmul.

    Codebooks are one k-means per subspace, trained driver-side on a
    bounded id-sorted sample (block arrival order must not leak into
    centroids — same discipline as :func:`ivf_topk`), broadcast ONCE;
    encode + ADC scan happen in a single actor-pool pass so codes
    never ship anywhere at query time (a standing index would persist
    them — :func:`embedding_quant_stats` is the audit for that
    layout).  Deterministic: seeded init, fixed iterations, (dist, id)
    tie-break.  Exactness is NOT claimed — the recall-vs-exact pytest
    is the gate, matching the LSH/IVF convention.

    Output: (query_idx, vec_id, adc_dist, rank) — global top-k per
    query row by squared-L2 ADC distance over normalized vectors.
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qn = query / np.maximum(
        np.linalg.norm(query, axis=1, keepdims=True), 1e-12
    )

    sample_tbl = (
        ds.select_columns([id_col, vec_col])
        .limit(train_sample)
        .to_pandas()
        .sort_values(id_col, kind="stable")
    )
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    dim = sample.shape[1]
    if dim % n_sub:
        raise ValueError(f"pq_topk: dim {dim} not divisible by {n_sub}")
    d_sub = dim // n_sub
    rng = np.random.default_rng(seed)
    books = np.empty((n_sub, n_codes, d_sub), np.float64)
    for m in range(n_sub):
        sv = sample[:, m * d_sub : (m + 1) * d_sub]
        kk = min(n_codes, len(sv))
        cents = sv[rng.choice(len(sv), size=kk, replace=False)]
        for _ in range(kmeans_iters):
            d2 = (
                (sv * sv).sum(1)[:, None]
                - 2.0 * sv @ cents.T
                + (cents * cents).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                sel = assign == c
                if sel.any():
                    cents[c] = sv[sel].mean(axis=0)
        books[m, :kk] = cents
        if kk < n_codes:  # degenerate tiny corpus: repeat last centroid
            books[m, kk:] = cents[-1]

    # per-query subspace LUT: luts[q, m, c] = ||q_sub − centroid||²
    luts = np.empty((len(qn), n_sub, n_codes), np.float64)
    for m in range(n_sub):
        qs = qn[:, m * d_sub : (m + 1) * d_sub]
        diff = qs[:, None, :] - books[m][None, :, :]
        luts[:, m, :] = (diff * diff).sum(-1)
    state_ref = ray.put((books, luts))

    class _PQScan:
        def __init__(self, ref):
            self.books, self.luts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mtx = _batch_matrix(batch, vec_col)
            norms = np.linalg.norm(mtx, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mtx = mtx / norms
            n = len(mtx)
            nq = self.luts.shape[0]
            dist = np.zeros((n, nq), np.float64)
            for m in range(self.books.shape[0]):
                sv = mtx[:, m * d_sub : (m + 1) * d_sub]
                cb = self.books[m]
                d2 = (
                    (sv * sv).sum(1)[:, None]
                    - 2.0 * sv @ cb.T
                    + (cb * cb).sum(1)[None, :]
                )
                codes = np.argmin(d2, axis=1)  # encode this subspace
                dist += self.luts[:, m, codes].T  # ADC gather, all queries
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):
                dq = dist[:, qi]
                kk = min(k, n)
                # quantized distances tie OFTEN (same-code vectors are
                # ADC-identical), so local pruning must use the same
                # (dist, id) order as the global merge or the survivor
                # set depends on batch boundaries
                idx = np.lexsort((ids, dq))[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[idx].tolist())
                out_d.extend(dq[idx].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    id_col: pa.array(out_id, pa.int64()),
                    "adc_dist": pa.array(out_d, pa.float64()),
                }
            )

    candidates = ds.map_batches(
        _PQScan,
        fn_constructor_args=(state_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _merge(group: pa.Table) -> pa.Table:
        d = group["adc_dist"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:k]
        return pa.table(
            {
                "query_idx": group["query_idx"].take(pa.array(order)),
                id_col: pa.array(ids[order]),
                "adc_dist": pa.array(d[order]),
                "rank": pa.array(np.arange(len(order), dtype=np.int32)),
            }
        )

    return candidates.groupby("query_idx").map_groups(
        _merge, batch_format="pyarrow"
    )


def kmeans_lloyd_iters(
    embs: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float = 1_000_000.0,
) -> pa.Table:
    """FULL iterative Lloyd k-means over the embedding corpus — the
    multi-round distributed-ML loop (:func:`kmeans_assign_exact` /
    :func:`kmeans_update_exact` are its single E/M steps): ``iters``
    rounds of broadcast-centroids → per-block quantized-int64
    assignment (three int64 matmuls) → ONE (k×d)-cell exchange →
    driver-side centroid update.  Per round the corpus streams once
    and only k·d cells move; the driver state is k×d — the canonical
    iterative-algorithm shape on Ray Data (the Dataset is re-consumed
    per round; nothing corpus-sized ever materializes).

    Determinism: seeds are the vectors with ``id < k`` (sorted
    collect); every distance is exact int64; ties go to the smaller
    centroid id; updated centroids re-quantize to the int grid via one
    IEEE division + floor per coordinate (documented drift of < 1
    quantum per round — identical on every partitioning, which float
    accumulation never is).

    Output: (centroid_id, n_assigned, inertia_units) after the final
    round — k int64 rows, bit-stable across partitionings.
    """
    from ray.data.aggregate import Sum

    seeds = embs.map_batches(
        lambda b: b.filter(pc.less(b[id_col], k)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    seed_parts = [t for t in ray.get(seeds.to_arrow_refs()) if len(t)]
    n_seeds = sum(len(t) for t in seed_parts)
    if n_seeds != k:
        raise ValueError(
            f"kmeans_lloyd_iters seeds from rows with {id_col} < k={k} "
            f"but the corpus holds {n_seeds} such rows — the id column "
            "must cover 0..k-1 exactly (re-key the corpus or pass "
            "explicit seed ids)"
        )
    seed_tbl = pa.concat_tables(seed_parts).combine_chunks()
    seed_tbl = seed_tbl.take(pc.sort_indices(seed_tbl[id_col]))
    C = _quant_matrix(seed_tbl[vec_col], scale, "kmeans_lloyd_iters")

    def _round(C_now: np.ndarray, final: bool):
        c2 = (C_now * C_now).sum(axis=1)
        cref = ray.put((C_now, c2))

        class _EM:
            def __init__(self, ref):
                self.C, self.c2 = ray.get(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                Q = _quant_matrix(b[vec_col], scale, "kmeans_lloyd_iters")
                q2 = (Q * Q).sum(axis=1)
                d2 = q2[:, None] - 2 * (Q @ self.C.T) + self.c2[None, :]
                assign = np.argmin(d2, axis=1).astype(np.int64)
                if final:
                    inert = d2[np.arange(len(Q)), assign]
                    t = pa.table(
                        {
                            "centroid_id": pa.array(assign),
                            "n": pa.array(np.ones(len(Q), np.int64)),
                            "inertia": pa.array(inert),
                        }
                    )
                    g = t.group_by("centroid_id").aggregate(
                        [("n", "sum"), ("inertia", "sum")]
                    )
                    return g.rename_columns(["centroid_id", "n", "inertia"])
                kk, d = self.C.shape
                cnt = np.bincount(assign, minlength=kk).astype(np.int64)
                sums = np.zeros((kk, d), np.int64)
                np.add.at(sums, assign, Q)
                cid = np.repeat(np.arange(kk, dtype=np.int64), d)
                return pa.table(
                    {
                        "centroid_id": cid,
                        "dim": pa.array(
                            np.tile(np.arange(d, dtype=np.int64), kk)
                        ),
                        "n": pa.array(np.repeat(cnt, d)),
                        "sum_q": pa.array(sums.reshape(-1)),
                    }
                )

        if final:
            agg = (
                embs.map_batches(
                    _EM,
                    fn_constructor_args=(cref,),
                    batch_format="pyarrow",
                    concurrency=(1, 4),
                )
                .groupby("centroid_id")
                .aggregate(Sum("n"), Sum("inertia"))
                .to_arrow_refs()
            )
            tabs = [t for t in (ray.get(r) for r in agg) if len(t)]
            tbl = pa.concat_tables(tabs)
            order = pc.sort_indices(tbl["centroid_id"])
            tbl = tbl.take(order)
            return pa.table(
                {
                    "centroid_id": pc.cast(tbl["centroid_id"], pa.int64()),
                    "n_assigned": pc.cast(tbl["sum(n)"], pa.int64()),
                    "inertia_units": pc.cast(tbl["sum(inertia)"], pa.int64()),
                }
            )
        agg = (
            embs.map_batches(
                _EM,
                fn_constructor_args=(cref,),
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .groupby(["centroid_id", "dim"])
            .aggregate(Sum("n"), Sum("sum_q"))
            .to_arrow_refs()
        )
        tabs = [t for t in (ray.get(r) for r in agg) if len(t)]
        tbl = pa.concat_tables(tabs)
        kk, d = C_now.shape
        cid = pc.cast(tbl["centroid_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dim = pc.cast(tbl["dim"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(tbl["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        sq = pc.cast(tbl["sum(sum_q)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        C_next = C_now.copy()  # empty centroids keep their position
        nz = n > 0
        # one IEEE division + floor per coordinate — deterministic
        C_next[cid[nz], dim[nz]] = np.floor(
            sq[nz].astype(np.float64) / n[nz].astype(np.float64)
        ).astype(np.int64)
        return C_next

    for _ in range(max(iters - 1, 0)):
        C = _round(C, final=False)
    return _round(C, final=True)
