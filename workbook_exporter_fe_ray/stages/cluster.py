"""Connected components over the near-duplicate pair graph.

Dedup pipelines need more than pairs: a document can be a near-dup of
B which is a near-dup of C without A~C passing the threshold, and the
keep-one-per-group policy must treat {A, B, C} as ONE cluster.  This
stage turns a pair stream (from any of the miners in
``stages/dedup.py``) into a per-document cluster representative — the
minimum ``doc_id`` reachable through the pair graph — via distributed
min-label propagation:

1. The iteration state is ``labels(node, label)`` over ONLY the nodes
   that appear in a pair (the dup subgraph — orders of magnitude
   smaller than the corpus; singletons never enter the loop).
2. Each round co-partitions edges and labels on ``hash(src) % P`` (the
   ``stages/sweep.py`` coarse-partition idiom — P vectorized group
   calls, never one call per node), emits ``(dst, label[src])``
   messages with one ``searchsorted`` per partition, then folds
   messages ∪ labels with an associative ``groupby(node).min(label)``.
3. Labels only ever decrease, so ``Σ label`` is strictly decreasing
   until the fixpoint — convergence is detected by an exact driver-side
   Python-int sum of tiny per-block partials (no join against the
   previous state).  Rounds needed = graph diameter; near-dup clusters
   are shallow (pairs are mined per shared content, diameters of 2-4),
   and ``max_iters`` caps pathological chains with a loud error rather
   than a silent wrong answer.
4. The converged dup-subgraph labels are broadcast (``ray.put`` once)
   and the full corpus streams through a map that coalesces
   ``cluster_rep = label if node in dup-subgraph else doc_id`` — the
   corpus itself never shuffles.

Partitioning assumptions (per the brief): one coarse partition of the
EDGE set fits a worker heap (raise ``num_partitions`` with corpus
size; the shuffle cost is the same rows either way), and the converged
dup-node label table fits the object store for the final broadcast —
swap step 4 for ``hash_bucket_join`` when the dup rate makes it
fact-sized.

Reference parity: the reference's dedup is a per-row O(output) re-read
(`workbook_exporter-fe.py:1741-1754`, `ip_exists_in_yaml`) with no
transitive grouping; this is the beyond-reference scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _label_sum(labels: ray.data.Dataset) -> int:
    """Exact Σ label as a Python int (overflow-proof convergence metric)."""

    def _partial(b: pa.Table) -> pa.Table:
        s = int(b["label"].to_numpy(zero_copy_only=False).astype(object).sum()) if len(b) else 0
        return pa.table({"s": pa.array([str(s)], pa.string())})

    # bounded: one decimal-string row per BLOCK (partial sums), not per label
    parts = labels.map_batches(_partial, batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts)


def propagate_min_labels(
    pairs: ray.data.Dataset,
    max_iters: int = 15,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Min-label propagation on an undirected pair graph.

    ``pairs`` must have int64 columns ``id_a``/``id_b``; returns the
    converged ``(node, label)`` dataset over nodes appearing in pairs.
    """
    from ray.data.aggregate import Min

    from .sweep import with_part

    def _sym(b: pa.Table) -> pa.Table:
        a = b["id_a"].combine_chunks() if isinstance(b["id_a"], pa.ChunkedArray) else b["id_a"]
        bb = b["id_b"].combine_chunks() if isinstance(b["id_b"], pa.ChunkedArray) else b["id_b"]
        return pa.table(
            {
                "src": pa.concat_arrays([a.cast(pa.int64()), bb.cast(pa.int64())]),
                "dst": pa.concat_arrays([bb.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    edges = pairs.map_batches(_sym, batch_format="pyarrow").map_batches(
        lambda b: with_part(b, ["src"], num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def _init(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["src"], "label": b["src"]})

    labels = (
        edges.map_batches(_init, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label"))
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda b: with_part(
                pa.table({"src": b["node"], "dst": b["label"]}), ["src"], num_partitions
            ).append_column("__tag", pa.array(np.ones(len(b), np.int8))),
            batch_format="pyarrow",
        )
        tagged_edges = edges.map_batches(
            lambda b: b.append_column("__tag", pa.array(np.zeros(len(b), np.int8))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def _emit(g: pa.Table) -> pa.Table:
            tag = g["__tag"].to_numpy(zero_copy_only=False)
            src = g["src"].to_numpy(zero_copy_only=False)
            dst = g["dst"].to_numpy(zero_copy_only=False)
            lmask = tag == 1
            nodes, lbls = src[lmask], dst[lmask]
            order = np.argsort(nodes, kind="stable")
            nodes, lbls = nodes[order], lbls[order]
            esrc, edst = src[~lmask], dst[~lmask]
            if len(nodes) == 0 or len(esrc) == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
                )
            pos = np.searchsorted(nodes, esrc)
            # every edge endpoint has a label by construction
            return pa.table(
                {
                    "node": pa.array(edst, pa.int64()),
                    "label": pa.array(lbls[pos], pa.int64()),
                }
            )

        msgs = (
            tagged_edges.union(tagged_labels).groupby("__part").map_groups(
                _emit, batch_format="pyarrow"
            )
        )
        labels_plain = labels  # self-labels survive the min fold
        labels = (
            msgs.union(labels_plain)
            .groupby("node")
            .aggregate(Min("label"))
            .map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"label propagation did not converge in {max_iters} rounds "
        "(pathological chain — raise max_iters)"
    )


def dup_clusters(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    max_iters: int = 15,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-document cluster representative: min doc_id reachable through
    the near-dup pair graph (self for singletons).

    Output: (doc_id, cluster_rep) — one row per input document.
    """
    labels = propagate_min_labels(
        pairs, max_iters=max_iters, num_partitions=num_partitions
    )
    ks, vs = [], []
    for b in labels.iter_batches(batch_size=None, batch_format="pyarrow"):
        ks.append(b["node"].to_numpy(zero_copy_only=False))
        vs.append(b["label"].to_numpy(zero_copy_only=False))
    nodes = np.concatenate(ks or [np.array([], np.int64)])
    lbls = np.concatenate(vs or [np.array([], np.int64)])
    order = np.argsort(nodes, kind="stable")
    ref = ray.put((nodes[order], lbls[order]))

    class _Attach:
        def __init__(self, ref):
            self.nodes, self.lbls = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            rep = ids.astype(np.int64, copy=True)
            if len(self.nodes):
                pos = np.searchsorted(self.nodes, ids)
                pos_c = np.minimum(pos, len(self.nodes) - 1)
                hit = self.nodes[pos_c] == ids
                rep[hit] = self.lbls[pos_c[hit]]
            return pa.table(
                {"doc_id": b[id_col], "cluster_rep": pa.array(rep, pa.int64())}
            )

    return docs.map_batches(
        _Attach,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
