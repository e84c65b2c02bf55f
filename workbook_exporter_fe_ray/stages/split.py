"""Deterministic training-order and holdout assignment.

``epoch_shuffle`` gives every document a global *shuffle position* —
the training order of one epoch — as ``rank of md5(seed ':' doc_id)``.
Seeded, reproducible, and resumable: position is a pure function of
(seed, doc_id), so a restarted job re-derives the identical order.

Scale shape: the global rank is the same two-level ordered scan as the
packer (``stages/pack.py``) — md5 hex is uniform, so its first byte is
an order-preserving 256-way range bucket.  One pass computes the 256
bucket counts (tiny rows to the driver), the driver prefix-sums them,
and each bucket ranks only its own slice (sort + ``arange``).  The
exchange carries (id, 16-byte digest) rows, never documents.

``train_val_split`` assigns train/val/test by thresholding the same
digest — the standard leakage-proof holdout (assignment sticks to the
document forever, independent of corpus growth order).

Reference parity: beyond-reference (workbook_exporter-fe.py exports in
input order, 1741-1788); shuffle + split are the canonical last-mile
ops of a training-data pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _digest_batch(b: pa.Table, id_col: str, seed: int) -> pa.Table:
    # no vectorized md5 exists; the loop hashes ~30-byte strings (same
    # trade as doc_fingerprint, stages/text.py)
    ids = b[id_col].to_pylist()
    hx = [
        hashlib.md5(f"{seed}:{i}".encode("utf-8")).hexdigest() for i in ids
    ]
    return pa.table(
        {"id": pc.cast(b[id_col], pa.int64()), "hx": pa.array(hx, pa.string())}
    )


def epoch_shuffle(
    docs: ray.data.Dataset, seed: int = 0, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, shuffle_pos): 0-based global rank by (md5 hex, id)."""
    from ray.data.aggregate import Count

    digests = docs.map_batches(
        lambda b: _digest_batch(b, id_col, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _bucketed(b: pa.Table) -> pa.Table:
        bk = pc.cast(b["hx"], pa.string())
        first = pc.utf8_slice_codeunits(bk, 0, 2)
        return b.append_column("__bucket", first)

    bucketed = digests.map_batches(_bucketed, batch_format="pyarrow")
    # bounded: 256 two-hex-digit bucket counts
    sums = bucketed.groupby("__bucket").aggregate(Count()).take_all()
    per = {r["__bucket"]: int(r["count()"]) for r in sums}
    base: dict[str, int] = {}
    acc = 0
    for k in sorted(per):
        base[k] = acc
        acc += per[k]

    def _rank(g: pa.Table) -> pa.Table:
        bk = g["__bucket"][0].as_py()
        idx = pc.sort_indices(
            g, sort_keys=[("hx", "ascending"), ("id", "ascending")]
        )
        g = g.take(idx)
        pos = base[bk] + np.arange(len(g), dtype=np.int64)
        return pa.table(
            {"doc_id": g["id"], "shuffle_pos": pa.array(pos, pa.int64())}
        )

    return bucketed.groupby("__bucket").map_groups(_rank, batch_format="pyarrow")


def train_val_split(
    docs: ray.data.Dataset,
    seed: int = 0,
    id_col: str = "doc_id",
    group_col: str = "source",
    val_lt: str = "0d",
    test_lt: str = "1a",
) -> ray.data.Dataset:
    """Per-(group, split) doc counts with split = threshold on the md5
    hex prefix: ``hx < val_lt`` → val (~5%), ``< test_lt`` → test
    (~5%), else train. Pure map + associative count — no wide ops
    beyond the tiny grouped count."""
    from ray.data.aggregate import Count

    def _assign(b: pa.Table) -> pa.Table:
        d = _digest_batch(b, id_col, seed)
        hx = d["hx"]
        is_val = pc.less(hx, pa.scalar(val_lt))
        is_test = pc.and_not(pc.less(hx, pa.scalar(test_lt)), is_val)
        split = pc.if_else(
            is_val,
            pa.scalar("val"),
            pc.if_else(is_test, pa.scalar("test"), pa.scalar("train")),
        )
        return pa.table({"source": b[group_col], "split": split})

    agg = (
        docs.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "split"])
        .aggregate(Count())
    )

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "split": b["split"],
                "n_docs": pc.cast(b["count()"], pa.int64()),
            }
        )

    return agg.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
