"""Resumable packing job: tokenized sequences → fixed-length training
packs, written as partitioned Parquet with a lineage manifest.

Checkpoint unit = one order-preserving ``doc_id``-rank bucket: bucket
``k`` owns a contiguous slice of the global token stream, so its
interior packs are final the moment they are cut — independent of
every other bucket — and only its ≤2 boundary fragments wait for the
finalize step.  A killed run resumes by skipping done buckets; bucket
writes are atomic (staging dir + rename).

Lineage: the manifest records, once, the id range and the per-bucket
token counts (the global prefix-scan state) — a resume reuses them
instead of re-scanning, which also guarantees the resumed run cuts
packs at byte-identical positions even if the slim scan would now
plan different block boundaries.  Per bucket it records the input
fragments read, doc/token/pack counts, and wall time.

Scale shape: per-bucket reads are PRUNED by a one-time parquet
row-group-statistics pass (``file_rank_map`` — min/max ``doc_id``
per file, no data read), so bucket ``k`` reads only files overlapping
its rank range; with datagen's shard-by-source layout each file maps
to few buckets.  Buckets run concurrently on driver threads (same
pattern as ``run_timeseries``).

Reference parity: beyond-reference — the resumability model mirrors
the reference's intent (re-run skips already-exported rows,
``/root/reference/workbook_exporter-fe.py:1741-1754``) at partition
granularity instead of per-row probes.
"""

from __future__ import annotations

import glob
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


from ..stages.pack import cut_bucket_packs, doc_rank_batch, stitch_fragments
from ..state.checkpoint import (
    Manifest,
    PartitionRecord,
    atomic_dir_write,
    fragment_row_ranges,
)
from .timeseries import _stub_fsspec_http

FINALIZE_ID = -1  # manifest sentinel partition for the stitch step


@dataclass
class PackJob:
    input_paths: list[str]
    out_dir: str
    pack_len: int = 2048
    n_buckets: int = 32
    concurrent_buckets: int = 4
    extra_metadata: dict[str, Any] = field(default_factory=dict)


def file_rank_map(paths: list[str]) -> dict[str, tuple[int, int]]:
    """Per-file (min_rank, max_rank) from parquet row-group statistics
    on ``doc_id`` — a pure metadata read."""
    import pyarrow.parquet as pq

    def _rank(doc_id: str) -> int:
        t = pa.table({"doc_id": pa.array([doc_id])})
        return int(doc_rank_batch(t)["rank"][0].as_py())

    out: dict[str, tuple[int, int]] = {}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("doc_id")
        mins, maxs = [], []
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None or st.max is None:
                ok = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if not ok or not mins:
            # stats absent → one slim column scan for this file
            ids = pq.read_table(p, columns=["doc_id"])["doc_id"]
            mm = pc.min_max(ids)
            out[p] = (_rank(mm["min"].as_py()), _rank(mm["max"].as_py()))
        else:
            out[p] = (_rank(min(mins)), _rank(max(maxs)))
    return out


def _scan_state(job: PackJob) -> dict:
    """The global prefix-scan state: id range + per-bucket token sums,
    from one pass over the pruned (doc_id, n_tok) projection."""
    from ray.data.aggregate import Max, Min, Sum

    slim = ray.data.read_parquet(
        job.input_paths, columns=["doc_id", "n_tok"]
    ).map_batches(doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True)

    def _proj(b: pa.Table) -> pa.Table:
        # per-block partial id-dedup shrinks the exchange; cross-block
        # dups (byte-identical by contract) resolve in the bucket group
        t = pa.table(
            {
                "id": pc.cast(b["rank"], pa.int64()),
                "n": pc.cast(b["n_tok"], pa.int64()),
            }
        )
        ids = t["id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        keep = order[np.r_[True, ids[order][1:] != ids[order][:-1]]]
        return t.take(pa.array(np.sort(keep)))

    counts = slim.map_batches(_proj, batch_format="pyarrow").materialize()
    mm = counts.aggregate(Min("id"), Max("id"))
    lo_id, hi_id = int(mm["min(id)"]), int(mm["max(id)"])
    span = max(hi_id - lo_id + 1, 1)
    P = job.n_buckets

    def _bk(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bucket", pa.array((((ids - lo_id) * P) // span).astype(np.int32))
        )

    def _dedup_sum(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        keep = np.r_[True, ids[order][1:] != ids[order][:-1]]
        return pa.table(
            {
                "__bucket": g["__bucket"].slice(0, 1),
                "sum(n)": pa.array([int(n[order][keep].sum())], pa.int64()),
            }
        )

    sums = (
        counts.map_batches(_bk, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_dedup_sum, batch_format="pyarrow")
        .take_all()
    )
    per = [0] * P
    for r in sums:
        per[int(r["__bucket"])] = int(r["sum(n)"])
    return {"lo_id": lo_id, "hi_id": hi_id, "bucket_tokens": per}


def _bucket_id_range(lo_id: int, span: int, P: int, k: int) -> tuple[int, int]:
    """[first, last] id in bucket k (ids with ((id-lo)*P)//span == k)."""
    first = lo_id + (k * span + P - 1) // P
    last = lo_id + ((k + 1) * span + P - 1) // P - 1
    return first, last


def run_pack(job: PackJob, bucket_ids: list[int] | None = None) -> dict:
    """Run (or resume) the packing job. Returns manifest totals."""
    manifest = Manifest(
        job.out_dir,
        metadata={
            "engine": "workbook_exporter_fe_ray",
            "kind": "pack",
            "pack_len": job.pack_len,
            "n_buckets": job.n_buckets,
            **job.extra_metadata,
        },
    )
    if "scan_state" not in manifest.metadata:
        manifest.metadata["scan_state"] = _scan_state(job)
        manifest._flush()
    st = manifest.metadata["scan_state"]
    lo_id, hi_id = int(st["lo_id"]), int(st["hi_id"])
    span = max(hi_id - lo_id + 1, 1)
    per = np.asarray(st["bucket_tokens"], dtype=np.int64)
    P = job.n_buckets
    base = np.zeros(P, dtype=np.int64)
    base[1:] = np.cumsum(per)[:-1]

    todo = [
        k
        for k in (bucket_ids if bucket_ids is not None else range(P))
        if k not in manifest.done_partitions
    ]
    fmap = file_rank_map(job.input_paths) if todo else {}
    lock = threading.Lock()

    def _run_bucket(k: int) -> None:
        t0 = time.perf_counter()
        k_lo, k_hi = _bucket_id_range(lo_id, span, P, k)
        paths = [p for p, (a, b) in fmap.items() if a <= k_hi and b >= k_lo]
        if not paths:
            paths = job.input_paths[:1]

        def _filt(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["rank"], pa.int64())
            m = pc.and_(
                pc.greater_equal(ids, pa.scalar(k_lo)),
                pc.less_equal(ids, pa.scalar(k_hi)),
            )
            t = b.filter(m)
            return pa.table({"id": pc.cast(t["rank"], pa.int64()), "toks": t["tokens"]})

        ds = (
            ray.data.read_parquet(sorted(paths), columns=["doc_id", "tokens"])
            .map_batches(doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)
        )
        # one bucket = one group; repartition(1)+whole-block batch keeps
        # the cut a single vectorized call. ONE execution per bucket:
        # the cut result is fetched as Arrow refs (a bucket is the
        # checkpoint unit and is bounded by construction — the same
        # assumption repartition(1) already makes) and split/written
        # locally, instead of three more Dataset executions
        # (materialize + packs pass + frags pass, the r2 cold-start
        # cost).
        cut = ds.repartition(1).map_batches(
            lambda g: cut_bucket_packs(g, int(base[k]), job.pack_len, drop_dup_ids=True),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        import pyarrow.parquet as pq

        parts = [t for t in ray.get(cut.to_arrow_refs()) if len(t)]
        if parts:
            cut_tbl = pa.concat_tables(parts)
            complete = pc.equal(cut_tbl["complete"], True)
            t = cut_tbl.filter(complete)
            toks = t["toks"]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            packs_tbl = pa.table(
                {
                    "pack_id": t["pack_id"],
                    "tokens": pc.cast(toks, pa.list_(pa.int32())),
                    "n_spans": t["n_spans"],
                }
            )
            frags_tbl = cut_tbl.filter(pc.invert(complete))
        else:  # empty bucket (empty blocks can carry no schema)
            packs_tbl = pa.table(
                {
                    "pack_id": pa.array([], pa.int64()),
                    "tokens": pa.array([], pa.list_(pa.int32())),
                    "n_spans": pa.array([], pa.int64()),
                }
            )
            frags_tbl = packs_tbl.slice(0, 0)

        final = f"{job.out_dir}/buckets/part-{k:05d}"
        with atomic_dir_write(final) as staging:
            os.makedirs(f"{staging}/packs", exist_ok=True)
            os.makedirs(f"{staging}/frags", exist_ok=True)
            pq.write_table(packs_tbl, f"{staging}/packs/part-0.parquet")
            if len(frags_tbl):
                pq.write_table(frags_tbl, f"{staging}/frags/part-0.parquet")
            n_packs = len(packs_tbl)

        wall = time.perf_counter() - t0
        ranges = fragment_row_ranges(sorted(paths))
        with lock:
            manifest.mark_done(
                PartitionRecord(
                    partition_id=k,
                    input_fragments=sorted(paths),
                    input_row_ranges=ranges,
                    rows_in=sum(r[2] for r in ranges if r[2] >= 0),
                    points=int(per[k]),
                    tier_rows={"packs": n_packs},
                    wall_s=wall,
                    points_per_s=(int(per[k]) / wall) if wall > 0 else 0.0,
                )
            )

    width = max(1, min(job.concurrent_buckets, len(todo) or 1))
    if width > 1:
        _stub_fsspec_http()
    if width == 1:
        for k in todo:
            _run_bucket(k)
    else:
        with ThreadPoolExecutor(max_workers=width) as ex:
            list(ex.map(_run_bucket, todo))

    # finalize: stitch boundary fragments once every bucket is done
    all_done = manifest.done_partitions >= set(range(P))
    if all_done and FINALIZE_ID not in manifest.done_partitions:
        t0 = time.perf_counter()
        frag_files = sorted(glob.glob(f"{job.out_dir}/buckets/part-*/frags/*.parquet"))
        frows: list[dict] = []
        for f in frag_files:
            import pyarrow.parquet as pq

            t = pq.read_table(f)
            for i in range(len(t)):
                frows.append(
                    {
                        "pack_id": t["pack_id"][i].as_py(),
                        "pack_off": t["pack_off"][i].as_py(),
                        "toks": t["toks"][i].as_py(),
                        "n_spans": t["n_spans"][i].as_py(),
                    }
                )
        boundary = stitch_fragments(frows)
        final = f"{job.out_dir}/boundary"
        with atomic_dir_write(final) as staging:
            import pyarrow.parquet as pq

            pq.write_table(boundary, f"{staging}/packs.parquet")
        with lock:
            manifest.mark_done(
                PartitionRecord(
                    partition_id=FINALIZE_ID,
                    input_fragments=frag_files,
                    tier_rows={"boundary_packs": len(boundary)},
                    wall_s=time.perf_counter() - t0,
                )
            )
    return manifest.totals()


def read_packs(out_dir: str) -> ray.data.Dataset:
    """All packs of a completed run (interior ∪ boundary)."""
    paths = sorted(glob.glob(f"{out_dir}/buckets/part-*/packs/*.parquet"))
    paths += sorted(glob.glob(f"{out_dir}/boundary/*.parquet"))
    return ray.data.read_parquet(paths)
