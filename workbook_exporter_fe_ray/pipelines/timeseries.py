"""The flagship pipeline: tokenized sequences → tiered rollups + gap-fill
+ Gorilla chunks, written as partitioned, resumable Parquet with a
lineage manifest.

Partitioning: output partition id = ``crc32(source) % n_partitions``.
A partition is the unit of checkpointing (manifest) AND of write
atomicity (staging dir + rename), so a killed run resumes by skipping
done partitions and recomputing only the rest — the done-right version
of the reference's per-row "does this key already exist in the output
file" probe (``/root/reference/workbook_exporter-fe.py:1741-1754``).

Scale note: partitions are independent sub-pipelines, each a fully
parallel streaming Ray Data job, and they run CONCURRENTLY
(``concurrent_partitions`` driver threads — Ray Data executors
interleave on the shared cluster, so one partition's shuffle barrier
no longer idles the cluster). Reads are PRUNED per partition: a
one-time metadata pass maps each input file to the partitions its
sources hash into (one slim ``source``-column scan per file — a hive
layout would make this a directory listing, and datagen's shard-by-
source layout means most files belong to few partitions), so partition
p reads only files that contain at least one of its sources, instead
of re-scanning the whole input n_partitions times.
"""

from __future__ import annotations

import threading
import time
import zlib
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import DEFAULT_TIERS, US, TierSpec
from ..sources import read_points_input
from ..stages.compress import compress_chunks
from ..stages.gapfill import gapfill
from ..stages.points import derive_points
from ..stages.rollup import cascade_rollup, split_tiers
from ..state.checkpoint import (
    Manifest,
    PartitionRecord,
    atomic_dir_write,
    dataset_spill_bytes,
    fragment_row_ranges,
)


def source_partition(source: str, n_partitions: int) -> int:
    return zlib.crc32(source.encode("utf-8")) % n_partitions


def _stub_fsspec_http() -> None:
    """Ray Data's path resolution lazily imports
    ``fsspec.implementations.http`` on every read; in this environment
    that import always fails (no aiohttp), and under CONCURRENT driver
    threads the repeated failing import surfaces as an uncaught
    ``ImportError`` mid-read. Install a sentinel module once so the
    import succeeds and the isinstance check it feeds is simply False
    (local filesystems only — this environment has no network)."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: nothing is ever an instance
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _partition_mask_batch(
    batch: pa.Table, n_partitions: int, keep: frozenset[int]
) -> pa.Table:
    """Vectorized partition filter: crc32 over the (tiny) dictionary of
    distinct sources, broadcast through dictionary indices."""
    enc = pc.dictionary_encode(batch["source"]).combine_chunks()
    dict_parts = np.array(
        [source_partition(s, n_partitions) for s in enc.dictionary.to_pylist()],
        dtype=np.int64,
    )
    parts = dict_parts[enc.indices.to_numpy(zero_copy_only=False)]
    mask = np.isin(parts, list(keep))
    return batch.filter(pa.array(mask))


@dataclass
class TimeseriesJob:
    input_paths: list[str]
    out_dir: str
    tiers: tuple[TierSpec, ...] = DEFAULT_TIERS
    n_partitions: int = 8
    gapfill_strategy: str | None = "locf"
    chunk_s: int = 86_400
    value_col: str = "n_tok"
    input_kind: str = "sequences"  # "sequences" (doc_id/n_tok) | "points" (source/ts/value)
    now_us: int | None = None  # retention anchor; None → retention disabled
    compressor_concurrency: Any = None  # None -> task-based merge (autoscales); tuple -> actor pool
    concurrent_partitions: int = 4  # driver threads running partition sub-pipelines
    extra_metadata: dict[str, Any] = field(default_factory=dict)


def file_partition_map(
    paths: list[str], n_partitions: int
) -> dict[str, set[int]]:
    """One-time metadata pass: which checkpoint partitions does each
    input file contain sources for? Reads only the ``source`` column
    (dictionary-encoded — a sliver of the file); with a hive
    ``source_hash=<p>`` layout this would be a directory listing."""
    import pyarrow.parquet as pq

    out: dict[str, set[int]] = {}
    for p in paths:
        srcs = pc.unique(
            pq.read_table(p, columns=["source"])["source"]
        ).to_pylist()
        out[p] = {source_partition(s, n_partitions) for s in srcs}
    return out


def _load_points(
    job: TimeseriesJob, keep: frozenset[int], paths: list[str] | None = None
) -> ray.data.Dataset:
    paths = paths if paths else job.input_paths
    if job.input_kind == "sequences":
        ds = read_points_input(paths)
        ds = ds.map_batches(
            lambda b: _partition_mask_batch(b, job.n_partitions, keep),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return derive_points(ds)
    ds = ray.data.read_parquet(paths)
    return ds.map_batches(
        lambda b: _partition_mask_batch(b, job.n_partitions, keep),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _apply_retention(
    tier_ds: ray.data.Dataset, spec: TierSpec, now_us: int | None
) -> ray.data.Dataset:
    if now_us is None or spec.retention_s is None:
        return tier_ds
    cutoff = now_us - spec.retention_s * US

    def _f(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["bucket_ts"], pa.int64())
        return b.filter(pc.greater_equal(ts, cutoff))

    return tier_ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def run_timeseries(job: TimeseriesJob, partition_ids: list[int] | None = None) -> dict:
    """Run (or resume) the flagship pipeline. Returns manifest totals."""
    manifest = Manifest(
        job.out_dir,
        metadata={
            "engine": "workbook_exporter_fe_ray",
            "tiers": [t.name for t in job.tiers],
            "n_partitions": job.n_partitions,
            "value_col": job.value_col,
            "gapfill": job.gapfill_strategy,
            "chunk_s": job.chunk_s,
            **job.extra_metadata,
        },
    )
    todo = [
        p
        for p in (partition_ids if partition_ids is not None else range(job.n_partitions))
        if p not in manifest.done_partitions
    ]
    finest = job.tiers[0]
    fmap = file_partition_map(job.input_paths, job.n_partitions) if todo else {}
    manifest_lock = threading.Lock()

    def _run_partition(part: int) -> None:
        t0 = time.perf_counter()
        keep = frozenset([part])
        # pruned read: only files holding at least one of this
        # partition's sources (empty partition → one file, mask drops all)
        paths = [p for p in job.input_paths if part in fmap.get(p, set())]
        if not paths:
            paths = job.input_paths[:1]
        points = _load_points(job, keep, paths)
        rolled = cascade_rollup(points, job.tiers, job.value_col).materialize()
        spilled = dataset_spill_bytes(rolled)

        tier_rows: dict[str, int] = {}
        for name, tds in split_tiers(rolled, job.tiers).items():
            tds = _apply_retention(tds, next(t for t in job.tiers if t.name == name), job.now_us)
            final = f"{job.out_dir}/tiers/{name}/part-{part:05d}"
            with atomic_dir_write(final) as staging:
                tds = tds.materialize()
                tier_rows[name] = tds.count()
                spilled += dataset_spill_bytes(tds)
                tds.write_parquet(staging)

        if job.gapfill_strategy:
            filled = gapfill(
                ray.data.read_parquet(f"{job.out_dir}/tiers/{finest.name}/part-{part:05d}"),
                finest.bucket_s,
                strategy=job.gapfill_strategy,
            )
            final = f"{job.out_dir}/gapfill/{finest.name}/part-{part:05d}"
            with atomic_dir_write(final) as staging:
                filled.write_parquet(staging)

        chunks = compress_chunks(
            points,
            chunk_s=job.chunk_s,
            concurrency=job.compressor_concurrency,
            value_col=job.value_col if job.input_kind == "sequences" else "value",
        ).materialize()
        final = f"{job.out_dir}/chunks/part-{part:05d}"
        with atomic_dir_write(final) as staging:
            chunks.write_parquet(staging)

        stats = chunks.map_batches(
            lambda b: pa.table(
                {
                    "n": [int(pc.sum(b["n_points"]).as_py() or 0)],
                    "c": [len(b)],
                    "bts": [
                        sum(len(x) for x in b["ts_dod_bytes"].to_pylist())
                        + sum(len(x) for x in b["val_xor_bytes"].to_pylist())
                    ],
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()

        # a partition can legitimately own zero sources (hash gaps at
        # tiny source counts; pruned resumes): its stats frame is
        # column-less, and the record must still be written so the
        # resume skips it
        empty = "n" not in stats.columns
        n_points = 0 if empty else int(stats["n"].sum())
        n_chunks = 0 if empty else int(stats["c"].sum())
        n_bts = 0 if empty else int(stats["bts"].sum())
        spilled += dataset_spill_bytes(chunks)
        ranges = fragment_row_ranges(paths)
        wall = time.perf_counter() - t0
        with manifest_lock:
            manifest.mark_done(
                PartitionRecord(
                    partition_id=part,
                    input_fragments=paths,
                    input_row_ranges=ranges,
                    # footer-only row count of the fragments this
                    # partition read (no data scan)
                    rows_in=sum(r[2] for r in ranges if r[2] >= 0),
                    points=n_points,
                    tier_rows=tier_rows,
                    chunk_count=n_chunks,
                    compressed_bytes=n_bts,
                    raw_point_bytes=n_points * 16,  # int64 ts + float64 value
                    wall_s=wall,
                    points_per_s=(n_points / wall) if wall > 0 else 0.0,
                    spilled_bytes=spilled,
                )
            )

    width = max(1, min(job.concurrent_partitions, len(todo) or 1))
    if width > 1:
        _stub_fsspec_http()
    if width == 1:
        for part in todo:
            _run_partition(part)
    else:
        # K partition sub-pipelines in flight: Ray Data executors from
        # different driver threads interleave on the shared cluster, so
        # no single partition's shuffle barrier idles the CPUs
        with ThreadPoolExecutor(max_workers=width) as ex:
            for _ in ex.map(_run_partition, todo):
                pass
    return manifest.totals()
