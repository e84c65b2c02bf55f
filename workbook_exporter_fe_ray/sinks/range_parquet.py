"""Range-partitioned Parquet sink: globally ordered, manifest-pruned,
resumable output layout.

The brief's "resumable output" bullet, taken past directory-per-shard:
rows are routed by a sampled-boundary RANGE partition of a sort key, so

- each partition file covers a contiguous, manifest-recorded key range
  (``part=00042/data.parquet``, sorted within the file) — a reader
  seeking ``key ∈ [a, b)`` opens only the overlapping files;
- a killed job resumes by SKIPPING every partition whose ``.done``
  marker matches the partition's row count AND key range — only
  missing or drifted ranges rewrite;
- no single giant file: partition count is a parameter, boundaries
  derive from a bounded per-block key sample (never a global sort).

The reference's output is one YAML document rewritten whole
(``/root/reference/workbook_exporter-fe.py`` export path); this is the
100 TB-shaped equivalent of that full-rewrite semantic.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

_SAMPLE_PER_BLOCK = 256


def _boundaries_from_sample(
    ds: ray.data.Dataset, key_col: str, n_partitions: int
) -> np.ndarray:
    """Interior range boundaries from a bounded per-block key sample.

    Each block contributes ≤ _SAMPLE_PER_BLOCK equi-spaced keys of its
    own sorted key vector (a per-block quantile sketch), so the driver
    holds O(blocks · 256) values regardless of row count."""

    def _sample(b: pa.Table) -> pa.Table:
        k = np.sort(
            pc.cast(b[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        )
        if len(k) > _SAMPLE_PER_BLOCK:
            idx = np.linspace(0, len(k) - 1, _SAMPLE_PER_BLOCK).astype(
                np.int64
            )
            k = k[idx]
        return pa.table({"k": pa.array(k)})

    chunks = [
        t["k"].to_numpy(zero_copy_only=False)
        for t in ray.get(
            ds.map_batches(_sample, batch_format="pyarrow").to_arrow_refs()
        )
        if len(t)
    ]
    if not chunks:
        return np.array([], np.int64)
    sample = np.sort(np.concatenate(chunks))
    cuts = np.linspace(0, len(sample) - 1, n_partitions + 1)[1:-1]
    return np.unique(sample[cuts.astype(np.int64)])


def write_range_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    n_partitions: int = 16,
) -> dict:
    """Write ``ds`` as range-partitioned sorted Parquet under
    ``out_dir``; returns (and persists) the manifest.

    Existing partitions whose ``.done`` marker matches are SKIPPED —
    rerunning after a kill rewrites only missing ranges.  ``out_dir``
    must be storage every worker sees (one node: any dir; multi-node:
    the shared filesystem the job writes to anyway)."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = _boundaries_from_sample(ds, key_col, n_partitions)
    bounds_list = [int(x) for x in bounds]

    def _route(b: pa.Table) -> pa.Table:
        k = pc.cast(b[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, k, side="right").astype(np.int32)
        return b.append_column("__part", pa.array(part))

    def _content_hash(t: pa.Table) -> str:
        """blake2b of the sorted partition's IPC stream — pinned to a
        single combined chunk so identical content hashes identically
        regardless of upstream block layout."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)

        class _Sink:
            def write(self, data) -> int:
                h.update(data)
                return len(data)

            def close(self) -> None:
                pass

            @property
            def closed(self) -> bool:
                return False

        t = t.combine_chunks()
        with pa.ipc.new_stream(pa.PythonFile(_Sink(), mode="w"), t.schema) as w:
            w.write_table(t)
        return h.hexdigest()

    def _write_part(g: pa.Table) -> pa.Table:
        part = int(g["__part"][0].as_py())
        g = g.drop_columns(["__part"])
        idx = pc.sort_indices(g, sort_keys=[(key_col, "ascending")])
        g = g.take(idx)
        pdir = os.path.join(out_dir, f"part={part:05d}")
        os.makedirs(pdir, exist_ok=True)
        fpath = os.path.join(pdir, "data.parquet")
        done = os.path.join(pdir, ".done")
        k = pc.cast(g[key_col], pa.int64())
        kmin, kmax = int(pc.min(k).as_py()), int(pc.max(k).as_py())
        sig = f"{len(g)},{kmin},{kmax},{_content_hash(g)}"
        if os.path.isfile(done) and os.path.isfile(fpath):
            # skip ONLY when count, key range AND content hash all
            # match: a resume under drifted boundaries (different
            # block sample) or ANY changed input — including non-key
            # columns at identical count/range — must rewrite, or the
            # manifest would record a range a stale file does not
            # contain (r4 ADVICE finding)
            with open(done) as f:
                if f.read().strip() == sig:
                    return pa.table(
                        {
                            "part": pa.array([part], pa.int64()),
                            "n_rows": pa.array([len(g)], pa.int64()),
                            "key_min": pa.array([kmin], pa.int64()),
                            "key_max": pa.array([kmax], pa.int64()),
                            "skipped": pa.array([1], pa.int64()),
                        }
                    )
        fd, tmp = tempfile.mkstemp(dir=pdir, suffix=".parquet")
        os.close(fd)
        pq.write_table(g, tmp)
        os.replace(tmp, fpath)
        fd, tmp = tempfile.mkstemp(dir=pdir, suffix=".done")
        with os.fdopen(fd, "w") as f:
            f.write(sig)
        os.replace(tmp, done)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n_rows": pa.array([len(g)], pa.int64()),
                "key_min": pa.array([int(pc.min(k).as_py())], pa.int64()),
                "key_max": pa.array([int(pc.max(k).as_py())], pa.int64()),
                "skipped": pa.array([0], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_write_part, batch_format="pyarrow")
        .to_pandas()  # partition-count-sized
    )
    stats = (
        stats.sort_values("part")
        if len(stats)
        else stats.reindex(
            columns=["part", "n_rows", "key_min", "key_max", "skipped"]
        )
    )
    manifest = {
        "key_col": key_col,
        "boundaries": bounds_list,
        "partitions": [
            {
                "part": int(r["part"]),
                "n_rows": int(r["n_rows"]),
                "key_min": int(r["key_min"]),
                "key_max": int(r["key_max"]),
                "skipped": bool(r["skipped"]),
            }
            for _, r in stats.iterrows()
        ],
    }
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def read_range_partitioned(
    out_dir: str,
    key_lo: int | None = None,
    key_hi: int | None = None,
) -> ray.data.Dataset:
    """Read back a range-partitioned sink, opening ONLY the partition
    files whose manifest key range overlaps ``[key_lo, key_hi)`` —
    file-level pruning from the manifest, then an exact row-level
    filter inside the overlapping files."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    key_col = manifest["key_col"]
    paths = []
    for p in manifest["partitions"]:
        if key_lo is not None and p["key_max"] < key_lo:
            continue
        if key_hi is not None and p["key_min"] >= key_hi:
            continue
        paths.append(
            os.path.join(out_dir, f"part={p['part']:05d}", "data.parquet")
        )
    if not paths:
        if not manifest["partitions"]:
            raise ValueError(
                f"read_range_partitioned: {out_dir!r} holds an empty "
                "sink (zero partitions) — nothing to read"
            )
        return ray.data.from_arrow(
            pq.read_table(
                os.path.join(
                    out_dir,
                    f"part={manifest['partitions'][0]['part']:05d}",
                    "data.parquet",
                )
            ).slice(0, 0)
        )
    ds = ray.data.read_parquet(paths)
    if key_lo is None and key_hi is None:
        return ds

    def _trim(b: pa.Table) -> pa.Table:
        k = pc.cast(b[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        m = np.ones(len(k), bool)
        if key_lo is not None:
            m &= k >= key_lo
        if key_hi is not None:
            m &= k < key_hi
        return b.filter(pa.array(m))

    return ds.map_batches(_trim, batch_format="pyarrow", zero_copy_batch=True)
