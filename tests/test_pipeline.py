"""End-to-end flagship pipeline: resume-after-partial-run bit-identity,
manifest lineage, retention, and block-layout invariance (SURVEY §5.2 #5/#6)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from workbook_exporter_fe_ray.pipelines.timeseries import (
    TimeseriesJob,
    run_timeseries,
    source_partition,
)
from workbook_exporter_fe_ray.schema import DEFAULT_TIERS, TierSpec
from workbook_exporter_fe_ray.sources import read_points_input
from workbook_exporter_fe_ray.stages.points import derive_points
from workbook_exporter_fe_ray.stages.rollup import cascade_rollup


def _read_all(pattern: str) -> pd.DataFrame:
    files = sorted(glob.glob(pattern))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    sort_cols = [c for c in ("source", "bucket_ts", "chunk_start_ts") if c in df.columns]
    return df.sort_values(sort_cols, kind="stable").reset_index(drop=True)


def _assert_frames_identical(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == np.float64:
            np.testing.assert_array_equal(av.view(np.int64), bv.view(np.int64), err_msg=c)
        else:
            np.testing.assert_array_equal(av, bv, err_msg=c)


def test_resume_bit_identical(sf_test_paths, tmp_path):
    """Partial run (2 of 4 partitions) + resumed run == uninterrupted run."""
    full_dir, resumed_dir = str(tmp_path / "full"), str(tmp_path / "resumed")
    job_full = TimeseriesJob(sf_test_paths, full_dir, n_partitions=4)
    run_timeseries(job_full)

    job_res = TimeseriesJob(sf_test_paths, resumed_dir, n_partitions=4)
    run_timeseries(job_res, partition_ids=[0, 1])  # "killed" after 2 partitions
    with open(os.path.join(resumed_dir, "manifest.json")) as f:
        doc = json.load(f)
    assert sorted(int(k) for k in doc["partitions"]) == [0, 1]

    summary = run_timeseries(job_res)  # resume: must skip 0,1 and finish 2,3
    assert summary["partitions_done"] == 4

    for sub in ["tiers/1m", "tiers/5m", "tiers/1h", "tiers/1d", "gapfill/1m", "chunks"]:
        a = _read_all(f"{full_dir}/{sub}/part-*/*.parquet")
        b = _read_all(f"{resumed_dir}/{sub}/part-*/*.parquet")
        _assert_frames_identical(a, b)


def test_manifest_lineage_and_metrics(sf_test_paths, tmp_path):
    out = str(tmp_path / "out")
    summary = run_timeseries(TimeseriesJob(sf_test_paths, out, n_partitions=2))
    with open(os.path.join(out, "manifest.json")) as f:
        doc = json.load(f)
    import pyarrow.parquet as pq

    frag_rows = {p: pq.ParquetFile(p).metadata.num_rows for p in sf_test_paths}
    for rec in doc["partitions"].values():
        assert rec["input_fragments"] == sf_test_paths
        assert rec["points"] > 0 and rec["compressed_bytes"] > 0 and rec["wall_s"] > 0
        # north-rule lineage: [path, row_start, row_end) per fragment,
        # footer-exact; metrics carry rows/s and spill bytes
        assert rec["input_row_ranges"] == [
            [p, 0, frag_rows[p]] for p in sf_test_paths
        ]
        assert rec["rows_in"] == sum(frag_rows.values())
        assert rec["points_per_s"] > 0
        assert rec["spilled_bytes"] >= 0
    assert summary["spilled_bytes"] >= 0
    assert summary["compressed_bytes"] < summary["raw_point_bytes"] / 2
    assert set(summary["tier_rows"]) == {"1m", "5m", "1h", "1d"}
    # every source landed in exactly one partition
    assert doc["metadata"]["n_partitions"] == 2


def test_retention_drops_old_buckets(sf_test_paths, tmp_path):
    """1m tier keeps only the trailing retention window when now_us is set."""
    out = str(tmp_path / "ret")
    tiers = (
        TierSpec("1m", 60, None, retention_s=86_400),  # keep last day only
        TierSpec("1d", 86_400, "1m", retention_s=None),
    )
    pts = derive_points(read_points_input(sf_test_paths))
    max_ts = int(pd.Timestamp(pts.max("ts")).value // 1000)
    run_timeseries(
        TimeseriesJob(
            sf_test_paths,
            out,
            tiers=tiers,
            n_partitions=2,
            gapfill_strategy=None,
            now_us=max_ts,
        )
    )
    t1m = _read_all(f"{out}/tiers/1m/part-*/*.parquet")
    t1d = _read_all(f"{out}/tiers/1d/part-*/*.parquet")
    span_1m = t1m["bucket_ts"].astype("int64").max() - t1m["bucket_ts"].astype("int64").min()
    assert span_1m <= 86_400 * 1_000_000
    # untouched tier keeps the full span (hot source spans >1 day)
    span_1d = t1d["bucket_ts"].astype("int64").max() - t1d["bucket_ts"].astype("int64").min()
    assert span_1d >= 86_400 * 1_000_000  # >1 distinct day bucket survives


def test_block_layout_invariance(sf_test_paths):
    """Same input under different block layouts → identical rollup
    (the determinism contract of SURVEY §2.9)."""
    outs = []
    for nblocks in (2, 13):
        pts = derive_points(
            ray.data.read_parquet(
                sf_test_paths,
                columns=["doc_id", "n_tok", "source"],
                override_num_blocks=nblocks,
            )
        )
        df = cascade_rollup(pts).to_pandas()
        df = df.sort_values(["tier", "source", "bucket_ts"], kind="stable").reset_index(
            drop=True
        )
        outs.append(df)
    _assert_frames_identical(outs[0], outs[1])


def test_source_partition_stable():
    assert source_partition("src-000", 8) == source_partition("src-000", 8)
    assert 0 <= source_partition("anything", 5) < 5


def test_empty_partition_records_cleanly(sf_test_paths, tmp_path, ray_session):
    """A partition that owns zero sources (hash gaps at small source
    counts, pruned resumes) must complete and write its record so the
    resume skips it — not crash on a column-less stats frame."""
    out = str(tmp_path / "out_empty")
    summary = run_timeseries(
        TimeseriesJob(sf_test_paths, out, n_partitions=32)
    )
    with open(os.path.join(out, "manifest.json")) as f:
        doc = json.load(f)
    assert len(doc["partitions"]) == 32
    empties = [r for r in doc["partitions"].values() if r["points"] == 0]
    assert empties, "expected at least one empty partition at 32 partitions"
    for r in empties:
        assert r["status"] == "done"
        assert r["points_per_s"] == 0.0 and r["chunk_count"] == 0
    assert summary["partitions_done"] == 32
