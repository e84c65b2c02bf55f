"""Resumable packing job: checkpoint/resume bit-identity and parity
with the in-memory packer.

1. A partial run (subset of buckets) then a resume must produce exactly
   the same packs as one uninterrupted run — byte-identical parquet
   content per pack.
2. The job's packs must equal ``assemble_packs``'s in-memory result.
3. A re-run over a complete manifest is a no-op (nothing recomputed).
"""

from __future__ import annotations

import glob
import json

import numpy as np
import pandas as pd
import pytest
import ray.data

from workbook_exporter_fe_ray import datagen
from workbook_exporter_fe_ray.pipelines.pack_job import (
    PackJob,
    read_packs,
    run_pack,
)
from workbook_exporter_fe_ray.stages.dedup import exact_dedup
from workbook_exporter_fe_ray.stages.pack import assemble_packs, doc_rank_batch

PACK_LEN = 128


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("packjob_corpus"))
    datagen.generate(d, n_sources=4, base_seqs=150, seed=11, n_shards=3)
    return d


def _paths(d: str) -> list[str]:
    return sorted(glob.glob(f"{d}/*.parquet"))


def _packs_df(out_dir: str) -> pd.DataFrame:
    df = read_packs(out_dir).to_pandas().sort_values("pack_id").reset_index(drop=True)
    df["tokens"] = df["tokens"].map(lambda t: np.asarray(t, dtype=np.int32).tolist())
    return df


def test_pack_job_resume_bit_identity(ray_session, corpus, tmp_path):
    paths = _paths(corpus)
    full_dir = str(tmp_path / "full")
    run_pack(PackJob(paths, full_dir, pack_len=PACK_LEN, n_buckets=6))

    # interrupted run: only buckets 0,2 first, then resume everything
    part_dir = str(tmp_path / "partial")
    job = PackJob(paths, part_dir, pack_len=PACK_LEN, n_buckets=6)
    run_pack(job, bucket_ids=[0, 2])
    man = json.load(open(f"{part_dir}/manifest.json"))
    assert set(int(k) for k in man["partitions"]) == {0, 2}
    assert not glob.glob(f"{part_dir}/boundary/*")  # finalize not yet run

    totals = run_pack(job)  # resume
    assert totals["partitions_done"] == 7  # 6 buckets + finalize

    a, b = _packs_df(full_dir), _packs_df(part_dir)
    pd.testing.assert_frame_equal(a, b)

    # no-op re-run: manifest already complete, wall ~instant
    man_before = open(f"{part_dir}/manifest.json").read()
    run_pack(job)
    man_after = json.load(open(f"{part_dir}/manifest.json"))
    assert {int(k) for k in man_after["partitions"]} == set(range(6)) | {-1}
    # partition records unchanged (nothing recomputed)
    assert json.loads(man_before)["partitions"] == man_after["partitions"]


def test_pack_job_matches_in_memory_packer(ray_session, corpus, tmp_path):
    paths = _paths(corpus)
    out_dir = str(tmp_path / "job")
    run_pack(PackJob(paths, out_dir, pack_len=PACK_LEN, n_buckets=5))
    got = _packs_df(out_dir)

    slim = ray.data.read_parquet(paths, columns=["doc_id", "n_tok"]).map_batches(
        doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    slim = exact_dedup(slim, keys=["rank"], tie_col="n_tok")
    docs = ray.data.read_parquet(paths, columns=["doc_id", "tokens"]).map_batches(
        doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    want = (
        assemble_packs(
            docs,
            pack_len=PACK_LEN,
            n_col="n_tok",
            docs_slim=slim,
            drop_dup_ids=True,
        )
        .to_pandas()
        .sort_values("pack_id")
        .reset_index(drop=True)
    )
    want["tokens"] = want["tokens"].map(
        lambda t: np.asarray(t, dtype=np.int32).tolist()
    )
    pd.testing.assert_frame_equal(got, want)

    # lineage: manifest carries the scan state and per-bucket fragments
    man = json.load(open(f"{out_dir}/manifest.json"))
    assert "scan_state" in man["metadata"]
    assert len(man["metadata"]["scan_state"]["bucket_tokens"]) == 5
    for k, rec in man["partitions"].items():
        if int(k) >= 0:
            assert rec["input_fragments"], k
