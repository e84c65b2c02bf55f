"""North-rule invariant for the materialized packer: every assembled
pack's token array must equal, element-for-element, the corresponding
window of the concatenated input corpus in global doc order — for any
partitioning, including buckets that straddle pack boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from workbook_exporter_fe_ray import datagen
from workbook_exporter_fe_ray.stages.dedup import exact_dedup
from workbook_exporter_fe_ray.stages.pack import assemble_packs, doc_rank_batch

PACK_LEN = 96


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("packcorpus"))
    datagen.generate(d, n_sources=4, base_seqs=120, seed=7, n_shards=3)
    return d


def _reference_packs(d: str) -> list[np.ndarray]:
    """Single-process numpy reference: dedup, sort by doc_id, concat,
    chunk."""
    import pyarrow.parquet as pq
    import os

    tbls = [
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    t = pa.concat_tables(tbls)
    df = t.select(["doc_id", "tokens"]).to_pandas()
    df = df.drop_duplicates("doc_id").sort_values("doc_id")
    stream = np.concatenate([np.asarray(x, dtype=np.int32) for x in df["tokens"]])
    return [stream[i : i + PACK_LEN] for i in range(0, len(stream), PACK_LEN)]


@pytest.mark.parametrize(
    "parts,slim",
    [
        ((1, 1), False),
        ((5, 3), True),
        ((32, 32), True),
        ((5, 3), False),
        # folded slim dedup: no exact_dedup exchange — id dups resolve
        # inside the bucket-sum group (dedup_slim_ids=True)
        ((5, 3), "folded"),
        ((32, 32), "folded"),
    ],
)
def test_assembled_packs_token_equality(ray_session, corpus, parts, slim):
    P, Q = parts
    import glob

    paths = sorted(glob.glob(f"{corpus}/*.parquet"))
    docs = ray.data.read_parquet(paths, columns=["doc_id", "tokens"]).map_batches(
        doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    if slim:
        # scale path: dedup only the pruned projection, drop dup ids
        # inside the slice sweep — must be bit-identical to payload dedup
        sl = ray.data.read_parquet(paths, columns=["doc_id", "n_tok"]).map_batches(
            doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        if slim != "folded":
            sl = exact_dedup(sl, keys=["rank"], tie_col="n_tok")
        out = assemble_packs(
            docs,
            pack_len=PACK_LEN,
            num_partitions=P,
            pack_partitions=Q,
            n_col="n_tok",
            docs_slim=sl,
            drop_dup_ids=True,
            dedup_slim_ids=(slim == "folded"),
        ).to_pandas()
    else:
        docs = exact_dedup(docs, keys=["rank"], tie_col="rank")
        out = assemble_packs(
            docs, pack_len=PACK_LEN, num_partitions=P, pack_partitions=Q
        ).to_pandas()
    out = out.sort_values("pack_id").reset_index(drop=True)
    want = _reference_packs(corpus)
    assert out["pack_id"].tolist() == list(range(len(want)))
    for pid, got in zip(out["pack_id"], out["tokens"]):
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.int32), want[pid], err_msg=f"pack {pid}"
        )
    # full packs are exactly PACK_LEN
    lens = out["tokens"].map(len)
    assert (lens.iloc[:-1] == PACK_LEN).all() and lens.iloc[-1] <= PACK_LEN
