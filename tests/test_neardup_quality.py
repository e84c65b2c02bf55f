"""Near-dup miner quality: brute-force O(n²) ground truth at sf0.001.

- MinHash+LSH reported pairs must carry EXACT n-gram Jaccard values
  (verifies the shingle-hash verification path against direct text
  computation — catches hash-collision or kernel drift).
- Recall: every true pair comfortably above the threshold must be found
  (LSH is probabilistic only near the threshold boundary).
- SimHash reported pairs must carry exact hamming distances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from workbook_exporter_fe_ray.sources import read_table
from workbook_exporter_fe_ray.stages.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash64,
    simhash_pairs,
)

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_minhash_pairs_carry_exact_jaccard(ray_session):
    docs = _docs()
    text = dict(zip(docs["doc_id"], docs["text"]))
    got = minhash_lsh_pairs(read_table(f"{SF}/documents.parquet"), threshold=0.2).to_pandas()
    assert len(got) > 0
    for _, r in got.iterrows():
        direct = ngram_jaccard(text[r["id_a"]], text[r["id_b"]], 3)
        np.testing.assert_allclose(r["jaccard"], direct, rtol=0, atol=0)
        assert r["jaccard"] >= 0.2
        assert r["id_a"] < r["id_b"]


def test_minhash_recall_on_confident_pairs(ray_session):
    """Every true pair with jaccard ≥ 2× threshold must be found (16
    bands × 4 rows at t=0.2 makes a miss at j≥0.4 astronomically rare)."""
    docs = _docs()
    ids = docs["doc_id"].to_numpy()
    texts = docs["text"].to_numpy()
    truth = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if ngram_jaccard(texts[i], texts[j], 3) >= 0.4:
                truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = minhash_lsh_pairs(read_table(f"{SF}/documents.parquet"), threshold=0.2).to_pandas()
    found = set(zip(got["id_a"], got["id_b"]))
    missed = truth - found
    assert not missed, f"missed confident pairs: {sorted(missed)[:5]}"


def test_simhash_pairs_carry_exact_hamming(ray_session):
    docs = _docs()
    sig = {r.doc_id: simhash64(r.text) for r in docs.itertuples()}
    got = simhash_pairs(read_table(f"{SF}/documents.parquet")).to_pandas()
    for _, r in got.iterrows():
        d = bin(sig[r["id_a"]] ^ sig[r["id_b"]]).count("1")
        assert r["hamming"] == d
        assert d <= 3

    # pigeonhole completeness: 4 bands guarantee every hamming≤3 pair
    ids = list(sig)
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(sig[ids[i]] ^ sig[ids[j]]).count("1") <= 3:
                truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    found = set(zip(got["id_a"], got["id_b"]))
    assert truth == found


def test_minhash_partition_invariance(ray_session):
    """Pairs must not depend on the coarse-partition count (P is a
    routing knob, like cluster size)."""
    ds = read_table(f"{SF}/documents.parquet")
    key = ["id_a", "id_b"]
    a = (
        minhash_lsh_pairs(ds, threshold=0.2, num_partitions=16)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        minhash_lsh_pairs(ds, threshold=0.2, num_partitions=64)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_simhash_partition_invariance(ray_session):
    ds = read_table(f"{SF}/documents.parquet")
    key = ["id_a", "id_b"]
    a = (
        simhash_pairs(ds, num_partitions=16)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        simhash_pairs(ds, num_partitions=64)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_minhash_estimate_mode(ray_session):
    """Signature-only verification (the fixed-bytes-per-doc scale path):
    every exact pair with jaccard ≥ 0.5 must also surface in estimate
    mode at a slack threshold, and estimates must track exact values."""
    ds = read_table(f"{SF}/documents.parquet")
    exact = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    est = minhash_lsh_pairs(ds, threshold=0.3, verify="estimate").to_pandas()
    est_pairs = dict(zip(zip(est["id_a"], est["id_b"]), est["jaccard"]))
    for _, r in exact.iterrows():
        key = (r["id_a"], r["id_b"])
        assert key in est_pairs, key
        assert abs(est_pairs[key] - r["jaccard"]) < 0.35


def test_cosine_lsh_recall_vs_exact(ray_session):
    """Planted near-dups: LSH-bucketed pairs must find (nearly) all
    pairs the exact triangle join finds, with exact-precision cosines."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.similarity import (
        cosine_neardup_lsh_pairs,
        cosine_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 32))
    # 3 noisy copies of each base vector → plenty of cosine≥0.9 pairs
    noisy = np.repeat(base, 3, axis=0) + 0.05 * rng.standard_normal((120, 32))
    mat = np.vstack([base, noisy, rng.standard_normal((100, 32))])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(list(mat), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    exact = cosine_neardup_pairs(ds, threshold=0.9).to_pandas()
    approx = cosine_neardup_lsh_pairs(
        ds, threshold=0.9, n_tables=8, n_bits=8, dim=32
    ).to_pandas()
    truth = set(zip(exact["id_a"], exact["id_b"]))
    found = set(zip(approx["id_a"], approx["id_b"]))
    assert truth, "planted corpus must contain exact pairs"
    # exact-precision: every reported pair is a true pair
    assert found <= truth
    # recall: 8 tables x 8 bits at cos>=0.9 misses ~1% per pair
    assert len(found) / len(truth) >= 0.9


def test_cosine_exact_block_invariance(ray_session):
    """The exact triangle join must not depend on n_blocks (a routing
    knob) and must match an O(n^2) numpy reference."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.similarity import cosine_neardup_pairs

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((150, 16))
    mat[50:60] = mat[:10] + 0.01 * rng.standard_normal((10, 16))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(list(mat), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    key = ["id_a", "id_b"]
    a = (
        cosine_neardup_pairs(ds, threshold=0.8, n_blocks=4)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        cosine_neardup_pairs(ds, threshold=0.8, n_blocks=9)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[key], b[key])

    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mn @ mn.T
    ai, bi = np.nonzero(np.triu(cos >= 0.8, k=1))
    truth = set(zip(ai, bi))
    assert set(zip(a["id_a"], a["id_b"])) == truth


def test_batch_simhash_matches_reference(ray_session):
    """_batch_simhash must be bit-identical to per-doc simhash64."""
    from workbook_exporter_fe_ray.stages.dedup import _batch_simhash, simhash64
    import pyarrow as pa

    docs = _docs()
    texts = docs["text"].tolist() + ["", "one", "a b", "x\ty\nz", "  pad  "]
    got = _batch_simhash(pa.array(texts, pa.string()))
    for t, g in zip(texts, got):
        assert int(g) == simhash64(t), repr(t[:40])
