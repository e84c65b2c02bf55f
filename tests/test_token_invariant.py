"""Per-row token-array invariant (BASELINE.json input_hint): every input
row's ``tokens`` list survives the pipeline byte-for-byte.

Two independent checks:
1. carried-through: full-schema rows run through the engine's point
   derivation with tokens carried; Arrow list equality vs the raw file.
2. re-derived: tokens recomputed from the (seed, source, seq) spec
   (tests/oracle-side derivation, independent of the generator's output)
   must equal what the engine carried.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pyarrow as pa

from workbook_exporter_fe_ray import datagen
from workbook_exporter_fe_ray.sources import read_input
from workbook_exporter_fe_ray.stages.points import derive_points_carry_tokens

SEED = 42  # conftest generates sf_test with this seed


def _sorted_tokens(df: pd.DataFrame) -> list[list[int]]:
    df = df.sort_values(["doc_id"], kind="stable").reset_index(drop=True)
    return [list(t) for t in df["tokens"]]


def test_tokens_survive_pipeline(sf_test_paths, ray_session):
    raw = pa.concat_tables([pq.read_table(p) for p in sf_test_paths])
    carried = derive_points_carry_tokens(read_input(sf_test_paths)).to_pandas()

    raw_df = raw.select(["doc_id", "tokens"]).to_pandas()
    assert len(carried) == len(raw_df)
    got = _sorted_tokens(carried)
    want = _sorted_tokens(raw_df)
    assert got == want  # exact token-array equality, duplicates included


def test_tokens_match_spec_rederivation(sf_test_paths, ray_session):
    """Independent re-derivation: tokens[j] = mix(seed, src, seq,
    TOKENS_SALT)-seeded splitmix stream, per FIXTURES spec."""
    carried = derive_points_carry_tokens(read_input(sf_test_paths)).to_pandas()
    carried = carried.sort_values("doc_id", kind="stable").reset_index(drop=True)

    checked = 0
    for _, row in carried.iloc[:: max(1, len(carried) // 500)].iterrows():
        src, seq_s = row["doc_id"].rsplit("-", 1)
        src_idx = int(src.split("-")[1])
        seq = np.array([int(seq_s)], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h_row = datagen.mix(SEED, src_idx, seq, datagen.TOKENS_SALT)[0]
            n = len(row["tokens"])
            j = np.arange(n, dtype=np.uint64)
            want = (datagen.splitmix64(h_row + j) % np.uint64(50257)).astype(np.int32)
        np.testing.assert_array_equal(np.asarray(list(row["tokens"]), np.int32), want)
        checked += 1
    assert checked >= 100


def test_token_bigram_topk_exact(ray_session, tmp_path):
    """token_bigram_topk == brute-force pair counting (no cross-doc
    pairs), including the deterministic (count DESC, a, b) tie-break."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.pack import token_bigram_topk

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 7, size=int(rng.integers(1, 30))).astype(np.int32) for _ in range(400)]
    want = Counter()
    for d in docs:
        for a, b in zip(d[:-1], d[1:]):
            want[(int(a), int(b))] += 1
    tbl = pa.table({"tokens": pa.array([d.tolist() for d in docs], pa.list_(pa.int32()))})
    out = (
        token_bigram_topk(ray.data.from_arrow(tbl).repartition(8), k=15)
        .to_pandas()
    )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = list(zip(zip(out["tok_a"], out["tok_b"]), out["n_pairs"]))
    assert [(tuple(map(int, k)), int(v)) for k, v in got] == ranked
