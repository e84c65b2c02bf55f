"""Round-4h operators: FastSS typo dedup, id-gap audit, regex profile,
Arrow-IPC ingest round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.dedup import typo_dedup_pairs
from workbook_exporter_fe_ray.stages.relational import id_gap_audit


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_typo_dedup_planted_cases(ray_session):
    texts = {
        0: "the quick brown fox jump",   # base (24 chars)
        1: "the quick brown fox jump",   # exact dup -> pair ed0
        2: "the quick crown fox jump",   # substitution -> ed1
        3: "the quick brown fox jums",   # substitution at end -> ed1
        4: "the quick brown fox jum",    # deletion (len-1) -> ed1
        5: "xthe quick brown fox jum",   # insertion at front -> ed1 vs 4? (no: vs 0 it's ed2)
        6: "ab",                          # short string
        7: "ba",                          # ed2 vs 6 (shared deletion variant trap)
        8: "b",                           # deletion of 6/7 -> ed1 to both
        9: "completely different txt",   # no pair
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    out = typo_dedup_pairs(
        ray.data.from_arrow(tbl).repartition(4), num_partitions=3
    ).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    exp = set()
    for a in texts:
        for b in texts:
            if a < b and _lev(texts[a][:24], texts[b][:24]) <= 1:
                exp.add((a, b))
    assert got == exp
    assert (6, 7) not in got  # shared-deletion-variant ed2 pair rejected
    assert (6, 8) in got and (7, 8) in got


def test_typo_dedup_random_vs_brute(ray_session):
    rng = np.random.default_rng(5)
    vocab = ["fast", "slow", "scan", "scam", "spam", "span"]
    texts = [
        " ".join(vocab[k] for k in rng.integers(0, len(vocab), 5))
        for _ in range(400)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(400, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = typo_dedup_pairs(
        ray.data.from_arrow(tbl).repartition(6), prefix_len=12
    ).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    pre = [t[:12] for t in texts]
    exp = {
        (a, b)
        for a in range(400)
        for b in range(a + 1, 400)
        if abs(len(pre[a]) - len(pre[b])) <= 1 and _lev(pre[a], pre[b]) <= 1
    }
    assert got == exp


def test_id_gap_audit_cross_bucket(ray_session):
    # ids straddle tiny buckets (shift=2 -> 4 ids per bucket) with
    # in-bucket gaps, a cross-bucket gap spanning an entirely empty
    # bucket, and duplicate id rows
    ids = [0, 1, 3, 4, 14, 15, 15, 20]
    n = len(ids)
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
        }
    )
    out = id_gap_audit(
        ray.data.from_arrow(tbl).repartition(3),
        bucket_shift=2,
        num_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # present: {0,1,3,4,14,15,20}; gaps: 1->3 (1), 4->14 (9), 15->20 (4)
    assert r["n_present"] == 7
    assert r["id_min"] == 0 and r["id_max"] == 20
    assert r["n_missing"] == 1 + 9 + 4
    assert r["n_gap_runs"] == 3
    assert r["max_gap"] == 9


def test_ipc_ingest_round_trip(ray_session, tmp_path):
    from workbook_exporter_fe_ray.sources.formats import (
        read_auto,
        synth_metrics_ipc,
    )

    p = str(tmp_path / "m.arrow")
    synth_metrics_ipc(p, n=2500)
    ds = read_auto(p)
    assert ds.count() == 2500
    import pyarrow.parquet as pq

    sib = pq.read_table(str(tmp_path / "m.parquet"))
    got = ds.to_pandas().sort_values("metric_id").reset_index(drop=True)
    exp = sib.to_pandas().sort_values("metric_id").reset_index(drop=True)
    assert got.equals(exp)
