"""Deterministic synthetic input generator (FIXTURES.md §1).

Generates the authoritative tokenized-sequence table
``(doc_id, tokens, n_tok, source)`` with the spec'd gap / duplicate /
skew / spike structure, fully seeded — no external data, no RNG state
(every cell is a pure function of ``(seed, source_idx, seq)`` via
splitmix64, so the oracle in ``tests/oracle.py`` can re-derive any value
independently).

Spec (engine-visible, shared with tests/oracle.py):

- ``doc_id = f"{source}-{seq:012d}"``; ``ts = EPOCH0 + seq * 60s``.
- Gaps: seq dropped iff  ``mix(seed, i, seq, GAP_SALT)  % 1000 < 30``  (~3%).
- Dups: row emitted twice iff ``mix(seed, i, seq, DUP_SALT) % 1000 < 5`` (~0.5%).
- ``n_tok = 1 + mix(seed, i, seq, TOK_SALT) % tok_mod``; every 997th seq ×8.
- ``tokens[j] = mix(seed, i, seq, TOKENS_SALT + j) % 50257``, length ``n_tok``.
- Skew: source 0 ("hot key") has 3× the seqs of every other source
  → ~30% of all rows when S=8.

Scales: sf_test S=8 × ≤2000 seqs (~15k rows, pytest golden);
sf_bench S=64 × ~50k seqs (~3M rows, BENCH) with ``tok_mod=256`` to
keep the tokens payload disk-friendly while preserving the spec shape.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import EPOCH0_US, STEP_US

GAP_SALT = 0x67617073  # "gaps"
DUP_SALT = 0x64757073  # "dups"
TOK_SALT = 0x746F6B73  # "toks"
TOKENS_SALT = 0x746F6B65_6E73  # "tokens"

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def mix(seed: int, src_idx: int, seq: np.ndarray, salt: int) -> np.ndarray:
    """Stable 64-bit hash of (seed, source_idx, seq, salt), vectorized over seq."""
    with np.errstate(over="ignore"):
        h = splitmix64(np.uint64(seed) ^ splitmix64(np.asarray([np.uint64(salt)]))[0])
        h = splitmix64(np.uint64(h) + np.uint64(src_idx) * _GOLD)
        return splitmix64(np.asarray(seq, dtype=np.uint64) ^ np.uint64(h))


def source_name(i: int) -> str:
    return f"src-{i:03d}"


def n_seqs_per_source(n_sources: int, base_seqs: int) -> list[int]:
    """Zipf-ish skew: source 0 is the hot key with 3× base."""
    return [3 * base_seqs] + [base_seqs] * (n_sources - 1)


def generate_source(
    seed: int,
    src_idx: int,
    n_seq: int,
    tok_mod: int = 2048,
    with_tokens: bool = True,
) -> pa.Table:
    """All rows of one source, in seq order, duplicates adjacent."""
    with np.errstate(over="ignore"):
        seq = np.arange(n_seq, dtype=np.uint64)
        keep = (mix(seed, src_idx, seq, GAP_SALT) % np.uint64(1000)) >= np.uint64(30)
        seq = seq[keep]
        dup = (mix(seed, src_idx, seq, DUP_SALT) % np.uint64(1000)) < np.uint64(5)
        n_tok = 1 + (mix(seed, src_idx, seq, TOK_SALT) % np.uint64(tok_mod)).astype(np.int64)
        n_tok = np.where(seq % np.uint64(997) == np.uint64(0), n_tok * 8, n_tok)

        # duplicate expansion: each dup'd seq appears twice, adjacent
        reps = np.where(dup, 2, 1)
        seq_out = np.repeat(seq, reps)
        n_tok_out = np.repeat(n_tok, reps).astype(np.int32)

    src = source_name(src_idx)
    doc_id = pa.array([f"{src}-{s:012d}" for s in seq_out.tolist()], pa.string())
    cols: dict[str, pa.Array] = {"doc_id": doc_id}

    if with_tokens:
        # tokens[j] for row with hash h: one splitmix over (h_row + j)
        with np.errstate(over="ignore"):
            h_row = mix(seed, src_idx, seq, TOKENS_SALT)
            total = int(n_tok.sum())
            offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
            np.cumsum(n_tok, out=offsets[1:])
            j = np.arange(total, dtype=np.uint64) - np.repeat(
                offsets[:-1].astype(np.uint64), n_tok
            )
            base = np.repeat(h_row, n_tok)
            vals = (splitmix64(base + j) % np.uint64(50257)).astype(np.int32)
        flat = pa.array(vals)
        uniq_tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()) if total < 2**31 else pa.array(offsets),
            flat,
        )
        # expand dups: take() repeats the list rows for duplicated seqs
        idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), reps)
        cols["tokens"] = uniq_tokens.take(pa.array(idx))

    cols["n_tok"] = pa.array(n_tok_out)
    cols["source"] = pa.array([src] * len(seq_out), pa.string())
    return pa.table(cols)


def generate(
    out_dir: str,
    n_sources: int = 8,
    base_seqs: int = 1000,
    seed: int = 42,
    tok_mod: int = 2048,
    with_tokens: bool = True,
    n_shards: int = 4,
) -> list[str]:
    """Write the table as ``n_shards`` Parquet files sharded by
    ``src_idx % n_shards`` (sources never straddle shards — the layout a
    100 TB deployment would use so per-shard checkpoint partitions can
    prune their reads to their own files)."""
    os.makedirs(out_dir, exist_ok=True)
    counts = n_seqs_per_source(n_sources, base_seqs)
    paths = []
    for shard in range(n_shards):
        tables = [
            generate_source(seed, i, counts[i], tok_mod, with_tokens)
            for i in range(n_sources)
            if i % n_shards == shard
        ]
        if not tables:
            continue
        path = os.path.join(out_dir, f"part-{shard:04d}.parquet")
        pq.write_table(pa.concat_tables(tables), path)
        paths.append(path)
    return paths


def expected_points(
    seed: int, src_idx: int, n_seq: int, tok_mod: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """(ts_us, n_tok) of the *deduplicated* series for one source, seq-sorted.

    Convenience for oracles/benchmarks; pure re-derivation of the spec.
    """
    with np.errstate(over="ignore"):
        seq = np.arange(n_seq, dtype=np.uint64)
        keep = (mix(seed, src_idx, seq, GAP_SALT) % np.uint64(1000)) >= np.uint64(30)
        seq = seq[keep]
        n_tok = 1 + (mix(seed, src_idx, seq, TOK_SALT) % np.uint64(tok_mod)).astype(np.int64)
        n_tok = np.where(seq % np.uint64(997) == np.uint64(0), n_tok * 8, n_tok)
    ts = EPOCH0_US + seq.astype(np.int64) * STEP_US
    return ts, n_tok.astype(np.int32)
