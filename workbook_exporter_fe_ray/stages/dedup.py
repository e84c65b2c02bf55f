"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Reference parity: the reference's only dedup is the per-row
"key already in the output file?" probe (``/root/reference/
workbook_exporter-fe.py:1741-1754``, SURVEY.md §2.3 ST2 / §2.4 J1) —
an O(rows × output) anti-join. Exact dedup here is the distributed
version: hash-partition on the key, first-in-group wins. The near-dup
family (MinHash/SimHash/Jaccard) is new capability for training-data
pipelines at 100 TB scale.

Scale notes:
- exact dedup shuffles only (key_hash, id) — dedup on a long text
  column hashes it first so the shuffle moves 16-byte keys, not
  documents, and the reduce is a plain associative ``Min`` aggregate
  (no per-group UDF calls).
- MinHash+LSH is the classic shingle→signature→band→bucket pipeline.
  Signatures AND shingle-hash sets are computed once, embarrassingly
  parallel, in an actor-pool ``map_batches``; raw text never enters the
  shuffle — band rows carry (bucket, id, shingle-hashes). Candidate
  verification is exact Jaccard over the precomputed shingle-hash sets
  (uint64 CRC+mix hashes; collision probability ~2^-64 per gram pair).
- Bucket groups are processed via a COARSE partition key
  (``bucket % num_partitions``) so the engine runs ``num_partitions``
  vectorized group tasks instead of one Python UDF call per LSH bucket
  (millions at scale); inside a partition, buckets are contiguous runs
  of a sort and are swept with NumPy.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _log_skipped(op: str, skipped: int, max_bucket: int) -> None:
    """Runtime visibility for capped work (the 'no silent caps' rule):
    oversized LSH buckets (degenerate near-constant content) are
    skipped, and each sweep task reports how many."""
    if skipped:
        import logging

        logging.getLogger(__name__).warning(
            "%s: skipped %d oversized buckets (> %d members) in one "
            "partition sweep — raise max_bucket (or band width) if these "
            "may hold real near-dups",
            op,
            skipped,
            max_bucket,
        )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 (numpy<2 has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, keys: list[str], tie_col: str, num_partitions: int = 64
) -> ray.data.Dataset:
    """Keep exactly one row per distinct ``keys`` — the one with the
    smallest ``tie_col`` (deterministic).

    Scale shape: per-block partial pick (one candidate row per key per
    block crosses the exchange) → coarse-partition vectorized sweep
    (``hash(keys) % P`` → ``num_partitions`` group calls total, never
    one Python call per distinct key)."""
    from .sweep import run_starts_table, with_part

    sort_keys = [(k, "ascending") for k in keys] + [(tie_col, "ascending")]

    def _cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        t = t.take(idx)
        return t.take(pa.array(run_starts_table(t, keys)))

    def _partial(b: pa.Table) -> pa.Table:
        return with_part(_cut(b), keys, num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        return _cut(g.drop_columns(["__part"]))

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def exact_dedup_by_content_hash(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Exact-content dedup on md5(text): returns (id_col=min id, content
    hash) per distinct content. The shuffle moves hashes, not documents,
    and the reduce is an associative Min aggregate (no group UDFs)."""

    def _hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({id_col: batch[id_col], "content_hash": pa.array(hashes)})

    hashed = ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("content_hash").aggregate(Min(id_col))

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b[f"min({id_col})"], "content_hash": b["content_hash"]}
        )

    return agg.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles / signatures
# ---------------------------------------------------------------------------


def word_ngrams(text: str, n: int) -> set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = word_ngrams(a, n), word_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_C3 = np.uint64(0x165667B19E3779F9)


def _word_hash(words: list[str]) -> np.ndarray:
    return _splitmix64(
        np.fromiter(
            (zlib.crc32(w.encode("utf-8")) for w in words), np.uint64, len(words)
        )
    )


def _combine3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit combine of three token hashes — the shingle
    hash of the trigram (a,b,c) without building the gram string."""
    with np.errstate(over="ignore"):
        return _splitmix64(a * _C1 ^ b * _C2 ^ c * _C3)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable sorted-unique uint64 hashes of word n-gram shingles.

    Hash = order-sensitive combine of per-word crc+mix hashes (n==3) or
    the combined hash of all words (short docs) — a pure function of
    the gram, so Jaccard over these sets equals Jaccard over the grams
    themselves (collisions ~2^-64)."""
    words = text.split()
    if not words:
        return np.array([0], dtype=np.uint64)
    h = _word_hash(words)
    if len(words) < n:
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for x in h:
                acc = _splitmix64(np.array([acc * _C1 ^ x]))[0]
        return np.array([acc], dtype=np.uint64)
    return np.unique(_combine3(h[:-2], h[1:-1], h[2:]))


def hashed_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash arrays."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def minhash_signature(text: str, num_perm: int, shingle_n: int, seed: int) -> np.ndarray:
    """num_perm-wide MinHash signature via one-hash + per-perm mixing."""
    h = _shingle_hashes(text, shingle_n)  # (S,)
    with np.errstate(over="ignore"):
        salts = _splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed))
        # (S, P) permuted hashes — min over shingles per permutation
        perm = _splitmix64(h[:, None] ^ salts[None, :])
    return perm.min(axis=0)  # (P,)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (unweighted). Reference
    implementation for one doc; the batch path is :func:`_batch_simhash`
    (bit-identical, asserted in tests/test_neardup_quality.py)."""
    words = text.split()
    if not words:
        return 0
    crcs = np.fromiter(
        (zlib.crc32(w.encode("utf-8")) for w in words), np.uint64, len(words)
    )
    feats = _splitmix64(crcs)
    bits = (feats[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    counts = bits.sum(axis=0)
    vec = counts * 2 > len(words)
    return int(np.packbits(vec[::-1]).view(">u8")[0])


def _batch_simhash(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized SimHash for a whole batch — same token-vocabulary
    hashing trick as :func:`_batch_shingles` (tokens split with one
    Arrow kernel, the small VOCABULARY crc+mix hashed once, per-token
    feature hashes broadcast through dictionary indices), then per-doc
    per-bit majority votes via one ``np.add.reduceat``. Bit-identical
    to :func:`simhash64` per doc."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.split_pattern_regex(texts, r"\s+")
    flat_tok = toks.flatten()
    raw_counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    nonempty = pc.greater(pc.utf8_length(flat_tok), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n_docs), raw_counts)[ne]
    flat_tok = flat_tok.filter(nonempty)
    counts = np.bincount(doc_of, minlength=n_docs)

    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_tok) == 0:
        return out
    enc = pc.dictionary_encode(flat_tok)
    vocab = enc.dictionary.to_pylist()
    th = _word_hash(vocab)[np.asarray(enc.indices)]  # (T,) uint64 features

    shifts = np.arange(64, dtype=np.uint64)
    bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    tok_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offs[1:])
    has_tok = counts > 0
    votes = np.add.reduceat(bits, tok_offs[:-1][has_tok], axis=0)  # (D', 64)
    maj = votes.astype(np.int64) * 2 > counts[has_tok][:, None]
    with np.errstate(over="ignore"):
        sigs = (maj.astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    out[has_tok] = sigs
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# ---------------------------------------------------------------------------


def _batch_shingles(texts: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique shingle hashes for a whole batch, with NO
    per-gram Python work: tokens are split once with an Arrow kernel,
    the (small) token VOCABULARY is hashed once, and n-gram hashes are
    an order-sensitive vectorized combine of adjacent token hashes.
    Returns (flat uint64 hashes, int64 doc-start offsets of len n_docs+1).
    Semantics identical to :func:`_shingle_hashes` per doc."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.split_pattern_regex(texts, r"\s+")
    flat_tok = toks.flatten()
    raw_counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    # .split() semantics: drop empty tokens (leading/trailing whitespace)
    nonempty = pc.greater(pc.utf8_length(flat_tok), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n_docs), raw_counts)[ne]
    flat_tok = flat_tok.filter(nonempty)
    counts = np.bincount(doc_of, minlength=n_docs)

    # hash the vocabulary once, broadcast through dictionary indices
    enc = pc.dictionary_encode(flat_tok)
    vocab = enc.dictionary.to_pylist()
    vh = _word_hash(vocab) if vocab else np.array([], dtype=np.uint64)
    th = vh[np.asarray(enc.indices)] if len(flat_tok) else np.array([], np.uint64)

    long_doc = counts >= n  # vectorized trigram path
    grams: list[np.ndarray] = []
    out_offs = np.zeros(n_docs + 1, dtype=np.int64)
    if long_doc.any() and len(th) >= n:
        tri = _combine3(th[:-2], th[1:-1], th[2:])
        valid = doc_of[:-2] == doc_of[2:]
        tri, tri_doc = tri[valid], doc_of[:-2][valid]
        # sorted-unique per doc: lexsort then drop run duplicates
        order = np.lexsort((tri, tri_doc))
        tri, tri_doc = tri[order], tri_doc[order]
        keep = np.ones(len(tri), dtype=bool)
        keep[1:] = (tri[1:] != tri[:-1]) | (tri_doc[1:] != tri_doc[:-1])
        tri, tri_doc = tri[keep], tri_doc[keep]
    else:
        tri = np.array([], np.uint64)
        tri_doc = np.array([], np.int64)

    # short docs (<n tokens): one combined-hash shingle ([0] when empty)
    per_doc: list[np.ndarray] = [None] * n_docs  # type: ignore[list-item]
    tok_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offs[1:])
    tri_counts = np.bincount(tri_doc, minlength=n_docs)
    tri_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(tri_counts, out=tri_offs[1:])
    for d in range(n_docs):
        if long_doc[d]:
            per_doc[d] = tri[tri_offs[d] : tri_offs[d + 1]]
        elif counts[d] == 0:
            per_doc[d] = np.array([0], dtype=np.uint64)
        else:
            h = th[tok_offs[d] : tok_offs[d + 1]]
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for x in h:
                    acc = _splitmix64(np.array([acc * _C1 ^ x]))[0]
            per_doc[d] = np.array([acc], dtype=np.uint64)
    lens = np.array([len(s) for s in per_doc], dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    flat = np.concatenate(per_doc) if per_doc else np.array([], np.uint64)
    return flat, out_offs


class _SignatureStage:
    """Actor-pool stage: per doc, ONE pass computes the sorted-unique
    shingle-hash set and the MinHash signature (batch-vectorized: all
    docs' shingles are concatenated and every permutation is reduced
    with one ``np.minimum.reduceat``). Text is dropped here — it never
    enters a shuffle."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, shingle_n: int, seed: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.shingle_n = num_perm, shingle_n
        with np.errstate(over="ignore"):
            self.salts = _splitmix64(
                np.arange(num_perm, dtype=np.uint64) + np.uint64(seed)
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        flat, offs = _batch_shingles(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col,
            self.shingle_n,
        )
        shingles = [flat[offs[d] : offs[d + 1]] for d in range(len(batch))]
        starts = offs[:-1]
        with np.errstate(over="ignore"):
            perm = _splitmix64(flat[:, None] ^ self.salts[None, :])  # (S_total, P)
        sigs = (
            np.minimum.reduceat(perm, starts, axis=0)
            if len(flat)
            else np.empty((0, self.num_perm), np.uint64)
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm
                ),
                "shingles": pa.array(
                    [s.view(np.int64) for s in shingles], pa.list_(pa.int64())
                ),
            }
        )


def _band_buckets(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) uint64 signatures → (n, bands) int64 bucket keys.
    Vectorized mixing fold over each band's rows + the band index."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    banded = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        acc = np.full((n, bands), _GOLD, dtype=np.uint64)
        for i in range(r):
            acc = _splitmix64(acc ^ banded[:, :, i])
        acc = _splitmix64(acc ^ np.arange(bands, dtype=np.uint64)[None, :])
    return acc.view(np.int64)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 4),
    num_partitions: int = 64,
    max_bucket: int = 64,
    verify: str = "exact",
    broadcast_payload_bytes: int = 256 << 20,
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Two-phase plan — candidates first, payloads later — so the wide
    exchange never carries document content:

    1. shingle+MinHash signature (actor pool, one pass, text dropped)
       → SLIM band rows ``(bucket % num_partitions, bucket, id)`` —
       24 B/row regardless of document size or verify mode →
       coarse-partition vectorized bucket sweep emits distinct
       candidate id pairs (no payload, no verification; buckets larger
       than ``max_bucket`` — degenerate near-constant content — are
       skipped and counted).
    2. the globally-distinct candidate set (tiny: near-dups + LSH false
       positives) names the INVOLVED docs; only their payloads are
       recomputed — the input is re-read filtered to involved ids
       (membership array broadcast once), so signature CPU for the
       verify pass is candidate-proportional — and routed through two
       candidate-sized sweep joins that attach each side's payload.
       One vectorized/batched verification per distinct pair, then the
       threshold filter.

    Every step is deterministic (seeded), and the output is identical
    to the one-phase formulation (same buckets → same candidates →
    same exact jaccard values).

    ``verify`` picks the payload, not the plan:
    - ``"exact"``: exact n-gram Jaccard over per-doc shingle-hash sets.
    - ``"estimate"``: MinHash estimate (fraction of equal signature
      components) — fixed ``num_perm × 8`` B per involved doc.

    Scale notes: the candidate set and the involved-id broadcast are
    O(candidate pairs); a corpus that is mostly duplicates makes them
    corpus-sized — raise ``threshold``/``bands`` selectivity or shard
    the run before that point (the skipped-bucket counter flags the
    degenerate case loudly).

    Attach plan is picked from the MEASURED involved-payload size
    (``size_bytes()`` on the materialized payload dataset, metadata
    only): ≤ ``broadcast_payload_bytes`` → the payload table is
    ``ray.put`` once and each verify batch looks both sides up locally
    (two fewer sort exchanges + two fewer executions — the common
    case: involved docs are candidate-proportional); larger → the two
    candidate-sized sweep-join exchanges, so nothing corpus-scale is
    ever broadcast. The chosen plan is logged; outputs are identical."""
    assert num_perm % bands == 0
    if verify not in ("exact", "estimate"):
        raise ValueError(f"unknown verify mode: {verify!r}")

    from .sweep import with_part

    sig_args = (text_col, id_col, num_perm, shingle_n, seed)
    signed = ds.map_batches(
        _SignatureStage,
        fn_constructor_args=sig_args,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )

    def _slim_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig = batch["signature"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        num_perm_local = sig.type.list_size
        sigs = sig.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
        sigs = sigs.reshape(n, num_perm_local)
        buckets = _band_buckets(sigs, bands)  # (n, bands)
        part = (buckets.view(np.uint64) % np.uint64(num_partitions)).astype(np.int32)
        rep = np.repeat(np.arange(n), bands)
        return pa.table(
            {
                "part": pa.array(part.reshape(-1)),
                "bucket": pa.array(buckets.reshape(-1)),
                id_col: batch[id_col].take(pa.array(rep)),
            }
        )

    banded = signed.map_batches(_slim_bands, batch_format="pyarrow")

    def _part_candidates(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("bucket", "ascending")])
        g = group.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        cand_a: list[np.ndarray] = []
        cand_b: list[np.ndarray] = []
        skipped = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_bucket:
                skipped += 1
                continue
            run = np.sort(ids[s:e], kind="stable")
            x, y = np.triu_indices(m, k=1)
            cand_a.append(run[x])
            cand_b.append(run[y])
        _log_skipped("minhash_lsh_pairs", skipped, max_bucket)
        if not cand_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        ia = np.concatenate(cand_a)
        ib = np.concatenate(cand_b)
        real = ia != ib
        ia, ib = ia[real], ib[real]
        if len(ia) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        uniq = np.unique(np.stack([ia, ib], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    cand = (
        banded.groupby("part")
        .map_groups(_part_candidates, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count())
        .drop_columns(["count()"])
        .materialize()
    )

    return _attach_verify_pairs(
        ds,
        cand,
        id_col=id_col,
        sig_args=sig_args,
        payload_col="shingles" if verify == "exact" else "signature",
        verify=verify,
        num_perm=num_perm,
        threshold=threshold,
        concurrency=concurrency,
        num_partitions=num_partitions,
        broadcast_payload_bytes=broadcast_payload_bytes,
    )




def _attach_verify_pairs(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    *,
    id_col: str,
    sig_args: tuple,
    payload_col: str,
    verify: str,
    num_perm: int,
    threshold: float,
    concurrency,
    num_partitions: int,
    broadcast_payload_bytes: int,
) -> ray.data.Dataset:
    """Shared phase 2 of the near-dup engines: given the slim
    globally-distinct candidate-pair dataset (materialized), recompute
    payloads for INVOLVED docs only, attach both sides — measured
    broadcast fast path under ``broadcast_payload_bytes``, else two
    candidate-sized sweep-join exchanges — and verify once per pair.
    Extracted verbatim from :func:`minhash_lsh_pairs` so the exact
    prefix-filter engine shares one battle-tested verify path."""
    from .sweep import with_part

    _EMPTY_PAIRS = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    inv_chunks: list[np.ndarray] = []
    for b in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        inv_chunks.append(b["id_a"].to_numpy(zero_copy_only=False))
        inv_chunks.append(b["id_b"].to_numpy(zero_copy_only=False))
    involved = np.unique(np.concatenate(inv_chunks or [np.array([], np.int64)]))
    if involved.size == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    inv_ref = ray.put(involved)
    # attach exchanges are candidate-sized: pick their partition count
    # from the MEASURED candidate count (cand is materialized), not the
    # corpus-sized band-sweep width — tiny candidate sets would
    # otherwise pay ~num_partitions empty-task overheads per sort
    attach_parts = int(np.clip(cand.count() // 50_000, 4, num_partitions))

    # plain TASK stage (closure over the broadcast ref, ray.get cached
    # per worker) — an actor pool here would add a second minimum-actor
    # CPU reservation next to the signature pool and livelock a 2-cpu
    # cluster
    _inv_cache: dict = {}

    def _inv_filter(b: pa.Table) -> pa.Table:
        inv = _inv_cache.get("inv")
        if inv is None:
            inv = ray.get(inv_ref)
            _inv_cache["inv"] = inv
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(inv, ids), max(len(inv) - 1, 0))
        return b.filter(pa.array(inv[pos] == ids))

    # materialized: involved-docs-only (candidate-proportional), and it
    # is consumed by BOTH attach phases — leaving it lazy would run the
    # signature actor pool once per consumer and pin an actor
    # reservation inside each attach execution
    payloads = (
        ds.map_batches(
            _inv_filter,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(
            _SignatureStage,
            fn_constructor_args=sig_args,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=concurrency,
        )
        .materialize()
    )

    LIST64 = pa.list_(pa.int64())

    def _null_list(n: int) -> pa.Array:
        return pa.array([None] * n, LIST64)

    def _null_i64(n: int) -> pa.Array:
        return pa.array([None] * n, pa.int64())

    def _payload_list(b: pa.Table) -> pa.Array:
        col = b[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.cast(LIST64) if col.type != LIST64 else col

    # ---- verification kernel (shared by both attach plans) ----------
    def _verify(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _EMPTY_PAIRS
        a_col, b_col = b["pa_pl"], b["pb_pl"]
        if isinstance(a_col, pa.ChunkedArray):
            a_col = a_col.combine_chunks()
        if isinstance(b_col, pa.ChunkedArray):
            b_col = b_col.combine_chunks()
        fa = a_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
        fb = b_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
        oa = a_col.offsets.to_numpy(zero_copy_only=False)
        ob = b_col.offsets.to_numpy(zero_copy_only=False)
        n = len(b)
        if verify == "estimate":
            jac = np.mean(
                fa.reshape(n, num_perm) == fb.reshape(n, num_perm), axis=1
            )
        else:
            jac = np.empty(n, dtype=np.float64)
            for i in range(n):
                jac[i] = hashed_jaccard(
                    fa[oa[i] : oa[i + 1]], fb[ob[i] : ob[i + 1]]
                )
        hit = jac >= threshold
        return pa.table(
            {
                "id_a": b["id_a"].filter(pa.array(hit)),
                "id_b": b["id_b"].filter(pa.array(hit)),
                "jaccard": pa.array(jac[hit], pa.float64()),
            }
        )

    # ---- attach plan: broadcast fast path ----------------------------
    # measured decision from block metadata (no data fetch): when the
    # involved-payload table is small — the common case, candidate-
    # proportional — ship it ONCE via ray.put and drop both sweep-join
    # exchanges (and their executor runs) entirely.
    if payloads.size_bytes() <= broadcast_payload_bytes:
        import logging

        logging.getLogger(__name__).info(
            "minhash_lsh_pairs: broadcast attach (%d B involved payloads)",
            payloads.size_bytes(),
        )
        ptbl = pa.concat_tables(
            [t for t in ray.get(payloads.to_arrow_refs()) if len(t)]
        )
        pl_all = _payload_list(ptbl)
        pids = pc.cast(ptbl[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(pids, kind="stable")
        pay_ref = ray.put((pids[order], pl_all.take(pa.array(order))))
        _pay_cache: dict = {}

        def _attach_broadcast(b: pa.Table) -> pa.Table:
            got = _pay_cache.get("p")
            if got is None:
                got = ray.get(pay_ref)
                _pay_cache["p"] = got
            pk, plists = got
            ia = pc.cast(b["id_a"], pa.int64()).to_numpy(zero_copy_only=False)
            ib = pc.cast(b["id_b"], pa.int64()).to_numpy(zero_copy_only=False)
            pos_a = np.minimum(np.searchsorted(pk, ia), max(len(pk) - 1, 0))
            pos_b = np.minimum(np.searchsorted(pk, ib), max(len(pk) - 1, 0))
            hit = (pk[pos_a] == ia) & (pk[pos_b] == ib)
            sel = np.flatnonzero(hit)
            return pa.table(
                {
                    "id_a": pa.array(ia[sel], pa.int64()),
                    "id_b": pa.array(ib[sel], pa.int64()),
                    "pa_pl": plists.take(pa.array(pos_a[sel])),
                    "pb_pl": plists.take(pa.array(pos_b[sel])),
                }
            )

        return cand.map_batches(
            _attach_broadcast, batch_format="pyarrow"
        ).map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)

    # ---- attach plan: two candidate-sized sweep-join exchanges -------
    # ---- attach phase A: route on id_a ------------------------------
    def _pairs_a(b: pa.Table) -> pa.Table:
        n = len(b)
        t = pa.table(
            {"k": b["id_a"], "other": b["id_b"], "pl": _null_list(n)}
        )
        return with_part(t, ["k"], attach_parts)

    def _payload_rows_a(b: pa.Table) -> pa.Table:
        n = len(b)
        t = pa.table(
            {
                "k": pc.cast(b[id_col], pa.int64()),
                "other": _null_i64(n),
                "pl": _payload_list(b),
            }
        )
        return with_part(t, ["k"], attach_parts)

    def _attach(g: pa.Table, carry: list[str]) -> tuple[pa.Table, pa.Array]:
        """Generic sweep: payload rows have null ``other``; look up each
        pair row's ``k`` in the partition's sorted payload ids."""
        is_pl = pc.is_null(g["other"]).to_numpy(zero_copy_only=False)
        ks = g["k"].to_numpy(zero_copy_only=False)
        pl_idx = np.flatnonzero(is_pl)
        order = np.argsort(ks[pl_idx], kind="stable")
        pk = ks[pl_idx][order]
        prow = pl_idx[order]
        pair_idx = np.flatnonzero(~is_pl)
        pos = np.minimum(np.searchsorted(pk, ks[pair_idx]), max(len(pk) - 1, 0))
        hit = (pk[pos] == ks[pair_idx]) if len(pk) else np.zeros(len(pair_idx), bool)
        pair_idx, pos = pair_idx[hit], pos[hit]
        pl = g["pl"]
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        looked = pl.take(pa.array(prow[pos]))
        cols = {c: g[c].take(pa.array(pair_idx)) for c in ["k", "other", *carry]}
        return pa.table(cols), looked

    def _attach_a(g: pa.Table) -> pa.Table:
        base, looked = _attach(g, [])
        return pa.table(
            {"id_a": base["k"], "id_b": base["other"], "pa_pl": looked}
        )

    # materialized: candidate-sized, and it splits the two attach
    # exchanges into separate executions — one union+sort graph each.
    # A single graph holding both sorts plus two unions livelocks the
    # streaming executor's per-operator resource reservation on very
    # small clusters (observed at num_cpus=4).
    routed_a = (
        cand.map_batches(_pairs_a, batch_format="pyarrow")
        .union(payloads.map_batches(_payload_rows_a, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(_attach_a, batch_format="pyarrow")
        .materialize()
    )

    # ---- attach phase B: route on id_b, carry payload_a -------------
    def _pairs_b(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": b["id_b"],
                "other": b["id_a"],
                "pa_pl": b["pa_pl"],
                "pl": _null_list(len(b)),
            }
        )
        return with_part(t, ["k"], attach_parts)

    def _payload_rows_b(b: pa.Table) -> pa.Table:
        n = len(b)
        t = pa.table(
            {
                "k": pc.cast(b[id_col], pa.int64()),
                "other": _null_i64(n),
                "pa_pl": _null_list(n),
                "pl": _payload_list(b),
            }
        )
        return with_part(t, ["k"], attach_parts)

    def _attach_b(g: pa.Table) -> pa.Table:
        base, looked = _attach(g, ["pa_pl"])
        return pa.table(
            {
                "id_a": base["other"],
                "id_b": base["k"],
                "pa_pl": base["pa_pl"],
                "pb_pl": looked,
            }
        )

    routed_b = (
        routed_a.map_batches(_pairs_b, batch_format="pyarrow")
        .union(payloads.map_batches(_payload_rows_b, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(_attach_b, batch_format="pyarrow")
    )

    # ---- verification: once per globally-distinct pair --------------
    return routed_b.map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True
    )

# ---------------------------------------------------------------------------
# n-gram Jaccard all-pairs (within LSH candidate buckets)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.3,
    **kw,
) -> ray.data.Dataset:
    """Near-dup pairs by exact word-n-gram Jaccard. Same engine as
    :func:`minhash_lsh_pairs` (the verification step IS exact n-gram
    Jaccard over the shingle sets) but tuned for recall: more
    permutations and narrower bands so lower-similarity pairs still
    collide in some band."""
    return minhash_lsh_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=kw.pop("num_perm", 128),
        bands=kw.pop("bands", 64),
        shingle_n=shingle_n,
        threshold=threshold,
        **kw,
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------


def simhash_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_partitions: int = 64,
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """Near-dup pairs by 64-bit SimHash, banded into 4×16-bit exact-match
    buckets (any pair within hamming ≤ 3 shares ≥1 exact band by
    pigeonhole when 4 bands ≥ max_hamming+1). Bucket sweep runs per
    coarse partition with a vectorized XOR-popcount kernel."""

    def _sig(batch: pa.Table) -> pa.Table:
        sigs = _batch_simhash(batch[text_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(sigs.view(np.int64)),
            }
        )

    signed = ds.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)

    def _bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(sig)
        b_idx = np.arange(4, dtype=np.uint64)
        band_val = ((sig[:, None] >> (np.uint64(16) * b_idx)) & np.uint64(0xFFFF)).astype(
            np.int64
        )
        bucket = band_val + (b_idx.astype(np.int64) << 32)[None, :]
        part = (bucket % num_partitions).astype(np.int32)
        rep = np.repeat(np.arange(n), 4)
        return pa.table(
            {
                "part": pa.array(part.reshape(-1)),
                "bucket": pa.array(bucket.reshape(-1)),
                id_col: batch[id_col].take(pa.array(rep)),
                "simhash": batch["simhash"].take(pa.array(rep)),
            }
        )

    banded = signed.map_batches(_bands, batch_format="pyarrow")

    def _part_pairs(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("bucket", "ascending")])
        g = group.take(order)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sigs = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        skipped = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > max_bucket:
                skipped += 1
                continue
            sub = np.argsort(ids[s:e], kind="stable") + s
            sv = sigs[sub]
            iv = ids[sub]
            # vectorized pairwise hamming for the bucket
            ham = _popcount64(sv[:, None] ^ sv[None, :])
            ai, bi = np.nonzero(np.triu(ham <= max_hamming, k=1))
            if not len(ai):
                continue
            keep = iv[ai] != iv[bi]
            out_a.append(iv[ai[keep]])
            out_b.append(iv[bi[keep]])
            out_d.append(ham[ai[keep], bi[keep]].astype(np.int32))
        _log_skipped("simhash_pairs", skipped, max_bucket)
        if out_a:
            aa = np.concatenate(out_a)
            bb = np.concatenate(out_b)
            dd = np.concatenate(out_d)
            # same pair from several buckets of this partition →
            # vectorized distinct (keep the first = min hamming is
            # identical per pair, so any representative works)
            _, first = np.unique(
                np.stack([aa, bb], axis=1), axis=0, return_index=True
            )
            aa, bb, dd = aa[first], bb[first], dd[first]
        else:
            aa = np.array([], np.int64)
            bb = np.array([], np.int64)
            dd = np.array([], np.int32)
        return pa.table(
            {
                "id_a": pa.array(aa, pa.int64()),
                "id_b": pa.array(bb, pa.int64()),
                "hamming": pa.array(dd, pa.int32()),
            }
        )

    pairs = banded.groupby("part").map_groups(_part_pairs, batch_format="pyarrow")
    agg = pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming"))
    return agg.map_batches(
        lambda b: pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "hamming": pc.cast(b["min(hamming)"], pa.int32()),
            }
        ),
        batch_format="pyarrow",
    )


def dup_graph_degree_hist(
    docs: ray.data.Dataset,
    threshold: float = 0.35,
) -> ray.data.Dataset:
    """Near-duplicate-graph degree profile: for every document involved
    in at least one near-dup pair, its pair count — histogrammed as
    (degree, n_docs).  The dedup-budget planner's first question: is
    the graph a sea of isolated pairs (keep one of each, cheap) or a
    few hub-and-spoke template families (cluster first, then pick)?
    Composes the exact-on-driver-corpora MinHash+LSH miner with two
    tiny exchanges: pair endpoints fan out 2×pairs rows → doc-keyed
    count → degree-keyed histogram; all int64.

    Output: (degree, n_docs).
    """
    from ray.data.aggregate import Sum

    pairs = minhash_lsh_pairs(docs, threshold=threshold)

    def _endpoints(b: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()]
        )
        t = pa.table({"doc_id": ids})
        g = t.group_by("doc_id").aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "n"])

    deg = (
        pairs.map_batches(_endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .sum("n")
    )

    def _hist_partial(b: pa.Table) -> pa.Table:
        d = pc.cast(b["sum(n)"], pa.int64())
        t = pa.table(
            {"degree": d, "n": pa.array(np.ones(len(b), np.int64))}
        )
        g = t.group_by("degree").aggregate([("n", "sum")])
        return g.rename_columns(["degree", "n"])

    agg = (
        deg.map_batches(_hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("degree")
        .aggregate(Sum("n"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "degree": pc.cast(b["degree"], pa.int64()),
                "n_docs": pc.cast(b["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def typo_dedup_pairs(
    docs: ray.data.Dataset,
    prefix_len: int = 24,
    num_partitions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """EXACT edit-distance-≤1 near-dup pairs on document prefixes —
    the deletion-neighborhood (FastSS / SymSpell) miner: every pair of
    docs whose first ``prefix_len`` characters are within Levenshtein
    distance 1 (doc_a < doc_b), with NO quadratic pass and NO
    approximation.

    Why it scales: ed(a,b) ≤ 1 ⟹ a and b share a 1-deletion variant
    (a substitution deletes the edited position from both; an
    insertion/deletion pair shares the shorter string itself), so
    emitting each doc under ≤ ``prefix_len + 1`` keys (its prefix +
    every single-deletion variant, all zero-padded into one fixed
    ``prefix_len``-byte key space) routes every true pair into at
    least one shared bucket — a ≤25× fan-out of slim keys vs the
    all-pairs join the SQL oracle runs.  A bucket collision CAN be ed 2
    (deletions at different positions), so every candidate pair is
    verified vectorized on fixed-width byte matrices: equal length →
    Hamming ≤ 1; length ± 1 → common-prefix + common-suffix ≥ shorter
    length.  Variant generation is ``prefix_len`` numpy column-slices
    per block — never a per-row loop; the only data-dependent loop is
    over buckets that actually collide (output-sized, like the pairs
    themselves — an all-identical corpus is quadratic in the SQL too).

    Byte-level semantics (documented): prefixes compare as UTF-8 code
    units — exact for ASCII corpora (this one); a multi-byte corpus
    needs codepoint-level keys on both sides of the gate.

    Two exchanges, both slim: (key → candidate buckets), then
    (pair → global dedupe, since one pair can collide in several
    buckets that live in different partitions).

    Output: (doc_a, doc_b) int64, one row per verified pair.
    """
    from .sweep import run_starts_table, with_part

    PL = int(prefix_len)

    def _mats(buf: pa.BinaryArray, lens: np.ndarray):
        """(left-aligned, end-aligned) zero-padded byte matrices."""
        n = len(lens)
        total = int(lens.sum())
        if total == 0:
            return np.zeros((n, PL), np.uint8), np.zeros((n, PL), np.uint8)
        # BinaryArray keeps offsets in buffers()[1] (int32; int64 for
        # large_binary) — slice by buf.offset for sliced arrays
        odt = np.int64 if pa.types.is_large_binary(buf.type) else np.int32
        off_all = np.frombuffer(buf.buffers()[1], odt)
        offs = off_all[buf.offset : buf.offset + n + 1].astype(np.int64)
        values = np.frombuffer(buf.buffers()[2], np.uint8)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        col_of = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[np.int64(0), np.cumsum(lens)[:-1]], lens
        )
        src = np.repeat(offs[:-1].astype(np.int64), lens) + col_of
        M = np.zeros((n, PL), np.uint8)
        M[row_of, col_of] = values[src]
        E = np.zeros((n, PL), np.uint8)
        E[row_of, col_of + np.repeat(PL - lens, lens)] = values[src]
        return M, E

    def _route(b: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(b[text_col], 0, PL)
        if isinstance(pre, pa.ChunkedArray):
            pre = pre.combine_chunks()
        buf = pre.cast(pa.binary())
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        lens = pc.binary_length(buf).to_numpy(zero_copy_only=False)
        n = len(ids)
        M, _ = _mats(buf, lens)
        key_blocks = [M]
        id_blocks = [ids]
        len_blocks = [lens]
        pre_blocks = [M]
        for d in range(PL):
            alive = lens > d
            if not alive.any():
                break
            V = np.zeros((int(alive.sum()), PL), np.uint8)
            V[:, :d] = M[alive, :d]
            V[:, d : PL - 1] = M[alive, d + 1 :]
            key_blocks.append(V)
            id_blocks.append(ids[alive])
            len_blocks.append(lens[alive])
            pre_blocks.append(M[alive])
        K = np.ascontiguousarray(np.vstack(key_blocks))
        keys = K.reshape(-1).view(f"S{PL}")
        t = pa.table(
            {
                "key": pa.array(keys),
                "doc_id": pa.array(np.concatenate(id_blocks)),
                "len": pa.array(np.concatenate(len_blocks).astype(np.int64)),
                "pre": pa.array(
                    np.ascontiguousarray(np.vstack(pre_blocks))
                    .reshape(-1)
                    .view(f"S{PL}")
                ),
            }
        )
        return with_part(t, ["key"], num_partitions)

    def _bucket_sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("key", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(idx)
        n = len(g)
        starts = run_starts_table(g, ["key"])
        bounds = np.r_[starts, n]
        sizes = np.diff(bounds)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        lens = g["len"].to_numpy(zero_copy_only=False)
        # Arrow stripped the numpy-'S' padding to logical bytes on the
        # way in — rebuild the fixed-width matrix by scatter
        pre = g["pre"]
        if isinstance(pre, pa.ChunkedArray):
            pre = pre.combine_chunks()
        Mat, _ = _mats(pre, lens)
        ai_list, bi_list = [], []
        for r in np.flatnonzero(sizes >= 2):
            lo, hi = bounds[r], bounds[r + 1]
            seg_ids = ids[lo:hi]
            uniq, upos = np.unique(seg_ids, return_index=True)
            if len(uniq) < 2:
                continue
            m = len(uniq)
            iu, ju = np.triu_indices(m, k=1)
            ai_list.append(lo + upos[iu])
            bi_list.append(lo + upos[ju])
        if not ai_list:
            return empty
        ai = np.concatenate(ai_list)
        bi = np.concatenate(bi_list)
        A, B = Mat[ai], Mat[bi]
        la, lb = lens[ai], lens[bi]
        eq = A == B
        ham = PL - eq.sum(axis=1)
        ok_eq = (la == lb) & (ham <= 1)
        # indel: common prefix + common suffix covers the shorter
        any_neq = ~eq
        p = np.where(any_neq.any(axis=1), np.argmax(any_neq, axis=1), PL)
        # end-aligned comparison via per-pair roll realignment
        EA = np.zeros_like(A)
        EB = np.zeros_like(B)
        cols = np.arange(PL)
        shift_a = (PL - la)[:, None]
        shift_b = (PL - lb)[:, None]
        maska = cols[None, :] >= shift_a
        maskb = cols[None, :] >= shift_b
        srca = np.clip(cols[None, :] - shift_a, 0, PL - 1)
        srcb = np.clip(cols[None, :] - shift_b, 0, PL - 1)
        EA[maska] = np.take_along_axis(A, srca, axis=1)[maska]
        EB[maskb] = np.take_along_axis(B, srcb, axis=1)[maskb]
        eqe = (EA == EB)[:, ::-1]
        any_neqe = ~eqe
        s = np.where(any_neqe.any(axis=1), np.argmax(any_neqe, axis=1), PL)
        ok_indel = (np.abs(la - lb) == 1) & (p + s >= np.minimum(la, lb))
        ok = ok_eq | ok_indel
        a_ok, b_ok = ids[ai[ok]], ids[bi[ok]]
        lo_id = np.minimum(a_ok, b_ok)
        hi_id = np.maximum(a_ok, b_ok)
        return pa.table({"doc_a": pa.array(lo_id), "doc_b": pa.array(hi_id)})

    cand = (
        docs.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_bucket_sweep, batch_format="pyarrow")
    )

    def _pair_route(b: pa.Table) -> pa.Table:
        return with_part(b, ["doc_a", "doc_b"], num_partitions)

    def _pair_unique(g: pa.Table) -> pa.Table:
        a = g["doc_a"].to_numpy(zero_copy_only=False)
        bb = g["doc_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        keep = np.ones(len(a), bool)
        keep[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array(bb[keep])}
        )

    return (
        cand.map_batches(_pair_route, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_pair_unique, batch_format="pyarrow")
    )


def prefix_filter_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.3,
    num_partitions: int = 64,
    max_posting: int = 1024,
    concurrency: int | tuple[int, int] = (1, 4),
    broadcast_payload_bytes: int = 256 << 20,
) -> ray.data.Dataset:
    """EXACT all-pairs Jaccard ≥ threshold by PREFIX FILTERING
    (AllPairs / PPJoin family, Bayardo et al. 2007) — the
    deterministic-recall alternative to :func:`minhash_lsh_pairs`:
    no signature, no probabilistic bucket misses; every qualifying
    pair is guaranteed a candidate.

    The lemma: under any single global token order, two sets with
    overlap ≥ α share a token within each side's first ``s − α + 1``
    tokens (the α-th smallest common token has ≤ α−1 common tokens
    after it).  J ≥ t ⟹ overlap ≥ ⌈t·s⌉ on both sides, so emitting
    only each doc's first ``s − ⌈t·s⌉ + 1`` grams (df-ascending order
    — rarest first, the candidate-minimizing canonical order; +1
    conservative slack so float ceil can never shorten the prefix)
    makes the gram-posting sweep an exact-superset candidate
    generator.  Three slim int64 exchanges, none carrying text:
    gram→df count, doc→prefix cut (both vectorized run sweeps), then
    prefix-posting pairs with the ``min ≥ t·max`` length filter.
    Oversized postings (degenerate near-constant corpora) are skipped
    LOUDLY via ``max_posting`` — same convention as the LSH engines'
    ``max_bucket``.  Verification reuses the shared candidate-sized
    attach+verify phase (:func:`_attach_verify_pairs`), so outputs are
    bit-identical to the LSH engine wherever LSH achieves full recall.

    Output: (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.
    """
    from .sweep import with_part

    def _gram_rows(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        flat, offs = _batch_shingles(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col,
            shingle_n,
        )
        sizes = np.diff(offs).astype(np.int64)
        rep = np.repeat(np.arange(len(batch)), sizes)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "g": pa.array(flat.view(np.int64)),
                "doc": pa.array(ids[rep]),
                "size": pa.array(sizes[rep]),
            }
        )
        return with_part(t, ["g"], num_partitions)

    def _df_sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "doc": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(g, sort_keys=[("g", "ascending")])
        g = g.take(idx)
        gv = g["g"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        lens = np.diff(np.r_[starts, len(gv)])
        df = np.repeat(lens, lens).astype(np.int64)
        out = pa.table(
            {
                "doc": g["doc"],
                "g": g["g"],
                "df": pa.array(df),
                "size": g["size"],
            }
        )
        return with_part(out, ["doc"], num_partitions)

    def _prefix_sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("doc", "ascending"),
                ("df", "ascending"),
                ("g", "ascending"),
            ],
        )
        g = g.take(idx)
        dv = g["doc"].to_numpy(zero_copy_only=False)
        sz = g["size"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]])
        lens = np.diff(np.r_[starts, len(dv)])
        pos = np.arange(len(dv), dtype=np.int64) - np.repeat(starts, lens)
        # conservative prefix: one longer than s − ⌈t·s⌉ + 1 so float
        # ceil can only ADD candidates, never drop a qualifying pair
        co = np.maximum(np.ceil(threshold * sz).astype(np.int64) - 1, 1)
        p = sz - co + 1
        keep = pos < p
        # df=1 grams legitimately OCCUPY prefix slots (they are the most
        # discriminative, shrinking the rest of the prefix) but can never
        # produce a candidate pair — the guaranteed shared token has
        # df ≥ 2 by definition, so their posting rows are pure dead
        # weight in the pair exchange
        keep &= g["df"].to_numpy(zero_copy_only=False) >= 2
        sub = g.filter(pa.array(keep))
        out = pa.table(
            {"g": sub["g"], "doc": sub["doc"], "size": sub["size"]}
        )
        return with_part(out, ["g"], num_partitions)

    def _posting_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("g", "ascending"), ("doc", "ascending")]
        )
        g = g.take(idx)
        gv = g["g"].to_numpy(zero_copy_only=False)
        dv = g["doc"].to_numpy(zero_copy_only=False)
        sz = g["size"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        ends = np.r_[starts[1:], len(gv)]
        lens = ends - starts
        skipped = int((lens > max_posting).sum())
        a_l: list[np.ndarray] = []
        b_l: list[np.ndarray] = []
        # batch runs by LENGTH: one triu per distinct posting size, all
        # runs of that size processed as a (runs, m) matrix — the
        # per-gram python loop disappears (≤ max_posting iterations)
        for m in np.unique(lens):
            if m < 2 or m > max_posting:
                continue
            sel = starts[lens == m]
            rows = (sel[:, None] + np.arange(m)[None, :]).ravel()
            dmat = dv[rows].reshape(len(sel), m)
            smat = sz[rows].reshape(len(sel), m)
            x, y = np.triu_indices(int(m), k=1)
            da, db = dmat[:, x].ravel(), dmat[:, y].ravel()
            sa, sb = smat[:, x].ravel(), smat[:, y].ravel()
            mn, mx = np.minimum(sa, sb), np.maximum(sa, sb)
            ok = (mn + 1e-9) >= threshold * mx  # exact-safe length filter
            ok &= da != db
            a_l.append(np.minimum(da[ok], db[ok]))
            b_l.append(np.maximum(da[ok], db[ok]))
        _log_skipped("prefix_filter_jaccard_pairs", skipped, max_posting)
        if not a_l:
            return empty
        ia, ib = np.concatenate(a_l), np.concatenate(b_l)
        if len(ia) == 0:
            return empty
        uniq = np.unique(np.stack([ia, ib], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    def _pair_route(b: pa.Table) -> pa.Table:
        return with_part(b, ["id_a", "id_b"], num_partitions)

    def _pair_unique(g: pa.Table) -> pa.Table:
        ia = g["id_a"].to_numpy(zero_copy_only=False)
        ib = g["id_b"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([ia, ib], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    # global pair dedup as a coarse-partition unique sweep — a 2-key
    # Aggregate here sorts the full candidate MULTISET (the low-threshold
    # hot spot: measured 35-42 s of the 80 s wall at t=0.3/sf0.1); the
    # hash-partitioned np.unique does the same dedup against an int32
    # part key
    cand = (
        ds.map_batches(_gram_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_df_sweep, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_prefix_sweep, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_posting_pairs, batch_format="pyarrow")
        .map_batches(_pair_route, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_pair_unique, batch_format="pyarrow")
        .materialize()
    )
    return _attach_verify_pairs(
        ds,
        cand,
        id_col=id_col,
        sig_args=(text_col, id_col, 8, shingle_n, 42),
        payload_col="shingles",
        verify="exact",
        num_perm=8,
        threshold=threshold,
        concurrency=concurrency,
        num_partitions=num_partitions,
        broadcast_payload_bytes=broadcast_payload_bytes,
    )
