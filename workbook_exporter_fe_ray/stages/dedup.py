"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Reference parity: the reference's only dedup is the per-row
"key already in the output file?" probe (``/root/reference/
workbook_exporter-fe.py:1741-1754``, SURVEY.md §2.3 ST2 / §2.4 J1) —
an O(rows × output) anti-join. Exact dedup here is the distributed
version: hash-partition on the key, first-in-group wins. The near-dup
family (MinHash/SimHash/Jaccard) is new capability for training-data
pipelines at 100 TB scale.

Scale notes:
- exact dedup shuffles only (key_hash, tie, payload-cols) — dedup on a
  long text column hashes it first so the shuffle moves 16-byte keys,
  not documents.
- MinHash+LSH is the classic shingle→signature→band→bucket pipeline:
  signatures are computed embarrassingly parallel in ``map_batches``;
  only (band_hash, doc_id, signature) rows shuffle — bounded by
  num_perm × 8 bytes per doc regardless of document size; candidate
  verification happens inside each band bucket group.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, keys: list[str], tie_col: str
) -> ray.data.Dataset:
    """Keep exactly one row per distinct ``keys`` — the one with the
    smallest ``tie_col`` (deterministic). Hash-partition + first-in-group."""

    def _first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(tie_col, "ascending")])
        return group.take(idx[:1])

    return ds.groupby(keys).map_groups(_first, batch_format="pyarrow")


def exact_dedup_by_content_hash(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Exact-content dedup on md5(text): returns (id_col=min id, content
    hash) per distinct content. The shuffle moves hashes, not documents."""

    def _hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({id_col: batch[id_col], "content_hash": pa.array(hashes)})

    hashed = ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)

    def _min_id(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: [pc.min(group[id_col]).as_py()],
                "content_hash": [group["content_hash"][0].as_py()],
            }
        )

    return hashed.groupby("content_hash").map_groups(_min_id, batch_format="pyarrow")


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


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable uint64 hashes of word n-gram shingles."""
    grams = sorted(word_ngrams(text, n))
    if not grams:
        return np.array([0], dtype=np.uint64)
    crcs = np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)
    return _splitmix64(crcs)


def minhash_signature(text: str, num_perm: int, shingle_n: int, seed: int) -> np.ndarray:
    """num_perm-wide MinHash signature via one-hash + per-perm mixing."""
    h = _shingle_hashes(text, shingle_n)  # (S,)
    with np.errstate(over="ignore"):
        salts = _splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed))
        # (S, P) permuted hashes — min over shingles per permutation
        perm = _splitmix64(h[:, None] ^ salts[None, :])
    return perm.min(axis=0)  # (P,)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (unweighted)."""
    words = text.split()
    if not words:
        return 0
    crcs = np.array([zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64)
    feats = _splitmix64(crcs)
    bits = (feats[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    counts = bits.sum(axis=0)
    vec = counts * 2 > len(words)
    return int(np.packbits(vec[::-1]).view(">u8")[0])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# ---------------------------------------------------------------------------


class _SignatureStage:
    """Actor-pool stage: signature params fixed once per actor."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, shingle_n: int, seed: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.shingle_n, self.seed = num_perm, shingle_n, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(t, self.num_perm, self.shingle_n, self.seed)
            for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                self.text_col: batch[self.text_col],
                "signature": pa.array(
                    [s.astype(np.int64) for s in sigs], pa.list_(pa.int64())
                ),
            }
        )


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
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    shingle → MinHash signature (actor pool) → per-band bucket groupby →
    exact n-gram Jaccard verification of in-bucket candidates → distinct
    pairs. Every step is deterministic (seeded)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    signed = ds.map_batches(
        _SignatureStage,
        fn_constructor_args=(text_col, id_col, num_perm, shingle_n, seed),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _band_rows(batch: pa.Table) -> pa.Table:
        ids, texts, bkeys = [], [], []
        sig_list = batch["signature"].to_pylist()
        id_list = batch[id_col].to_pylist()
        text_list = batch[text_col].to_pylist()
        for rid, rtext, sig in zip(id_list, text_list, sig_list):
            s = np.asarray(sig, dtype=np.int64).view(np.uint64)
            for b in range(bands):
                band = s[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashlib.blake2b(
                    band.tobytes() + b.to_bytes(2, "little"), digest_size=8
                ).hexdigest()
                ids.append(rid)
                texts.append(rtext)
                bkeys.append(bh)
        return pa.table(
            {"bucket": pa.array(bkeys), id_col: pa.array(ids), text_col: pa.array(texts)}
        )

    banded = signed.map_batches(_band_rows, batch_format="pyarrow")

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        out_a, out_b, out_j = [], [], []
        if 1 < n <= 64:  # skip degenerate giant buckets (logged upstream)
            ids = group[id_col].to_pylist()
            texts = group[text_col].to_pylist()
            order = np.argsort(ids, kind="stable")
            for i in range(n):
                for j in range(i + 1, n):
                    a, b = order[i], order[j]
                    if ids[a] == ids[b]:
                        continue
                    jac = ngram_jaccard(texts[a], texts[b], shingle_n)
                    if jac >= threshold:
                        out_a.append(ids[a])
                        out_b.append(ids[b])
                        out_j.append(jac)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    pairs = banded.groupby("bucket").map_groups(_bucket_pairs, batch_format="pyarrow")
    # distinct pairs (a pair can surface from several bands)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------


def simhash_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup pairs by 64-bit SimHash, banded into 4×16-bit exact-match
    buckets (any pair within hamming ≤ 3 shares ≥1 exact band by
    pigeonhole when 4 bands ≥ max_hamming+1)."""

    def _sig(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
            }
        )

    signed = ds.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)

    def _bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col]
        tables = []
        for b in range(4):
            band_val = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            tables.append(
                pa.table(
                    {
                        "bucket": pa.array(band_val + (b << 16) * 65536),
                        id_col: ids,
                        "simhash": batch["simhash"],
                    }
                )
            )
        return pa.concat_tables(tables)

    banded = signed.map_batches(_bands, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        n = len(group)
        if 1 < n <= 256:
            ids = group[id_col].to_pylist()
            sigs = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
            order = np.argsort(ids, kind="stable")
            for i in range(n):
                for j in range(i + 1, n):
                    a, b = order[i], order[j]
                    if ids[a] == ids[b]:
                        continue
                    d = int(bin(int(sigs[a]) ^ int(sigs[b])).count("1"))
                    if d <= 3:
                        out_a.append(ids[a])
                        out_b.append(ids[b])
                        out_d.append(d)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int32()),
            }
        )

    pairs = banded.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
