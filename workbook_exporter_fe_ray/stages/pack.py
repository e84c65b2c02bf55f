"""Sequence packing: concat-and-chunk the global token stream into
fixed-length context windows (the GPT-style pre-training packer).

Documents are laid end-to-end in ``doc_id`` order and the concatenated
token stream is cut into packs of exactly ``pack_len`` tokens; a
document that straddles a cut contributes one span row per pack it
touches.  Output is the *span map* ``(doc_id, pack_id, doc_off,
pack_off, span_len)`` — the shuffle-free recipe from which a writer can
assemble each pack by slicing token arrays locally.

Scale shape (10^12 docs): the global ordered prefix-sum is done as a
classic two-level scan —

1. one streaming pass over the pruned ``(doc_id, n)`` projection
   computes per-*range-bucket* token sums (``P`` tiny rows to the
   driver),
2. the driver prefix-sums those ``P`` numbers into bucket base
   offsets (broadcast in a closure),
3. each bucket then sorts only its own slice by ``doc_id`` and emits
   its span rows fully vectorized (``np.repeat`` fan-out).

Buckets are **order-preserving** ranges of ``doc_id`` (not hashes), so
bucket-local prefix sums + the bucket base offset equal the global
scan.  No stage ever materializes more than one bucket; the exchange
carries 16-byte ``(id, n)`` rows, never tokens.  The id range is found
with one cheap associative min/max pass — pass ``id_range=(lo, hi)``
to skip it when known (e.g. from the manifest of a previous stage).

Reference parity: beyond-reference — the reference exports rows 1:1
(workbook_exporter-fe.py:1741-1788); packing is the canonical
training-data batcher over the same tokenized-sequence table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _span_fanout(
    ids: np.ndarray, s: np.ndarray, n: np.ndarray, pack_len: int
) -> pa.Table:
    """Vectorized span emission for docs with global starts ``s``."""
    L = np.int64(pack_len)
    keep = n > 0
    ids, s, n = ids[keep], s[keep], n[keep]
    p0 = s // L
    p1 = (s + n - 1) // L
    cnt = p1 - p0 + 1
    total = int(cnt.sum())
    rep = np.repeat(np.arange(len(n), dtype=np.int64), cnt)
    cc = np.cumsum(cnt) - cnt
    p = p0[rep] + (np.arange(total, dtype=np.int64) - cc[rep])
    sr, nr = s[rep], n[rep]
    lo = np.maximum(sr, p * L)
    hi = np.minimum(sr + nr, (p + 1) * L)
    return pa.table(
        {
            "doc_id": pa.array(ids[rep], pa.int64()),
            "pack_id": pa.array(p, pa.int64()),
            "doc_off": pa.array(lo - sr, pa.int64()),
            "pack_off": pa.array(lo - p * L, pa.int64()),
            "span_len": pa.array(hi - lo, pa.int64()),
        }
    )


def sequence_pack_spans(
    docs: ray.data.Dataset,
    pack_len: int = 256,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_col: str | None = None,
    id_range: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Span map of fixed-length packing in global ``id_col`` order.

    ``n_col`` names a precomputed token-count column (the engine's own
    ``(doc_id, tokens, n_tok, source)`` table); otherwise counts are
    whitespace tokens of ``text_col`` (``string_split(text, ' ')``
    convention, matching the token_count oracle).
    """
    from ray.data.aggregate import Max, Min, Sum

    def _counts(b: pa.Table) -> pa.Table:
        if n_col is not None:
            n = pc.cast(b[n_col], pa.int64())
        else:
            n = pc.cast(
                pc.list_value_length(pc.split_pattern(b[text_col], " ")),
                pa.int64(),
            )
        return pa.table({"id": pc.cast(b[id_col], pa.int64()), "n": n})

    # The (id, n) projection feeds up to three passes (id-range scan,
    # bucket sums, span emission); materialize it ONCE — 16 B/doc,
    # object-store-spillable — instead of re-executing the upstream
    # pipeline per pass.
    counts = docs.map_batches(
        _counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if id_range is None:
        mm = counts.aggregate(Min("id"), Max("id"))
        lo_id, hi_id = int(mm["min(id)"]), int(mm["max(id)"])
    else:
        lo_id, hi_id = int(id_range[0]), int(id_range[1])
    span = max(hi_id - lo_id + 1, 1)
    P = int(num_partitions)

    def _bucket(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        bk = ((ids - lo_id) * P) // span
        return b.append_column("__bucket", pa.array(bk.astype(np.int32)))

    bucketed = counts.map_batches(_bucket, batch_format="pyarrow")

    # two-level scan, level 1: P bucket sums to the driver (tiny)
    sums = bucketed.groupby("__bucket").aggregate(Sum("n")).take_all()
    base = np.zeros(P, dtype=np.int64)
    per = np.zeros(P, dtype=np.int64)
    for r in sums:
        per[int(r["__bucket"])] = int(r["sum(n)"])
    base[1:] = np.cumsum(per)[:-1]

    def _emit(g: pa.Table) -> pa.Table:
        bk = int(g["__bucket"][0].as_py())
        idx = pc.sort_indices(g, sort_keys=[("id", "ascending")])
        g = g.take(idx)
        n = g["n"].to_numpy(zero_copy_only=False)
        s = (np.cumsum(n) - n) + base[bk]
        ids = g["id"].to_numpy(zero_copy_only=False)
        return _span_fanout(ids, s, n, pack_len)

    return bucketed.groupby("__bucket").map_groups(_emit, batch_format="pyarrow")


_EMPTY_CUT = pa.table(
    {
        "pack_id": pa.array([], pa.int64()),
        "pack_off": pa.array([], pa.int64()),
        "toks": pa.array([], pa.list_(pa.int32())),
        "n_spans": pa.array([], pa.int64()),
        "complete": pa.array([], pa.bool_()),
    }
)


def cut_bucket_packs(
    g: pa.Table,
    b0: int,
    pack_len: int,
    drop_dup_ids: bool = False,
    id_col: str = "id",
    toks_col: str = "toks",
) -> pa.Table:
    """Cut one order-bucket's docs into packs.

    ``g`` holds all docs of one contiguous id range; ``b0`` is the
    bucket's global token offset.  Sorts by ``id_col`` (optionally
    dropping duplicate-id rows — they are byte-identical by contract),
    flattens — the flat values ARE the bucket's window ``[b0,
    b0+tot)`` of the global token stream — and cuts packs straight out
    of it with zero copies beyond the flatten.  Rows fully inside the
    window get ``complete=True``; the ≤2 boundary fragments carry
    ``pack_off`` for cross-bucket stitching.
    """
    L = np.int64(pack_len)
    idx = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
    g = g.take(idx)
    if drop_dup_ids:
        from .sweep import run_starts_table

        g = g.take(pa.array(run_starts_table(g, [id_col])))
    toks = g[toks_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    tot = int(n.sum())
    if tot == 0:
        return _EMPTY_CUT
    if tot > np.iinfo(np.int32).max:
        raise ValueError(
            f"bucket holds {tot} tokens > int32 list-offset limit; "
            "raise num_partitions"
        )
    keep = n > 0
    s_abs = (np.cumsum(n) - n)[keep] + b0  # doc starts, sorted
    e_abs = s_abs + n[keep]                # doc ends, also sorted
    p_lo = b0 // L
    p_hi = (b0 + tot - 1) // L
    packs = np.arange(p_lo, p_hi + 1, dtype=np.int64)
    a = np.maximum(packs * L, b0)
    b_ = np.minimum((packs + 1) * L, b0 + tot)
    complete = (packs * L >= b0) & ((packs + 1) * L <= b0 + tot)
    offs = np.empty(len(packs) + 1, dtype=np.int32)
    offs[0] = 0
    np.cumsum(b_ - a, out=offs[1:])
    lst = pa.ListArray.from_arrays(pa.array(offs), pa.array(flat, pa.int32()))
    # docs overlapping [a, b): starts before b AND ends after a
    nsp = np.searchsorted(s_abs, b_, side="left") - np.searchsorted(
        e_abs, a, side="right"
    )
    return pa.table(
        {
            "pack_id": pa.array(packs, pa.int64()),
            "pack_off": pa.array(a - packs * L, pa.int64()),
            "toks": lst,
            "n_spans": pa.array(nsp.astype(np.int64), pa.int64()),
            "complete": pa.array(complete),
        }
    )


def stitch_fragments(frows: list[dict]) -> pa.Table:
    """Driver-side assembly of cross-bucket boundary fragments (tiny:
    ≤2 rows × ≤pack_len tokens per bucket)."""
    frows = sorted(frows, key=lambda r: (int(r["pack_id"]), int(r["pack_off"])))
    b_ids: list[int] = []
    b_toks: list[np.ndarray] = []
    b_nsp: list[int] = []
    for r in frows:
        pid = int(r["pack_id"])
        t = np.asarray(r["toks"], dtype=np.int32)
        if b_ids and b_ids[-1] == pid:
            b_toks[-1] = np.concatenate([b_toks[-1], t])
            b_nsp[-1] += int(r["n_spans"])
        else:
            b_ids.append(pid)
            b_toks.append(t)
            b_nsp.append(int(r["n_spans"]))
    return pa.table(
        {
            "pack_id": pa.array(b_ids, pa.int64()),
            "tokens": pa.array([t.tolist() for t in b_toks], pa.list_(pa.int32())),
            "n_spans": pa.array(b_nsp, pa.int64()),
        }
    )


def doc_rank_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """int64 ``rank`` for the synthetic ``"src-III-SSSSSSSSSSSS"`` ids:
    ``src_idx << 44 | seq`` — lexicographic doc_id order, as one
    vectorized slice+cast (no per-row parsing)."""
    ids = b[id_col]
    src = pc.cast(pc.utf8_slice_codeunits(ids, 4, 7), pa.int64())
    seq = pc.cast(pc.utf8_slice_codeunits(ids, 8, 20), pa.int64())
    rank = pc.bit_wise_or(pc.shift_left(src, 44), seq)
    return b.append_column("rank", pc.cast(rank, pa.int64()))


def assemble_packs(
    docs: ray.data.Dataset,
    pack_len: int = 256,
    num_partitions: int = 32,
    pack_partitions: int = 32,
    id_col: str = "rank",
    tokens_col: str = "tokens",
    n_col: str | None = None,
    docs_slim: ray.data.Dataset | None = None,
    drop_dup_ids: bool = False,
    dedup_slim_ids: bool = False,
    id_range: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Materialized packer: emits ``(pack_id, tokens, n_spans)`` where
    ``tokens`` is the actual ``pack_len``-token window cut from the
    concatenated corpus in ``id_col`` order (last pack ragged).

    Every row satisfies exact token-array equality against the input —
    the north-rule invariant — asserted in
    ``tests/test_packed_property.py``.

    Scale shape: the span arithmetic runs on the pruned ``(id, n)``
    projection — **pass ``docs_slim``** as a tokens-free read (its
    ``n_col`` carrying the token count) so the two scan passes
    (id-range min/max, bucket sums) never load or shuffle payload.
    Without it, each scan pass re-executes the full ``docs`` pipeline.
    Tokens then move through exactly ONE exchange — the order-bucket
    sort that lines docs up in global order.  A bucket's flattened
    token values are its contiguous window of the global stream, so
    interior packs are cut out locally with zero copies beyond the
    flatten; only the ≤2 boundary fragments per bucket (≤ ``pack_len``
    tokens each) cross buckets, and those are stitched on the driver
    (``P × 2`` tiny rows — no second all-to-all).
    ``pack_partitions`` is retained for API compatibility and unused.
    With ``drop_dup_ids=True``, byte-identical
    duplicate rows (same id) are dropped inside the slice sweep — same
    id → same bucket, adjacent after the sort — so only the 16-byte
    slim rows need deduplication, never the token payload. Pass
    ``dedup_slim_ids=True`` to fold that slim dedup INTO the
    bucket-sum exchange (same id → same bucket → same group; rows are
    byte-identical by the same contract, so any representative works)
    instead of running a separate ``exact_dedup`` exchange first —
    one fewer all-to-all and one fewer executor run on the slim side.
    With ``dedup_slim_ids=False``, ``docs_slim`` must already be
    id-unique.  All slicing is
    one flat-values gather (``np.repeat``/``arange`` index build, no
    per-row Python).  Group tasks are plain functions (autoscaling
    task pool), ``num_partitions`` / ``pack_partitions`` bound
    per-task memory to corpus_tokens/P.
    """
    if dedup_slim_ids and not drop_dup_ids:
        # the bucket base offsets would come from DEDUPED slim sums while
        # the token side kept its duplicates -> packs cut at wrong global
        # positions; the invariant is paired by contract (ADVICE r3)
        raise ValueError("dedup_slim_ids=True requires drop_dup_ids=True")
    slim = docs_slim if docs_slim is not None else docs
    slim_n = n_col if (docs_slim is not None and n_col is not None) else None

    def _counts(b: pa.Table) -> pa.Table:
        if slim_n is not None:
            n = pc.cast(b[slim_n], pa.int64())
        else:
            toks = b[tokens_col]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            n = pc.cast(pc.list_value_length(toks), pa.int64())
        t = pa.table({"id": pc.cast(b[id_col], pa.int64()), "n": n})
        if dedup_slim_ids:  # per-block partial: shrink the exchange
            ids = t["id"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            keep = order[np.r_[True, ids[order][1:] != ids[order][:-1]]]
            t = t.take(pa.array(np.sort(keep)))
        return t

    # Two scan passes (id range, bucket sums) read this projection;
    # materialize once (16 B/doc, spillable) so the slim pipeline —
    # which may itself contain a dedup exchange — runs a single time.
    counts = slim.map_batches(
        _counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from ray.data.aggregate import Max, Min, Sum

    if id_range is None:
        mm = counts.aggregate(Min("id"), Max("id"))
        lo_id, hi_id = int(mm["min(id)"]), int(mm["max(id)"])
    else:
        lo_id, hi_id = int(id_range[0]), int(id_range[1])
    span = max(hi_id - lo_id + 1, 1)
    P = int(num_partitions)
    L = np.int64(pack_len)

    def _bucket_of(ids: np.ndarray) -> np.ndarray:
        return (((ids - lo_id) * P) // span).astype(np.int32)

    def _bucket_counts(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(_bucket_of(ids)))

    if dedup_slim_ids:
        # dedup folded into the bucket-sum group: same id → same bucket
        def _dedup_sum(g: pa.Table) -> pa.Table:
            ids = g["id"].to_numpy(zero_copy_only=False)
            n = g["n"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            keep = np.r_[True, ids[order][1:] != ids[order][:-1]]
            return pa.table(
                {
                    "__bucket": g["__bucket"].slice(0, 1),
                    "sum(n)": pa.array([int(n[order][keep].sum())], pa.int64()),
                }
            )

        sums = (
            counts.map_batches(_bucket_counts, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_dedup_sum, batch_format="pyarrow")
            .take_all()
        )
    else:
        sums = (
            counts.map_batches(_bucket_counts, batch_format="pyarrow")
            .groupby("__bucket")
            .aggregate(Sum("n"))
            .take_all()
        )
    base = np.zeros(P, dtype=np.int64)
    per = np.zeros(P, dtype=np.int64)
    for r in sums:
        per[int(r["__bucket"])] = int(r["sum(n)"])
    base[1:] = np.cumsum(per)[:-1]

    def _bucket_docs(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "toks": b[tokens_col],
                "__bucket": pa.array(_bucket_of(ids)),
            }
        )

    def _slice(g: pa.Table) -> pa.Table:
        bk = int(g["__bucket"][0].as_py())
        return cut_bucket_packs(g, int(base[bk]), pack_len, drop_dup_ids)

    # ONE token exchange (the order-bucket sort). The materialize() is
    # not an extra cost: the all-to-all it replaces is itself a full
    # materialization barrier — here the blocks just stay put instead
    # of moving a second time.
    sliced = (
        docs.map_batches(_bucket_docs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(_slice, batch_format="pyarrow")
        .materialize()
    )

    def _completes(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["complete"], True))
        toks = t["toks"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table(
            {
                "pack_id": t["pack_id"],
                "tokens": pc.cast(toks, pa.list_(pa.int32())),
                "n_spans": t["n_spans"],
            }
        )

    def _frags(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["complete"], False))

    completes = sliced.map_batches(
        _completes, batch_format="pyarrow", zero_copy_batch=True
    )
    # boundary fragments: ≤2 per bucket, ≤pack_len tokens each → tiny;
    # assembled on the driver (the only cross-bucket stitching needed)
    frows = sliced.map_batches(
        _frags, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    boundary_tbl = stitch_fragments(frows)
    if len(boundary_tbl) == 0:
        return completes
    return completes.union(ray.data.from_arrow(boundary_tbl))


def pack_fill_stats(spans: ray.data.Dataset) -> ray.data.Dataset:
    """Per-pack occupancy: ``(pack_id, n_docs, filled)`` — every pack is
    exactly ``pack_len`` full except the final one.  Associative
    groupby over the span map (pack_id cardinality = tokens/pack_len,
    bounded rows per key = docs touching the pack)."""
    from ray.data.aggregate import Count, Sum

    agg = spans.groupby("pack_id").aggregate(Count(), Sum("span_len"))

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pack_id": pc.cast(b["pack_id"], pa.int64()),
                "n_docs": pc.cast(b["count()"], pa.int64()),
                "filled": pc.cast(b["sum(span_len)"], pa.int64()),
            }
        )

    return agg.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)


def token_vocab_hist(
    docs: ray.data.Dataset,
    tokens_col: str = "tokens",
    vocab_size: int | None = None,
    reduce_fanin: int = 256,
) -> ray.data.Dataset:
    """Corpus-wide token-id frequency (the vocabulary histogram /
    unigram stats a tokenizer audit needs) with NO keyed exchange at
    all: token ids are a dense bounded domain, so each block folds its
    flattened ``list<int32>`` values into one dense ``np.bincount``
    vector (8 B × vocab), and vectors tree-reduce — two vectorized
    ``map_batches`` stages summing ``reduce_fanin`` vectors each (a
    100 TB corpus at 128 MB blocks → ~10^6 vectors → ~4000 → ~16 —
    then one driver-side sum of the survivors.  A keyed
    groupby-by-token-id would shuffle vocab × blocks rows and, worse,
    Ray's sort-aggregate degrades badly on many-distinct-key inputs at
    low parallelism (measured 74 s for 300k partial rows at 2 cpus vs
    0.4 s for this plan).

    ``vocab_size`` pre-sizes the vectors; otherwise each block sizes to
    its own max id and shorter vectors zero-pad at merge.  Output:
    (token_id, n_occ), one row per distinct id.
    """

    def _partial(b: pa.Table) -> pa.Table:
        toks = b[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        cnt = np.bincount(flat, minlength=int(vocab_size or 0)).astype(np.int64)
        return pa.table({"cnt": pa.array([cnt.tobytes()], pa.binary())})

    def _merge_batch(b: pa.Table) -> pa.Table:
        vecs = [np.frombuffer(x, dtype=np.int64) for x in b["cnt"].to_pylist()]
        if not vecs:
            return b
        width = max(len(v) for v in vecs)
        total = np.zeros(width, dtype=np.int64)
        for v in vecs:
            total[: len(v)] += v
        return pa.table({"cnt": pa.array([total.tobytes()], pa.binary())})

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for _ in range(2):
        partials = partials.map_batches(
            _merge_batch, batch_format="pyarrow", batch_size=reduce_fanin
        )

    total: np.ndarray | None = None
    for row in partials.iter_rows():
        v = np.frombuffer(row["cnt"], dtype=np.int64)
        if total is None:
            total = v.copy()
        elif len(v) > len(total):
            v = v.copy()
            v[: len(total)] += total
            total = v
        else:
            total[: len(v)] += v
    if total is None:
        total = np.zeros(0, dtype=np.int64)
    nz = np.flatnonzero(total)
    return ray.data.from_arrow(
        pa.table(
            {
                "token_id": pa.array(nz.astype(np.int64)),
                "n_occ": pa.array(total[nz]),
            }
        )
    )


def token_bigram_topk(
    docs: ray.data.Dataset,
    tokens_col: str = "tokens",
    k: int = 20,
) -> ray.data.Dataset:
    """Top-k adjacent token-id bigrams across the corpus — the
    token-axis co-occurrence statistic (tokenizer merge audits, LM
    data profiling). Deterministic order: count DESC, then (a, b) ASC.

    Shape: per block, the flattened ``list<int32>`` values form every
    in-doc adjacent pair as ONE composite int64 (``a << 32 | b``, no
    cross-doc pairs — the last token of a doc pairs with nothing);
    ``np.unique`` folds the block to (composite, count) partials, so
    the exchange carries distinct-bigram rows (bounded by vocab², in
    practice ≪ tokens), and an associative groupby-sum + tiny top-k
    finishes. No per-row Python, no payload shuffle.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        toks = b[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # rebase: flatten() of a sliced ListArray
        if len(flat) == 0:
            return pa.table(
                {"bg": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        pair = (flat[:-1] << 32) | flat[1:]
        # drop cross-doc pairs: positions just before each doc start
        valid = np.ones(len(pair), dtype=bool)
        ends = offs[1:-1] - 1  # last-token index of every doc but the final one
        valid[ends[(ends >= 0) & (ends < len(pair))]] = False
        uniq, cnt = np.unique(pair[valid], return_counts=True)
        return pa.table(
            {"bg": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bg")
        .aggregate(Sum("n"))
    )

    def _split(b: pa.Table) -> pa.Table:
        bg = b["bg"].to_numpy(zero_copy_only=False)
        n = pc.cast(b["sum(n)"], pa.int64())
        return pa.table(
            {
                "tok_a": pa.array(bg >> 32, pa.int64()),
                "tok_b": pa.array(bg & 0xFFFFFFFF, pa.int64()),
                "n_pairs": n,
            }
        )

    out = agg.map_batches(_split, batch_format="pyarrow")
    return out.sort(
        ["n_pairs", "tok_a", "tok_b"], descending=[True, False, False]
    ).limit(k)


def seq_bigram_repetition(
    docs: ray.data.Dataset,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Intra-sequence token repetition (the token-id twin of the
    Gopher duplicate-n-gram rule, Rae et al. 2021 §A1.1): per
    sequence, the count of adjacent token-id bigrams, the count of
    DISTINCT bigrams, and the duplicate fraction — the pre-training
    screen for degenerate / looping sequences.

    Map-side kernel: flatten the ``list<int32>`` block once, composite
    int64 pairs (``a << 32 | b``) with cross-doc positions masked via
    the rebased list offsets, then ONE lexsort per block counts
    distinct pairs per doc (runs of equal (doc, pair) in the sorted
    order) — zero per-row Python. The synthetic corpus carries exact
    duplicate rows (same doc_id, same tokens), so the slim per-doc
    stats (24 B/doc — never tokens) are collapsed by an associative
    Min groupby: every copy yields identical stats, making the
    exchange a pure dedup. The duplicate fraction is one
    f8(int)/f8(int) division, bit-exact vs the SQL DISTINCT
    formulation; single-token sequences have no bigram and are
    dropped on both sides.

    Output: (doc_id, n_pairs, n_distinct, dup_frac).
    """
    from ray.data.aggregate import Min

    def _partial(b: pa.Table) -> pa.Table:
        toks = b[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        npairs = np.maximum(lens - 1, 0)
        keep_doc = npairs >= 1
        if len(flat) < 2 or not keep_doc.any():
            return pa.table(
                {
                    "doc_id": pa.array([], b[id_col].type),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                }
            )
        pair = (flat[:-1] << 32) | flat[1:]
        valid = np.ones(len(pair), dtype=bool)
        ends = offs[1:-1] - 1  # last-token index of every doc but the final one
        valid[ends[(ends >= 0) & (ends < len(pair))]] = False
        didx = np.repeat(np.arange(len(b), dtype=np.int64), npairs)
        pv = pair[valid]
        order = np.lexsort((pv, didx))
        dp, pp = didx[order], pv[order]
        new = np.r_[True, (dp[1:] != dp[:-1]) | (pp[1:] != pp[:-1])]
        # docs are contiguous runs of the sorted order; distinct pairs
        # per doc = sum of `new` within the doc's run
        dstarts = np.r_[0, np.flatnonzero(dp[1:] != dp[:-1]) + 1]
        nd = np.add.reduceat(new.astype(np.int64), dstarts)
        nd_full = np.zeros(len(b), dtype=np.int64)
        nd_full[dp[dstarts]] = nd
        ki = np.flatnonzero(keep_doc)
        return pa.table(
            {
                "doc_id": b[id_col].take(pa.array(ki)),
                "n_pairs": pa.array(npairs[ki], pa.int64()),
                "n_distinct": pa.array(nd_full[ki], pa.int64()),
            }
        )

    slim = docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = slim.groupby("doc_id").aggregate(Min("n_pairs"), Min("n_distinct"))

    def _finish(b: pa.Table) -> pa.Table:
        np_k = pc.cast(b["min(n_pairs)"], pa.int64()).to_numpy(zero_copy_only=False)
        nd_k = pc.cast(b["min(n_distinct)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_pairs": pa.array(np_k, pa.int64()),
                "n_distinct": pa.array(nd_k, pa.int64()),
                "dup_frac": pa.array(
                    (np_k - nd_k).astype(np.float64) / np_k.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def vocab_coverage_topk(
    docs: ray.data.Dataset,
    ks: tuple[int, ...] = (10, 100, 1000),
    tokens_col: str = "tokens",
) -> "pa.Table":
    """Vocabulary-coverage planner: what fraction of all token
    occurrences the top-k most frequent token ids cover — the question
    answered before choosing a vocab truncation ("does a 1k vocab keep
    99% of mass?").  Builds on :func:`token_vocab_hist`'s dense
    bincount tree-reduce (no keyed exchange), then the vocab-domain-
    sized histogram sorts driver-side by (count desc, token id) — the
    sum of the top k is TIE-ROBUST (boundary ties have equal counts,
    so any tie order yields the same sum).  Coverage is the single
    pinned int/int division.

    Returns a driver-side pa.Table (k, topk_occ, total_occ, coverage)
    — ks-sized, never data-sized.
    """
    hist = token_vocab_hist(docs, tokens_col=tokens_col)
    parts = [
        b
        for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")
        if len(b)
    ]
    if not parts:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "topk_occ": pa.array([], pa.int64()),
                "total_occ": pa.array([], pa.int64()),
                "coverage": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(parts)
    n = t["n_occ"].to_numpy(zero_copy_only=False)
    tok = t["token_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -n))  # count desc, token id asc
    sn = n[order]
    cum = np.cumsum(sn)
    total = np.int64(cum[-1])
    rows_k, rows_top = [], []
    for k in ks:
        topk = np.int64(cum[min(int(k), len(cum)) - 1]) if len(cum) else np.int64(0)
        rows_k.append(np.int64(k))
        rows_top.append(topk)
    f = np.float64
    cov = np.array([f(x) / f(total) for x in rows_top], np.float64)
    return pa.table(
        {
            "k": pa.array(rows_k, pa.int64()),
            "topk_occ": pa.array(rows_top, pa.int64()),
            "total_occ": pa.array([total] * len(ks), pa.int64()),
            "coverage": pa.array(cov, pa.float64()),
        }
    )
