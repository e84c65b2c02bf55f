"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Reference parity: the reference's string toolkit (split-on-comma
``/root/reference/workbook_exporter-fe.py:660``, lowercase+substring
classify ``:1006-1011``, f-string keys ``:282`` — SURVEY.md §2.8) maps
to the vectorized kernels here; the substring classifier F9 is the
direct ancestor of ``lang_id`` (derive a label from content).

All kernels are batch-vectorized (pyarrow.compute where the op exists,
numpy otherwise); compiled state (stopword tables, BPE-ish regex) is
built once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# whitespace-token split is the contract shared with the SQL oracle
# (string_split(text, ' ')); \S+ on single-space-joined corpora is identical
_BPE_ISH = re.compile(r"\w+|[^\w\s]+")

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "dans"},
}


def _count_in_set_per_doc(toks: pa.Array | pa.ChunkedArray, words: set[str]) -> np.ndarray:
    """Per-document count of tokens in ``words`` — one vectorized
    ``is_in`` over the flattened token lists + a reduceat per doc."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    hits = pc.is_in(flat, value_set=pa.array(sorted(words))).to_numpy(
        zero_copy_only=False
    )
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    out = np.zeros(len(toks), dtype=np.int64)
    nonempty = np.diff(offs) > 0
    if hits.size:
        sums = np.add.reduceat(hits.astype(np.int64), offs[:-1][nonempty])
        out[nonempty] = sums
    return out


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per document (matches string_split(text,' '))."""
    toks = pc.split_pattern(batch[text_col], " ")
    return batch.append_column("n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))


class TokenCounter:
    """Actor-pool stage: BPE-ish regex token counting (regex compiled once
    per actor — the stateful-setup template)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pattern = _BPE_ISH  # compiled at import; held per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            len(self.pattern.findall(t)) for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features: word count, avg word length, stopword ratio.

    avg_word_len = chars-without-spaces / words as one float64 division of
    exact ints — deterministic and SQL-reproducible.
    """
    text = batch[text_col]
    toks = pc.split_pattern(text, " ")
    n_words = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    nospace = pc.cast(
        pc.utf8_length(pc.replace_substring(text, " ", "")), pa.int64()
    )
    avg_word_len = pc.divide(
        pc.cast(nospace, pa.float64()), pc.cast(n_words, pa.float64())
    )

    n_stop = _count_in_set_per_doc(toks, _STOPWORDS["en"])
    stop_ratio = pc.divide(
        pc.cast(pa.array(n_stop, pa.int64()), pa.float64()),
        pc.cast(n_words, pa.float64()),
    )
    out = batch
    for name, col in [
        ("n_words", n_words),
        ("n_chars_text", n_chars),
        ("avg_word_len", avg_word_len),
        ("stopword_ratio", stop_ratio),
    ]:
        out = out.append_column(name, col)
    return out


class LangId:
    """Heuristic language ID: stopword hit-rate per language (actor-pool
    stage; tables built once per actor). Deterministic tie-break by
    language code; 'und' when nothing matches.

    Tokenization is a SINGLE-SPACE split by design — the engine-wide
    token contract shared with the SQL oracles (``string_split(text,
    ' ')``), NOT Python ``str.split()`` whitespace semantics: a token
    containing tabs/newlines is not split further, so such a token
    never matches a stopword. Corpora joined on single spaces (all
    driver testdata) are unaffected; for raw whitespace-y text, pass it
    through a normalizer first or use ``split_pattern_regex(r'\\s+')``
    as :func:`..stages.dedup._batch_shingles` does."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tables = {k: frozenset(v) for k, v in sorted(_STOPWORDS.items())}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch[self.text_col]), " ")
        names = list(self.tables)  # sorted at construction
        scores = np.stack(
            [_count_in_set_per_doc(toks, self.tables[lang]) for lang in names]
        )  # (n_langs, n_docs)
        best = scores.argmax(axis=0)  # first max wins → tie-break by code
        langs = np.array(names, dtype=object)[best]
        langs[scores.max(axis=0) == 0] = "und"
        return batch.append_column(
            "lang_pred", pa.array(langs.tolist(), pa.string())
        )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Two fingerprints per doc: md5 hex (exact, SQL-matchable) and a
    Karp–Rabin rolling hash (base 256 mod 2^61-1) over bytes.

    Base 256 makes the polynomial equal the document's big-endian
    integer value, so the whole hash is ONE C-speed big-int modulo
    instead of a per-byte Python loop; the rolling update property
    (h' = (h*256 + b) mod p) is unchanged."""
    MOD = (1 << 61) - 1
    md5s, rolls = [], []
    for t in batch[text_col].to_pylist():
        data = t.encode("utf-8")
        md5s.append(hashlib.md5(data).hexdigest())
        rolls.append(int.from_bytes(data, "big") % MOD)
    out = batch.append_column("md5", pa.array(md5s, pa.string()))
    return out.append_column(
        "rolling_hash", pa.array(np.array(rolls, dtype=np.uint64).view(np.int64))
    )


def analyze_documents(
    ds: ray.data.Dataset, text_col: str = "text", concurrency=(1, 4)
) -> ray.data.Dataset:
    """Full text-analysis pipeline: counts + quality + lang + fingerprints."""
    out = ds.map_batches(
        lambda b: token_count_batch(b, text_col), batch_format="pyarrow", zero_copy_batch=True
    )
    out = out.map_batches(lambda b: quality_batch(b, text_col), batch_format="pyarrow")
    out = out.map_batches(
        LangId, fn_constructor_args=(text_col,), batch_format="pyarrow",
        concurrency=concurrency,
    )
    return out.map_batches(lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow")


def top_bigrams(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    k: int = 20,
) -> "ray.data.Dataset":
    """Vocabulary building: global top-k whitespace bigrams — the
    n-gram-count primitive of a training-data pipeline (tokenizer vocab
    induction, contamination screens).

    Fully vectorized: one ``split_pattern`` per batch, bigrams formed by
    joining the flattened token buffer against itself shifted by one
    (``binary_join_element_wise``) with document-boundary positions
    masked out via the list offsets — no per-row loop. Each batch
    pre-aggregates its own bigram counts (the combiner), so the shuffle
    moves distinct (bigram, n) partials, not one row per token; the
    final top-k is a sort+limit on the aggregated vocabulary.
    """
    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1), " "
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        mask = np.ones(n - 1, dtype=bool)
        interior = offsets[1:-1]
        interior = interior[(interior > 0) & (interior < n)]
        mask[interior - 1] = False  # pairs that straddle a document boundary
        g = (
            pa.table({"bigram": joined.filter(pa.array(mask))})
            .group_by("bigram")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["bigram", "n"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
    )
    wide = agg.map_batches(
        lambda b: pa.table(
            {"bigram": b["bigram"], "n": pc.cast(b["sum(n)"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return wide.sort(["n", "bigram"], descending=[True, False]).limit(k)


def doc_bigram_repetition(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Intra-document repetition screen (the Gopher / MassiveText
    "fraction of duplicate n-grams" quality rule, Rae et al. 2021,
    arXiv:2112.11446 §A1.1): per document, the count of word bigrams,
    the count of DISTINCT word bigrams, and the duplicate fraction
    ``(n_bigrams − n_distinct) / n_bigrams``. High values flag
    boilerplate / keyword-stuffed documents before LLM training.

    Purely map-side (no shuffle — every statistic is doc-local):
    one ``split_pattern`` per batch, bigrams joined from the flattened
    token buffer with document-boundary pairs masked via list offsets
    (the ``top_bigrams`` kernel), then ONE Arrow hash aggregate per
    batch over (doc, bigram) gives per-doc distinct counts — no
    per-row Python. The duplicate fraction is a single
    f8(int)/f8(int) division, bit-exact vs the SQL formulation.
    Documents with fewer than two words are dropped (no bigrams —
    both sides).

    Output: (doc_id, n_bigrams, n_distinct, dup_frac).
    """

    def _batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        n = len(flat)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        npairs = lens - 1  # split("") -> [""], so lens >= 1 always
        keep_doc = npairs >= 1
        if n < 2 or not keep_doc.any():
            return pa.table(
                {
                    "doc_id": pa.array([], b[id_col].type),
                    "n_bigrams": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "dup_frac": pa.array([], pa.float64()),
                }
            )
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1), " "
        )
        valid = np.ones(n - 1, dtype=bool)
        interior = offs[1:-1]
        interior = interior[(interior > 0) & (interior < n)]
        valid[interior - 1] = False  # pairs straddling a doc boundary
        didx = np.repeat(np.arange(len(b), dtype=np.int64), np.maximum(npairs, 0))
        g = (
            pa.table({"d": pa.array(didx), "b": joined.filter(pa.array(valid))})
            .group_by(["d", "b"])
            .aggregate([([], "count_all")])
        )
        g2 = g.group_by("d").aggregate([([], "count_all")])
        nd = np.zeros(len(b), dtype=np.int64)
        nd[g2["d"].to_numpy(zero_copy_only=False)] = g2[
            "count_all"
        ].to_numpy(zero_copy_only=False)
        ki = np.flatnonzero(keep_doc)
        np_k = npairs[ki]
        nd_k = nd[ki]
        return pa.table(
            {
                "doc_id": b[id_col].take(pa.array(ki)),
                "n_bigrams": pa.array(np_k, pa.int64()),
                "n_distinct": pa.array(nd_k, pa.int64()),
                "dup_frac": pa.array(
                    (np_k - nd_k).astype(np.float64) / np_k.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(_batch, batch_format="pyarrow", zero_copy_batch=True)


def bm25_score(
    docs: "ray.data.Dataset",
    terms: tuple[str, ...] = ("join", "hash", "scan", "filter", "merge", "sort"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """BM25 relevance of every document against a fixed query-term set
    (Robertson/Sparck-Jones; k1=1.2, b=0.75) — the retrieval-scoring
    primitive LLM data pipelines use for quality filtering and
    retrieval-based dataset construction.

    Bit-exactness: scores are emitted PER (doc, term) — never summed
    across terms in floating point — and every float op is a pinned
    expression over exact integer statistics: ``idf = ln((f8(N−df) +
    0.5)/(f8(df) + 0.5))`` (DuckDB ``ln`` and Python ``math.log``
    share libm on this platform and agree bitwise; idf is computed
    once per term, not per row), ``avgdl = f8(Σdl)/f8(N)``, and the
    row score ``idf · ((f8(tf)·2.2)/(f8(tf) + 1.2·(0.25 + 0.75·
    (f8(dl)/avgdl))))`` with literals (not ``k1+1``) so both sides
    parse the identical double.

    Shape: ONE streaming pass folds each block to slim (doc, term,
    tf, dl) rows via an Arrow hash aggregate over the is_in-filtered
    token buffer, plus one meta row per block carrying (n_docs, Σdl)
    partials; the slim table (docs × matched terms, no text) is
    materialized once, the corpus stats (N, Σdl, per-term df — ≤
    |terms| + 2 numbers) reduce from it, and a final vectorized pass
    scores the slim rows. The exchange never carries text.

    Output: (doc_id, term, tf, dl, bm25).
    """
    import math

    META = "\x00stats"
    term_set = pa.array(list(terms), pa.string())

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        didx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        m = pc.is_in(flat, value_set=term_set).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(m)
        g = (
            pa.table({"d": pa.array(didx[sel]), "term": flat.take(pa.array(sel))})
            .group_by(["d", "term"])
            .aggregate([([], "count_all")])
        )
        d_of = g["d"].to_numpy(zero_copy_only=False)
        rows = pa.table(
            {
                "doc_id": batch[id_col].take(g["d"]),
                "term": g["term"],
                "tf": pc.cast(g["count_all"], pa.int64()),
                "dl": pa.array(lens[d_of], pa.int64()),
            }
        )
        meta = pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()).cast(batch[id_col].type),
                "term": pa.array([META], pa.string()),
                "tf": pa.array([len(batch)], pa.int64()),  # doc-count partial
                "dl": pa.array([int(lens.sum())], pa.int64()),  # Σdl partial
            }
        )
        return pa.concat_tables([rows, meta])

    slim = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # corpus stats: |terms| + 2 numbers to the driver — dimension-sized
    def _meta_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["term"], META))

    mt = slim.map_batches(_meta_only, batch_format="pyarrow").to_pandas()
    n_docs = int(mt["tf"].sum())
    total_dl = int(mt["dl"].sum())

    def _df_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["term"], META))
        g = t.group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "df"])

    # bounded: vocab-sized DF table collected ONCE to build the idf
    # lookup that broadcasts back (ray.put) -- the classic small-side
    # build; the token stream itself never collects
    dft = (
        slim.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("df")
        .to_pandas()
    )
    avgdl = np.float64(total_dl) / np.float64(n_docs)
    idf = {
        t: math.log(
            (np.float64(n_docs - int(df)) + 0.5) / (np.float64(int(df)) + 0.5)
        )
        for t, df in zip(dft["term"], dft["sum(df)"])
    }
    # vectorized term -> idf: index_in against the ordered term list
    idf_order = list(idf)
    idf_vec = np.array([idf[t] for t in idf_order], dtype=np.float64)
    idf_terms = pa.array(idf_order, pa.string())

    def _score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["term"], META))
        tf_f = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl_f = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        codes = pc.index_in(t["term"], value_set=idf_terms).to_numpy(
            zero_copy_only=False
        )
        idf_f = idf_vec[codes.astype(np.int64)]
        frac = (tf_f * np.float64(2.2)) / (
            tf_f
            + np.float64(1.2)
            * (np.float64(0.25) + np.float64(0.75) * (dl_f / avgdl))
        )
        return t.append_column("bm25", pa.array(idf_f * frac, pa.float64()))

    return slim.map_batches(_score, batch_format="pyarrow")


def contamination_screen(
    docs: "ray.data.Dataset",
    benchmark_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> "ray.data.Dataset":
    """Benchmark-contamination screen — the training-data hygiene op:
    per document, the fraction of its DISTINCT word n-grams that occur
    in a benchmark corpus. The benchmark n-gram set (small by
    definition) is broadcast ONCE via ``ray.put``; each batch computes
    per-doc overlap with one vectorized ``is_in`` over the flattened
    distinct-gram lists + a reduceat — the training corpus streams,
    nothing shuffles.

    Output: (id_col, n_grams, n_contaminated, contamination) where
    contamination = n_contaminated / n_grams as one int→float division
    (bit-deterministic; docs with < n tokens have n_grams = 0 and
    contamination 0.0).
    """
    import ray as _ray

    bench: set[str] = set()
    for t in benchmark_texts:
        words = t.split(" ")
        for i in range(len(words) - n + 1):
            bench.add(" ".join(words[i : i + n]))
    bench_ref = _ray.put(pa.array(sorted(bench), pa.string()))

    class _Screen:
        def __init__(self, ref):
            self.bench = (
                _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            toks = pc.split_pattern(b[text_col], " ")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.flatten()
            counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
            n_docs = len(b)
            tot = np.zeros(n_docs, dtype=np.int64)
            hit = np.zeros(n_docs, dtype=np.int64)
            if len(flat):
                doc_of = np.repeat(np.arange(n_docs), counts)
                m = len(flat)
                if m >= n:
                    grams = pc.binary_join_element_wise(
                        *[flat.slice(k, m - n + 1) for k in range(n)], " "
                    )
                    valid = doc_of[: m - n + 1] == doc_of[n - 1 :]
                    g_doc = doc_of[: m - n + 1][valid]
                    grams = grams.filter(pa.array(valid))
                    # distinct per doc: sort by (doc, gram), drop run dups
                    import pandas as pd

                    order = np.lexsort(
                        (pd.util.hash_array(grams.to_numpy(zero_copy_only=False)), g_doc)
                    )
                    g_sorted = grams.take(pa.array(order))
                    d_sorted = g_doc[order]
                    same = np.zeros(len(order), dtype=bool)
                    if len(order) > 1:
                        same[1:] = (d_sorted[1:] == d_sorted[:-1]) & pc.equal(
                            g_sorted.slice(1), g_sorted.slice(0, len(order) - 1)
                        ).to_numpy(zero_copy_only=False)
                    g_uniq = g_sorted.filter(pa.array(~same))
                    d_uniq = d_sorted[~same]
                    hits = pc.is_in(g_uniq, value_set=self.bench).to_numpy(
                        zero_copy_only=False
                    )
                    tot = np.bincount(d_uniq, minlength=n_docs).astype(np.int64)
                    hit = np.bincount(
                        d_uniq, weights=hits.astype(np.float64), minlength=n_docs
                    ).astype(np.int64)
            frac = np.zeros(n_docs, dtype=np.float64)
            nz = tot > 0
            frac[nz] = hit[nz].astype(np.float64) / tot[nz].astype(np.float64)
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_grams": pa.array(tot, pa.int64()),
                    "n_contaminated": pa.array(hit, pa.int64()),
                    "contamination": pa.array(frac, pa.float64()),
                }
            )

    return docs.map_batches(
        _Screen,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def doc_frequency_topk(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> "ray.data.Dataset":
    """Top-k terms by document frequency (the df side of TF-IDF and the
    stopword/boilerplate screen of a corpus pipeline).

    Each document lives entirely in one row, so block-local distinct
    (doc, token) pairs ARE the global distinct set — one Arrow hash
    ``group_by`` per batch (no per-row loop), then the shuffle carries
    only distinct-token partial counts per block (vocabulary-bounded,
    not token-stream-bounded).  Final global top-k = sort + limit on
    the aggregated vocabulary, total order (df desc, token asc).
    """

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
        pairs = pa.table({"d": pa.array(ids, pa.int64()), "token": toks.flatten()})
        distinct = pairs.group_by(["d", "token"]).aggregate([])
        g = (
            distinct.select(["token"])
            .group_by("token")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["token", "df"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("df")
    )
    wide = agg.map_batches(
        lambda b: pa.table(
            {"token": b["token"], "df": pc.cast(b["sum(df)"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return wide.sort(["df", "token"], descending=[True, False]).limit(k)


def tfidf_top_terms(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    per_doc: int = 3,
) -> "ray.data.Dataset":
    """Top terms per document by tf-idf with the LINEAR idf variant
    ``idf' = N / df`` (the ``ln`` idf is deliberately avoided: libm
    ``log`` bits differ across engines, which would break the
    bit-exact oracle contract; the linear variant ranks identically
    for single-term comparisons and keeps every float op pinned:
    ``score = f8(tf) * (f8(N) / f8(df))``).

    Two vocabulary-bounded exchanges and zero row shuffles: the global
    df table aggregates like :func:`doc_frequency_topk`, comes back as
    two sorted broadcast arrays, and each batch computes tf (one Arrow
    hash group_by — every doc lives in one row), joins df with a single
    vectorized ``searchsorted``, and run-cuts its own per-doc top-k.
    """
    from ray.data.aggregate import Sum

    from .sweep import run_starts_table

    def _df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
        pairs = pa.table({"d": pa.array(ids, pa.int64()), "token": toks.flatten()})
        distinct = pairs.group_by(["d", "token"]).aggregate([])
        g = distinct.select(["token"]).group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "df"])

    df_agg = (
        docs.map_batches(_df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df"))
    )
    toks_l, dfs_l = [], []
    for b in df_agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        toks_l.append(np.asarray(b["token"].to_pylist(), dtype=object))
        dfs_l.append(b["sum(df)"].to_numpy(zero_copy_only=False))
    vocab = np.concatenate(toks_l or [np.array([], object)])
    dfv = np.concatenate(dfs_l or [np.array([], np.int64)]).astype(np.int64)
    order = np.argsort(vocab, kind="stable")
    vocab, dfv = vocab[order], dfv[order]
    n_docs = docs.count()
    idf = np.float64(n_docs) / dfv.astype(np.float64)
    ref = ray.put((vocab, dfv, idf))

    class _Score:
        def __init__(self, ref):
            self.vocab, self.df, self.idf = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            toks = pc.split_pattern(b[text_col], " ")
            toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
            pairs = pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "token": toks.flatten()}
            )
            tf = pairs.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
            tf = tf.rename_columns(["doc_id", "token", "tf"])
            tok_np = np.asarray(tf["token"].to_pylist(), dtype=object)
            pos = np.searchsorted(self.vocab, tok_np)
            tf_np = tf["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
            score = tf_np.astype(np.float64) * self.idf[pos]
            t = pa.table(
                {
                    "doc_id": tf["doc_id"],
                    "token": tf["token"],
                    "tf": pa.array(tf_np, pa.int64()),
                    "df": pa.array(self.df[pos], pa.int64()),
                    "score": pa.array(score, pa.float64()),
                }
            )
            idx = pc.sort_indices(
                t,
                sort_keys=[
                    ("doc_id", "ascending"),
                    ("score", "descending"),
                    ("token", "ascending"),
                ],
            )
            t = t.take(idx)
            starts = run_starts_table(t, ["doc_id"])
            lens = np.diff(np.r_[starts, len(t)])
            rank = np.arange(len(t)) - np.repeat(starts, lens)
            return t.filter(pa.array(rank < per_doc))

    return docs.map_batches(
        _Score,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def normalize_text(
    docs: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Canonical text normalization (lowercase → non-alphanumeric → space
    → collapse runs → trim): the cleanup pass before dedup/tokenization.

    Fully vectorized — Arrow's regex kernels are RE2, the same engine
    DuckDB uses, so `[^a-z0-9 ]` / `' +'` behave identically and the
    md5 of the normalized text hash-matches the SQL oracle exactly.
    Output: (doc_id, norm_md5, norm_len).
    """
    def _norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b[text_col])
        t = pc.replace_substring_regex(t, pattern="[^a-z0-9 ]", replacement=" ")
        t = pc.replace_substring_regex(t, pattern=" +", replacement=" ")
        t = pc.utf8_trim(t, " ")
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.to_pylist()]
        return pa.table(
            {
                "doc_id": b[id_col],
                "norm_md5": pa.array(md5s, pa.string()),
                "norm_len": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return docs.map_batches(_norm, batch_format="pyarrow", zero_copy_batch=True)


def chunk_docs(
    docs: ray.data.Dataset,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document fixed-size token chunking with overlap — the
    training-prep fan-out that turns long documents into model-sized
    windows (stride = ``chunk_tokens - overlap``; the final chunk is
    ragged; a doc shorter than one chunk yields exactly one).

    Stateless row fan-out, fully vectorized: one ``split_pattern`` per
    batch for the whitespace token counts, chunk counts by integer
    ceil-division, and the per-chunk rows built with ``np.repeat`` /
    ``arange`` index math — no exchange, no per-row Python.  Output:
    (doc_id, chunk_idx, chunk_start, n_chunk_tokens) — the span recipe
    (like :func:`~workbook_exporter_fe_ray.stages.pack.sequence_pack_spans`)
    from which a writer slices the actual windows locally.
    """
    stride = int(chunk_tokens - overlap)
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def _fan(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(b[text_col], " ")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # k = ceil((n - overlap) / stride) chunks (≥1): the last chunk
        # starts before n - overlap so every token is covered exactly
        # once beyond the shared overlap
        cnt = np.maximum((n - overlap + stride - 1) // stride, 1)
        rep = np.repeat(np.arange(len(b), dtype=np.int64), cnt)
        cum = np.cumsum(cnt) - cnt
        idx = np.arange(int(cnt.sum()), dtype=np.int64) - cum[rep]
        start = idx * stride
        ln = np.minimum(start + chunk_tokens, n[rep]) - start
        return pa.table(
            {
                "doc_id": b[id_col].take(pa.array(rep)),
                "chunk_idx": pa.array(idx, pa.int64()),
                "chunk_start": pa.array(start, pa.int64()),
                "n_chunk_tokens": pa.array(ln, pa.int64()),
            }
        )

    return docs.map_batches(_fan, batch_format="pyarrow", zero_copy_batch=True)


def oov_rate_by_source(
    docs: ray.data.Dataset, k: int = 500, num_partitions: int = 32
) -> ray.data.Dataset:
    """Out-of-vocabulary rate per source against a corpus-derived
    top-``k`` vocabulary — the coverage screen run before committing to
    a tokenizer vocab (docs from a source with high OOV are drifted /
    foreign / junk relative to the corpus).

    Two passes, both streaming:

    1. **Vocab**: per-block Arrow ``group_by`` folds tokens to (token,
       count) partials; one coarse-partition exchange sums them; each
       partition emits only its local top-k (count desc, token asc) so
       the driver merges P x k candidate rows — never the full token
       domain — and takes the global top-k with the same deterministic
       tie-break.  (Term frequency, not doc frequency — distinct from
       :func:`doc_frequency`.)
    2. **Rate**: the k-token vocab is tiny, so it ships in the task
       closure; per block, one ``is_in`` over the flattened tokens +
       reduceat per doc (the `_count_in_set_per_doc` kernel), folded to
       per-source (n_tokens, n_oov) partials; final merge is
       domain-sized.  ``oov_rate`` is the single int/int float division
       (bit-safe vs SQL).

    Tokenization: the engine-wide single-space split contract
    (``string_split(text, ' ')``).

    Output: (source, n_tokens, n_oov, oov_rate).
    """
    from .sweep import run_starts_table, with_part

    def _tok_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        agg = (
            pa.table({"token": toks.flatten()})
            .group_by("token")
            .aggregate([("token", "count")])
        )
        part = pa.table(
            {
                "token": agg["token"],
                "c": pc.cast(agg["token_count"], pa.int64()),
            }
        )
        return with_part(part, ["token"], num_partitions)

    def _tok_topk(g: pa.Table) -> pa.Table:
        agg = g.select(["token", "c"]).group_by("token").aggregate([("c", "sum")])
        t = pa.table({"token": agg["token"], "c": agg["c_sum"]})
        idx = pc.sort_indices(
            t, sort_keys=[("c", "descending"), ("token", "ascending")]
        )
        return t.take(idx[:k])

    import ray as _ray

    cand = (
        docs.map_batches(_tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_tok_topk, batch_format="pyarrow")
    )
    # P x k candidate rows — bounded by construction, safe to collect
    cand_tbl = pa.concat_tables(
        [t for t in _ray.get(cand.to_arrow_refs()) if len(t)]
    )
    idx = pc.sort_indices(
        cand_tbl, sort_keys=[("c", "descending"), ("token", "ascending")]
    )
    vocab = frozenset(cand_tbl["token"].take(idx[:k]).to_pylist())

    def _oov_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        total = pc.cast(pc.list_value_length(toks), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hits = _count_in_set_per_doc(toks, vocab)
        t = pa.table(
            {
                "source": b["source"],
                "n": pa.array(total, pa.int64()),
                "o": pa.array(total - hits, pa.int64()),
            }
        )
        idx2 = pc.sort_indices(t, sort_keys=[("source", "ascending")])
        t = t.take(idx2)
        starts = run_starts_table(t, ["source"])
        part = pa.table(
            {
                "source": t["source"].take(pa.array(starts)),
                "n": pa.array(
                    np.add.reduceat(t["n"].to_numpy(zero_copy_only=False), starts)
                    if len(starts)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
                "o": pa.array(
                    np.add.reduceat(t["o"].to_numpy(zero_copy_only=False), starts)
                    if len(starts)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
            }
        )
        return with_part(part, ["source"], 8)

    def _merge(g: pa.Table) -> pa.Table:
        idx3 = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx3)
        starts = run_starts_table(g, ["source"])
        n = np.add.reduceat(g["n"].to_numpy(zero_copy_only=False), starts)
        o = np.add.reduceat(g["o"].to_numpy(zero_copy_only=False), starts)
        return pa.table(
            {
                "source": g["source"].take(pa.array(starts)),
                "n_tokens": pa.array(n, pa.int64()),
                "n_oov": pa.array(o, pa.int64()),
                "oov_rate": pa.array(
                    o.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
            }
        )

    routed = docs.map_batches(
        _oov_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return routed.groupby("__part").map_groups(_merge, batch_format="pyarrow")


def type_token_ratio(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Lexical-diversity screen per document: whitespace token count and
    DISTINCT token count (the type/token ratio's exact integer
    numerator and denominator — emitted as ints, never divided, so the
    gate is hash-exact; a downstream ratio is one float division away).
    Low-diversity documents (boilerplate, keyword stuffing, template
    spam) sit at the bottom of n_types/n_tokens.

    Map-side only — no exchange: each document's distinct count is
    self-contained. Vectorized via one ``split_pattern`` per batch +
    dictionary-encode of the flat token values, then one ``np.unique``
    over (doc_index << 32 | token_code) composite int64 keys — exact on
    strings (codes come from Arrow's own hash table, not a lossy hash).

    Reference parity: extends the reference's per-cell string toolkit
    (`/root/reference/workbook_exporter-fe.py:660` split semantics) to
    a corpus-quality signal; same ' '-split contract as token_count.

    Output: (doc_id, n_tokens, n_types) — all int64.
    """

    def _batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        flat = toks.flatten()
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # sliced ListArray guard (ADVICE r3)
        doc_idx = np.repeat(
            np.arange(len(toks), dtype=np.int64), np.diff(offs)
        )
        # Arrow dictionary indices are int32 -> codes < 2**31; composite
        # key packs (doc, code) into one int64 for a single np.unique
        key = (doc_idx << np.int64(32)) | codes
        uniq = np.unique(key)
        n_types = np.bincount(
            (uniq >> np.int64(32)).astype(np.int64), minlength=len(toks)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": n_tokens,
                "n_types": pa.array(n_types, pa.int64()),
            }
        )

    return docs.map_batches(_batch, batch_format="pyarrow", zero_copy_batch=True)


def top_terms_per_source(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Top-k tokens by occurrence count per source — the per-subcorpus
    "what is this slice made of" report. Two vocabulary-bounded
    exchanges: block-local (source, token) occurrence partials (one
    Arrow hash group_by per batch, never the token stream) are summed
    on a hash of BOTH keys, then the exact counts route by source for
    a per-run sort + head(k) sweep. The second exchange carries one
    row per (source, distinct token) — vocabulary-sized, so a
    single-task source run is bounded by vocab (millions at worst),
    not by corpus points; total order (n desc, token asc) makes ties
    deterministic.

    Output: (source, token, n, rank) — rank 1..k, all counts int64.
    """
    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(np.arange(len(b), dtype=np.int64), lengths)
        )
        pairs = pa.table(
            {"source": b["source"].take(src), "token": toks.flatten()}
        )
        g = pairs.group_by(["source", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "token", "n"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "token"])
        .sum("n")
    )

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": b["source"],
                "token": b["token"],
                "n": pc.cast(b["sum(n)"], pa.int64()),
            }
        )
        return with_part(t, ["source"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("source", "ascending"),
                ("n", "descending"),
                ("token", "ascending"),
            ],
        )
        g = g.take(idx)
        starts = run_starts_table(g, ["source"])
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        keep = pos < k
        out = g.drop_columns(["__part"]).filter(pa.array(keep))
        return out.append_column("rank", pa.array(pos[keep] + 1, pa.int64()))

    routed = agg.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")


def vocab_jaccard_sources(
    docs: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Pairwise vocabulary overlap between sources — the cross-subcorpus
    contamination/affinity diagnostic (how much of slice A's vocabulary
    slice B shares). One vocabulary-bounded exchange: block-local
    distinct (source, token) partials route by token hash; each sweep
    deduplicates its partition globally (all copies of a token land
    together), then emits per-partition pair-intersection partials
    (src_a < src_b) plus diagonal per-source vocabulary sizes — a
    sources²-bounded tablet per task, summed in a final tiny groupby.
    Jaccard's exact numerator/denominator ship as ints (n_common,
    n_union = n_a + n_b - n_common); the ratio is one division away.

    Output: (src_a, src_b, n_common, n_a, n_b, n_union) for every
    unordered source pair with a non-empty union.
    """
    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(np.arange(len(b), dtype=np.int64), lengths)
        )
        pairs = pa.table(
            {"source": b["source"].take(src), "token": toks.flatten()}
        )
        distinct = pairs.group_by(["source", "token"]).aggregate([])
        return with_part(distinct, ["token"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        # global dedup within the token-routed partition, then runs of
        # equal token give each token's source set (sorted, so pair
        # expansion below is already src_a < src_b)
        idx = pc.sort_indices(
            g, sort_keys=[("token", "ascending"), ("source", "ascending")]
        )
        g = g.take(idx)
        starts_all = run_starts_table(g, ["token", "source"])
        g = g.take(pa.array(starts_all))  # distinct (token, source)
        starts = run_starts_table(g, ["token"])
        n = len(g)
        srcs = g["source"]
        if n == 0:
            return pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lens = np.diff(np.r_[starts, n])
        # vectorized all-pairs expansion per run: for a run of length L
        # emit L*(L-1)/2 (a, b) index pairs; runs are <= n_sources long
        reps = (lens * (lens - 1)) // 2
        if reps.sum() > 0:
            run_of_pair = np.repeat(np.arange(len(lens)), reps)
            within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.r_[np.int64(0), np.cumsum(reps)[:-1]], reps
            )
            # map the 0..L*(L-1)/2-1 triangle index to (i, j), i < j
            Lr = lens[run_of_pair]
            # row i of the triangle holds (L-1-i) pairs; find i by
            # comparing within against the cumulative row sizes
            i_idx = np.zeros(len(within), dtype=np.int64)
            rem = within.copy()
            # lens <= n_sources (tiny): loop over triangle rows, not data
            for _ in range(int(lens.max()) - 1 if len(lens) else 0):
                row_len = Lr - 1 - i_idx
                adv = rem >= row_len
                rem = rem - np.where(adv, row_len, 0)
                i_idx = i_idx + adv.astype(np.int64)
            j_idx = rem + i_idx + 1
            base = np.repeat(starts, reps)
            a = srcs.take(pa.array(base + i_idx))
            b_ = srcs.take(pa.array(base + j_idx))
            pair_tbl = pa.table({"src_a": a, "src_b": b_})
            pair_agg = pair_tbl.group_by(["src_a", "src_b"]).aggregate(
                [([], "count_all")]
            )
            pair_agg = pair_agg.rename_columns(["src_a", "src_b", "n"])
        else:
            pair_agg = pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # diagonal: per-source distinct-token counts in this partition
        diag = pa.table({"src_a": srcs, "src_b": srcs}).group_by(
            ["src_a", "src_b"]
        ).aggregate([([], "count_all")]).rename_columns(["src_a", "src_b", "n"])
        return pa.concat_tables(
            [pair_agg, diag.cast(pair_agg.schema)]
        )

    routed = docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    partials = routed.groupby("__part").map_groups(_sweep, batch_format="pyarrow")
    summed = partials.groupby(["src_a", "src_b"]).sum("n")

    def _finish(b: pa.Table) -> pa.Table:
        # sources²-sized tablet: assemble n_a/n_b/n_union from the diagonal
        a = b["src_a"].to_pylist()
        bb = b["src_b"].to_pylist()
        nv = pc.cast(b["sum(n)"], pa.int64()).to_pylist()
        size = {x: v for x, y, v in zip(a, bb, nv) if x == y}
        rows = [
            (x, y, v, size[x], size[y], size[x] + size[y] - v)
            for x, y, v in zip(a, bb, nv)
            if x != y
        ]
        rows.sort()
        return pa.table(
            {
                "src_a": pa.array([r[0] for r in rows], pa.string()),
                "src_b": pa.array([r[1] for r in rows], pa.string()),
                "n_common": pa.array([r[2] for r in rows], pa.int64()),
                "n_a": pa.array([r[3] for r in rows], pa.int64()),
                "n_b": pa.array([r[4] for r in rows], pa.int64()),
                "n_union": pa.array([r[5] for r in rows], pa.int64()),
            }
        )

    return summed.repartition(1).map_batches(
        _finish, batch_format="pyarrow"
    )


def prefix_dup_groups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
) -> ray.data.Dataset:
    """Prefix-duplicate screen per source: how many documents share
    their first ``k`` whitespace tokens with another document of the
    same source — the cheap boilerplate/template detector run before
    the expensive MinHash pass (shared intros are the dominant
    template signal in crawled corpora).  The exchange carries one row
    per DISTINCT (source, prefix) — block-local Arrow partials count
    duplicates before the shuffle — and the per-source rollup is a
    second, sources-bounded aggregation of int64 partials.

    Output: (source, n_docs, n_prefix_groups, n_dup_docs) —
    n_dup_docs counts documents in prefix groups of size >= 2.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        prefix = pc.binary_join(pc.list_slice(toks, 0, k), " ")
        t = pa.table({"source": b["source"], "prefix": prefix})
        g = t.group_by(["source", "prefix"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "prefix", "n"])

    groups = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "prefix"])
        .sum("n")
    )

    def _stats(b: pa.Table) -> pa.Table:
        nv = pc.cast(b["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(nv),
                "n_prefix_groups": pa.array(np.ones(len(b), np.int64)),
                "n_dup_docs": pa.array(np.where(nv > 1, nv, 0)),
            }
        )
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_prefix_groups", "sum"), ("n_dup_docs", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_prefix_groups", "n_dup_docs"]
        )

    agg = (
        groups.map_batches(_stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs"), Sum("n_prefix_groups"), Sum("n_dup_docs"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pc.cast(b["sum(n_docs)"], pa.int64()),
                "n_prefix_groups": pc.cast(b["sum(n_prefix_groups)"], pa.int64()),
                "n_dup_docs": pc.cast(b["sum(n_dup_docs)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def bigram_vocab_size(
    docs: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Distinct adjacent-bigram count per source — the vocabulary-growth
    side of the Gopher repetition screens (a slice whose bigram
    vocabulary stops growing is template-dominated even when unigram
    vocabulary looks healthy).  Block-local distinct (source, bigram)
    partials route by a hash of BOTH keys so each sweep task
    deduplicates its partition exactly (every copy of a pair lands
    together) and emits per-source int64 partial counts; the final
    rollup is a sources-bounded groupby-sum.  Bigrams join with a
    single space — bijective, since tokens are the split fields of
    that very separator.

    Output: (source, n_distinct_bigrams).
    """
    from ray.data.aggregate import Sum

    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # normalize sliced-array offsets
        n_rows = len(b)
        # adjacent pairs within each doc: drop each doc's last token as
        # a pair start
        total = len(flat)
        is_start = np.ones(total, dtype=bool)
        last_idx = offs[1:] - 1  # last token index per doc (may be -1+off for empty)
        valid_last = offs[1:] > offs[:-1]
        is_start[last_idx[valid_last]] = False
        starts_idx = np.flatnonzero(is_start)
        if len(starts_idx) == 0:
            return with_part(
                pa.table(
                    {
                        "source": pa.array([], pa.string()),
                        "bigram": pa.array([], pa.string()),
                    }
                ),
                ["source", "bigram"],
                num_partitions,
            )
        w1 = flat.take(pa.array(starts_idx))
        w2 = flat.take(pa.array(starts_idx + 1))
        doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        src = b["source"].take(pa.array(doc_of[starts_idx]))
        bigram = pc.binary_join_element_wise(w1, w2, " ")
        t = pa.table({"source": src, "bigram": bigram})
        distinct = t.group_by(["source", "bigram"]).aggregate([])
        return with_part(distinct, ["source", "bigram"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("source", "ascending"), ("bigram", "ascending")]
        )
        g = g.take(idx)
        starts_all = run_starts_table(g, ["source", "bigram"])
        srcs = g["source"].take(pa.array(starts_all))
        compact = pa.table({"source": srcs})
        s_starts = run_starts_table(compact, ["source"])
        lens = np.diff(np.r_[s_starts, len(compact)])
        return pa.table(
            {
                "source": srcs.take(pa.array(s_starts)),
                "n": pa.array(lens.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
    )
    agg = partials.groupby("source").aggregate(Sum("n"))

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_distinct_bigrams": pc.cast(b["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def pmi_top_bigrams(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
    max_vocab: int = 5_000_000,
) -> ray.data.Dataset:
    """Collocation mining: top-k adjacent bigrams by pointwise mutual
    information ``ln(c_xy·N / (c_x·c_y))`` with a minimum-support
    gate — the phrase-extraction pass a tokenizer-training pipeline
    runs over a corpus slice.  Two vocabulary-bounded aggregations
    (unigram counts, bigram counts); the unigram table is materialized
    once (loud ``max_vocab`` cap), broadcast via ``ray.put`` and read
    from the object store by every scoring task (never re-shipped per
    batch); PMI is evaluated in pinned order (f8 products, one
    division, one ``ln`` — both libm-exact vs DuckDB, proven by
    ``bm25_score``), and the final total order (pmi DESC, w1, w2)
    makes float ties deterministic.

    Output: (w1, w2, c_xy, c_x, c_y, pmi) — k rows.
    """
    from .sweep import with_part  # noqa: F401  (house import pattern)

    def _uni_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        t = pa.table({"token": toks.flatten()})
        g = t.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    uni = (
        docs.map_batches(_uni_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("n")
        .materialize()
    )
    n_vocab = uni.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"pmi_top_bigrams: vocabulary {n_vocab} exceeds max_vocab="
            f"{max_vocab} — the broadcast lookup would not fit; raise the "
            "cap explicitly if the cluster has the memory"
        )
    chunks = [t for t in ray.get(uni.to_arrow_refs()) if len(t)]
    uni_tbl = (
        pa.concat_tables(chunks)
        if chunks
        else pa.table({"token": pa.array([], pa.string()), "sum(n)": pa.array([], pa.int64())})
    )
    counts = pc.cast(uni_tbl["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
    total = int(counts.sum())
    lut = dict(zip(uni_tbl["token"].to_pylist(), counts.tolist()))
    lut_ref = ray.put((lut, total))

    def _bg_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        flat = toks.flatten()
        total_toks = len(flat)
        is_start = np.ones(total_toks, dtype=bool)
        last_idx = offs[1:] - 1
        valid_last = offs[1:] > offs[:-1]
        is_start[last_idx[valid_last]] = False
        starts_idx = np.flatnonzero(is_start)
        if len(starts_idx) == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "w1": flat.take(pa.array(starts_idx)),
                "w2": flat.take(pa.array(starts_idx + 1)),
            }
        )
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "n"])

    bg = (
        docs.map_batches(_bg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .sum("n")
    )

    _cache: dict = {}

    def _score(b: pa.Table) -> pa.Table:
        import math

        import pandas as pd

        if "lut" not in _cache:
            _cache["lut"], _cache["total"] = ray.get(lut_ref)
        lut_l, total_l = _cache["lut"], _cache["total"]
        cxy = pc.cast(b["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = cxy >= min_count
        if not keep.any():
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c_xy": pa.array([], pa.int64()),
                    "c_x": pa.array([], pa.int64()),
                    "c_y": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        ki = pa.array(np.flatnonzero(keep))
        w1 = b["w1"].take(ki)
        w2 = b["w2"].take(ki)
        cxy = cxy[keep]
        cx = pd.Series(w1.to_pylist()).map(lut_l).to_numpy(dtype=np.int64)
        cy = pd.Series(w2.to_pylist()).map(lut_l).to_numpy(dtype=np.int64)
        f = np.float64
        ratio = (cxy.astype(f) * f(total_l)) / (cx.astype(f) * cy.astype(f))
        # libm log (math.log), NOT np.log: numpy's SIMD log drifts from
        # DuckDB's ln by 1 ulp on some arguments (the bm25_score lesson,
        # text.py:325). The loop runs only over support-filtered
        # candidates — vocabulary-bounded, never the token stream.
        pmi = np.array([math.log(r) for r in ratio], dtype=np.float64)
        return pa.table(
            {
                "w1": w1,
                "w2": w2,
                "c_xy": pa.array(cxy, pa.int64()),
                "c_x": pa.array(cx, pa.int64()),
                "c_y": pa.array(cy, pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    scored = bg.map_batches(_score, batch_format="pyarrow")
    return scored.sort(
        ["pmi", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def token_len_histogram(
    docs: ray.data.Dataset,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Token-length (chars) histogram over the whole corpus — the
    tokenizer-design diagnostic (length distribution drives BPE merge
    budgets and max-word heuristics).  Per-block dense ``bincount``
    partials (length domain is tiny) combine by a length-keyed
    groupby-sum of int64 counts; the token stream itself never crosses
    the exchange.

    Output: (tok_len, n_tokens) — one row per occurring length.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return pa.table(
                {
                    "tok_len": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "tok_len": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok_len")
        .aggregate(Sum("n"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tok_len": pc.cast(b["tok_len"], pa.int64()),
                "n_tokens": pc.cast(b["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def dup_cluster_size_hist(
    docs: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exact-duplicate cluster-size profile: how many byte-identical
    text groups exist at each multiplicity — the "how duplicated is
    this crawl" report read before choosing a dedup budget (a corpus
    with 10^6 size-2 clusters wants a different pass than one with a
    single size-10^6 cluster).  Texts route by content hash so each
    sweep counts its clusters exactly; cluster sizes (small-int domain)
    then combine in a size-keyed groupby-sum.

    Output: (cluster_size, n_clusters, n_docs) — n_docs = size × count.
    """
    from ray.data.aggregate import Sum

    from .sweep import run_starts_table, with_part

    def _route(b: pa.Table) -> pa.Table:
        t = pa.table({"text": b[text_col]})
        return with_part(t, ["text"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(g, sort_keys=[("text", "ascending")])
        g = g.take(idx)
        starts = run_starts_table(g, ["text"])
        sizes = np.diff(np.r_[starts, len(g)])
        counts = np.bincount(sizes)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cluster_size": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        docs.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        size = pc.cast(b["cluster_size"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(b["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cluster_size": pa.array(size),
                "n_clusters": pa.array(n),
                "n_docs": pa.array(size * n),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def lang_confusion(
    docs: ray.data.Dataset,
    text_col: str = "text",
    label_col: str = "lang",
) -> ray.data.Dataset:
    """Classifier audit: confusion matrix of the labeled language vs
    :class:`LangId`'s stopword-heuristic prediction — the calibration
    report run before trusting a cheap classifier to route a corpus
    slice.  The LangId actor pool does the per-batch scoring (state in
    ``__init__``); per-block (label, pred) Arrow count partials sum in
    a languages²-bounded exchange.

    Output: (lang, lang_pred, n_docs) — all int64 counts.
    """
    from ray.data.aggregate import Sum

    scored = docs.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"text_col": text_col},
    )

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b[label_col], "lang_pred": b["lang_pred"]})
        g = t.group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "lang_pred", "n"])

    agg = (
        scored.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "lang_pred": b["lang_pred"],
                "n_docs": pc.cast(b["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def hapax_rate_by_source(
    docs: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Global-hapax vocabulary screen per source: which slice of the
    corpus is minting tokens seen exactly ONCE anywhere — the noisy-OCR
    / boilerplate-id detector (a healthy slice's hapax rate is stable;
    a corrupted one spikes).  Block-local (source, token) count
    partials route by token so each sweep owns every copy of its
    tokens: it reconstitutes exact global counts, flags hapaxes
    (global count 1 — necessarily single-source), and emits per-source
    int64 (n_vocab, n_hapax) partials; final rollup is sources-bounded.
    The rate is one f8/f8 division.

    Output: (source, n_vocab, n_hapax, hapax_rate) — n_vocab counts
    the source's distinct tokens.
    """
    from ray.data.aggregate import Sum

    from .sweep import run_starts_table, with_part

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(np.repeat(np.arange(len(b), dtype=np.int64), lengths))
        pairs = pa.table(
            {"source": b["source"].take(src), "token": toks.flatten()}
        )
        g = pairs.group_by(["token", "source"]).aggregate([([], "count_all")])
        g = g.rename_columns(["token", "source", "n"])
        return with_part(g, ["token"], num_partitions)

    def _sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_vocab": pa.array([], pa.int64()),
                "n_hapax": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("token", "ascending"), ("source", "ascending")]
        )
        g = g.take(idx)
        nv = pc.cast(g["n"], pa.int64()).to_numpy(zero_copy_only=False)
        ts_starts = run_starts_table(g, ["token", "source"])
        n_ts = np.add.reduceat(nv, ts_starts)  # exact (token, source) counts
        gc = g.take(pa.array(ts_starts))
        t_starts = run_starts_table(gc, ["token"])
        t_lens = np.diff(np.r_[t_starts, len(gc)])
        tok_total = np.repeat(np.add.reduceat(n_ts, t_starts), t_lens)
        hapax = tok_total == 1
        t = pa.table(
            {
                "source": gc["source"],
                "n_vocab": pa.array(np.ones(len(gc), np.int64)),
                "n_hapax": pa.array(hapax.astype(np.int64)),
            }
        )
        g2 = t.group_by("source").aggregate(
            [("n_vocab", "sum"), ("n_hapax", "sum")]
        )
        return g2.rename_columns(["source", "n_vocab", "n_hapax"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_sweep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_vocab"), Sum("n_hapax"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        nv = pc.cast(b["sum(n_vocab)"], pa.int64()).to_numpy(zero_copy_only=False)
        nh = pc.cast(b["sum(n_hapax)"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "n_vocab": pa.array(nv),
                "n_hapax": pa.array(nh),
                "hapax_rate": pa.array(
                    nh.astype(np.float64) / nv.astype(np.float64), pa.float64()
                ),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def vocab_novelty_blocks(
    documents: ray.data.Dataset,
    block_size: int = 500,
) -> ray.data.Dataset:
    """Vocabulary growth curve: how many NEW whitespace tokens (never
    seen in any lower doc_id) each block of ``block_size`` doc ids
    introduces — the corpus-evolution diagnostic behind "is more data
    still adding vocabulary?" scaling decisions.

    Two bounded exchanges, both vocab-domain (never doc-payload):
    per-block (token → min doc_id) partials from one pyarrow
    ``group_by("token").aggregate(min)`` per batch, an associative
    ``Min`` fold per token, then block-domain count partials.  All
    int64 / counts → hash-exact vs the ``min(doc_id) // block``
    SQL.

    Reference parity: the reference tokenizes nothing
    (workbook_exporter-fe.py renders cell values 1:1); brief-mandated
    text-analysis coverage.

    Output: (block, n_new_tokens).
    """
    from ray.data.aggregate import Min, Sum

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc = np.repeat(
            pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False),
            n.astype(np.int64),
        )
        t = pa.table({"token": flat, "min_doc": pa.array(doc)})
        g = t.group_by("token").aggregate([("min_doc", "min")])
        return g.rename_columns(["token", "min_doc"])

    first = (
        documents.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Min("min_doc"))
    )

    def _block(b: pa.Table) -> pa.Table:
        fd = pc.cast(b["min(min_doc)"], pa.int64()).to_numpy(zero_copy_only=False)
        blk = fd // np.int64(block_size)
        vals, cnts = np.unique(blk, return_counts=True)
        return pa.table(
            {
                "block": pa.array(vals.astype(np.int64)),
                "n_new_tokens": pa.array(cnts.astype(np.int64)),
            }
        )

    agg = first.map_batches(_block, batch_format="pyarrow").groupby("block").aggregate(
        Sum("n_new_tokens")
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "block": pc.cast(b["block"], pa.int64()),
                "n_new_tokens": pc.cast(b["sum(n_new_tokens)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def regex_match_stats(
    docs: ray.data.Dataset,
    match_pattern: str = r"(fast|slow) (scan|merge)",
    count_pattern: str = r"\b(value|table)\b",
) -> ray.data.Dataset:
    """Per-source regex profile — the PII / boilerplate screen shape
    every crawl pipeline runs (here over the synthetic vocabulary):
    how many docs MATCH one pattern, and how many total OCCURRENCES of
    another appear.

    Both kernels are Arrow's RE2 (``match_substring_regex`` /
    ``count_substring_regex``) — vectorized C++ over the whole batch,
    and semantically aligned with DuckDB's RE2 ``regexp_matches`` /
    ``regexp_extract_all`` so the gate is exact (both engines compile
    the SAME regex dialect; a PCRE-only construct would be refused by
    both rather than silently diverge).  Patterns compile once per
    process inside Arrow, not per batch.  Per-block (source × 3)-cell
    partials → one domain-sized exchange.

    Output: (source, n_docs, n_matching_docs, n_occurrences).
    """
    from ray.data.aggregate import Sum

    MP, CP = match_pattern, count_pattern

    def _partial(b: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(b["text"], MP)
        cnt = pc.count_substring_regex(b["text"], CP)
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(np.ones(len(b), np.int64)),
                "n_matching_docs": pc.cast(m, pa.int64()),
                "n_occurrences": pc.cast(cnt, pa.int64()),
            }
        )
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_matching_docs", "sum"),
             ("n_occurrences", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_matching_docs", "n_occurrences"]
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs"), Sum("n_matching_docs"), Sum("n_occurrences"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pc.cast(b["sum(n_docs)"], pa.int64()),
                "n_matching_docs": pc.cast(
                    b["sum(n_matching_docs)"], pa.int64()
                ),
                "n_occurrences": pc.cast(b["sum(n_occurrences)"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def posting_pairs_top_tokens(
    docs: ray.data.Dataset,
    k: int = 10,
) -> ray.data.Dataset:
    """Inverted-index build for the k highest-document-frequency
    tokens: the (token, doc_id) posting pairs a search / contamination
    index starts from, restricted to the head of the DF distribution.

    Phase 1 — DF: per-block DISTINCT (token, doc) pairs (an Arrow
    group_by inside the block, so each doc contributes a token once)
    → ONE token-keyed groupby-sum (vocab-domain-sized exchange) →
    winners cut by a distributed ``sort(df DESC, token ASC).limit(k)``
    (the ``pmi_top_bigrams`` idiom) — only the k winner tokens reach
    the driver.  Phase 2 — the k winner tokens broadcast
    (``ray.put`` once) and documents STREAM AGAIN, emitting only winner
    pairs: recomputing one split beats materializing the full posting
    set, and the output is k·DF-bounded.

    Output: (token, doc_id) — one row per posting.
    """
    import ray

    from ray.data.aggregate import Sum

    def _pairs(b: pa.Table):
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        ids = np.repeat(
            pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False),
            lens,
        )
        return pa.table({"token": flat, "doc_id": pa.array(ids)})

    def _df_partial(b: pa.Table) -> pa.Table:
        p = _pairs(b)
        d = p.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        t = pa.table(
            {
                "token": d["token"],
                "df": pa.array(np.ones(len(d), np.int64)),
            }
        )
        g = t.group_by("token").aggregate([("df", "sum")])
        return g.rename_columns(["token", "df"])

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["df" if c == "sum(df)" else c for c in b.column_names]
        )

    top = (
        docs.map_batches(_df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df"))
        .map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()  # k rows — bounded by the requested output size
    )
    winners = set(top["token"])
    wref = ray.put(np.array(sorted(winners)))

    class _Emit:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            p = _pairs(b)
            tok = p["token"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.w, tok)
            posc = np.minimum(pos, max(len(self.w) - 1, 0))
            hit = (
                (self.w[posc] == tok)
                if len(self.w)
                else np.zeros(len(tok), bool)
            )
            p = p.filter(pa.array(hit))
            d = p.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
            return pa.table({"token": d["token"], "doc_id": d["doc_id"]})

    return docs.map_batches(_Emit(wref), batch_format="pyarrow", concurrency=4)


def corpus_curation_full(
    docs: ray.data.Dataset,
    min_chars: int = 200,
) -> ray.data.Dataset:
    """END-TO-END curation pipeline — the composed shape a training-data
    run actually executes, as ONE streaming dataflow: length filter →
    exact content dedup (md5 of text, min doc_id wins — the shuffle
    moves 16-byte hashes + slim carries, never documents twice) →
    per-language survivor profile (docs, whitespace tokens, chars).

    Stages reuse the audited primitives (:func:`~workbook_exporter_fe_ray.
    stages.dedup.exact_dedup` coarse-partition first-pick), so this
    query gates the COMPOSITION, not new kernels.

    Output: (lang, n_docs, sum_tokens, sum_chars).
    """
    import hashlib

    from ray.data.aggregate import Sum

    from .dedup import exact_dedup

    def _prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["n_chars"], min_chars))
        toks = pc.list_value_length(pc.split_pattern(t["text"], " "))
        hashes = [
            hashlib.md5(x.encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "content_hash": pa.array(hashes, pa.string()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    slim = docs.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    kept = exact_dedup(slim, keys=["content_hash"], tie_col="doc_id")

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": b["lang"],
                "n_docs": pa.array(np.ones(len(b), np.int64)),
                "sum_tokens": b["n_tokens"],
                "sum_chars": b["n_chars"],
            }
        )
        g = t.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_tokens", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["lang", "n_docs", "sum_tokens", "sum_chars"])

    agg = (
        kept.map_batches(_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs"), Sum("sum_tokens"), Sum("sum_chars"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b["lang"],
                "n_docs": pc.cast(b["sum(n_docs)"], pa.int64()),
                "sum_tokens": pc.cast(b["sum(sum_tokens)"], pa.int64()),
                "sum_chars": pc.cast(b["sum(sum_chars)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def skipgram_topk(
    docs: ray.data.Dataset,
    max_dist: int = 3,
    k: int = 20,
) -> pa.Table:
    """Top-k token SKIPGRAMS — ordered (w1, w2) pairs co-occurring
    within ``max_dist`` positions in a doc (the word2vec-style context
    statistic; :func:`top_bigrams` is the ``max_dist = 1`` adjacent
    slice of this).  Per block the pair stream is ``max_dist`` shifted
    zero-copy slices of the token flatten — no per-row loop — with
    cross-doc pairs masked via the repeated doc index; per-block
    partial counts shrink the exchange to the distinct-pair domain.
    A per-block top-k cut would be WRONG here (a globally heavy pair
    can be light in every block), so the cut runs AFTER the keyed
    global-sum exchange — as a distributed ``sort(n_pairs DESC, w1,
    w2).limit(k)`` (the ``pmi_top_bigrams`` idiom): the vocab²-bounded
    pair domain never collects to the driver; only the k result rows
    do (the r4 VERDICT scale finding).

    Output: (w1, w2, n_pairs) — k rows, pinned order.
    """
    from ray.data.aggregate import Sum

    MD = int(max_dist)

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        n = len(flat)
        offs = np.r_[np.int64(0), np.cumsum(lens)]
        # doc id per flat token (block-local)
        drow = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        parts = []
        for d in range(1, MD + 1):
            if n <= d:
                break
            keep = drow[d:] == drow[:-d]
            parts.append(
                pa.table(
                    {
                        "w1": flat.slice(0, n - d).filter(pa.array(keep)),
                        "w2": flat.slice(d).filter(pa.array(keep)),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        pairs = pa.concat_tables(parts)
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "n_pairs"])

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["n_pairs" if c == "sum(n_pairs)" else c for c in b.column_names]
        )

    top = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .aggregate(Sum("n_pairs"))
        .map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["n_pairs", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()  # k rows — bounded by the requested output size
    )
    return pa.table(
        {
            "w1": pa.array(list(top["w1"]), pa.string()),
            "w2": pa.array(list(top["w2"]), pa.string()),
            "n_pairs": pa.array(top["n_pairs"].to_numpy(np.int64)),
        }
    )


def boolean_and_search(
    docs: ray.data.Dataset,
    query_tokens: tuple[str, ...] = ("spark", "vector", "merge"),
) -> ray.data.Dataset:
    """Boolean AND retrieval: per source, how many docs contain EVERY
    query token (exact whitespace-token membership, not substring — so
    "vectorize" does not match "vector").  Per block: one token split,
    K vectorized ``is_in``-over-list membership tests via the flatten +
    segment-any trick (a token list contains w iff any flattened slot
    in the doc's segment equals w), no per-row loop; (source × 2)-cell
    partials.

    Output: (source, n_docs, n_matching).
    """
    from ray.data.aggregate import Sum

    QT = tuple(query_tokens)

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        n = len(b)
        drow = np.repeat(np.arange(n, dtype=np.int64), lens)
        ok = np.ones(n, bool)
        for w in QT:
            hit = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            has = np.zeros(n, bool)
            has[drow[hit]] = True
            ok &= has
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(np.ones(n, np.int64)),
                "n_matching": pa.array(ok.astype(np.int64)),
            }
        )
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_matching", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_matching"])

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs"), Sum("n_matching"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "source": b["source"],
                "n_docs": pc.cast(b["sum(n_docs)"], pa.int64()),
                "n_matching": pc.cast(b["sum(n_matching)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def token_split_drift(
    docs: ray.data.Dataset,
    k: int = 20,
) -> pa.Table:
    """Split-half token drift — the "trending terms" shape: token
    occurrence counts in even- vs odd-``doc_id`` halves, top-k by
    absolute imbalance (a deterministic A/B axis on a table with no
    time column; swap in any boolean split).  Per-block (token, 2)
    partials → token-domain exchange → distributed pinned cut
    ``sort(|Δ| DESC, token ASC).limit(k)`` — a per-block cut would
    miss globally-imbalanced-but-locally-flat tokens, same argument as
    ``skipgram_topk``, and the vocab-sized domain never collects to
    the driver (only the k result rows do).

    Output: (token, n_even, n_odd) — k rows.
    """
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        par = np.repeat(
            pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            % 2,
            lens,
        )
        t = pa.table(
            {
                "token": flat,
                "n_even": pa.array((par == 0).astype(np.int64)),
                "n_odd": pa.array((par == 1).astype(np.int64)),
            }
        )
        g = t.group_by("token").aggregate([("n_even", "sum"), ("n_odd", "sum")])
        return g.rename_columns(["token", "n_even", "n_odd"])

    def _imb(b: pa.Table) -> pa.Table:
        ne = pc.cast(b["sum(n_even)"], pa.int64())
        no = pc.cast(b["sum(n_odd)"], pa.int64())
        return pa.table(
            {
                "token": b["token"],
                "n_even": ne,
                "n_odd": no,
                "imb": pc.abs(pc.subtract(ne, no)),
            }
        )

    top = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n_even"), Sum("n_odd"))
        .map_batches(_imb, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["imb", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()  # k rows — bounded by the requested output size
    )
    return pa.table(
        {
            "token": pa.array(list(top["token"]), pa.string()),
            "n_even": pa.array(top["n_even"].to_numpy(np.int64)),
            "n_odd": pa.array(top["n_odd"].to_numpy(np.int64)),
        }
    )


def bpe_train_merges(
    docs: ray.data.Dataset,
    num_merges: int = 40,
    text_col: str = "text",
    max_vocab: int = 2_000_000,
) -> pa.Table:
    """TRAIN a byte-pair-encoding tokenizer: learn the first
    ``num_merges`` merge rules from the corpus (Sennrich et al. 2016) —
    the tokenizer-training step of an LLM data pipeline, not just the
    token counting the rest of this module does.

    The standard recipe splits cleanly into the two scales involved:
    pair statistics over the CORPUS equal pair statistics over the
    WORD-FREQUENCY table (BPE merges never cross word boundaries), so
    the distributed part is ONE word-count exchange (per-block
    group_by partials → groupby word), and the iterative part — K
    rounds of count-max-merge, inherently sequential — runs
    driver-side over that VOCAB-sized table (the exact split every
    public BPE trainer uses; loud ``max_vocab`` guard names the
    corpus-vocabulary assumption).  Determinism: max-count ties break
    lexicographically on (left, right).

    Output: pa.Table (merge_rank, left, right, pair_count) —
    ``num_merges`` rows in learned order.
    """
    from ray.data.aggregate import Sum

    def _word_counts(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = toks.flatten()
        t = pa.table(
            {"w": flat, "n": pa.array(np.ones(len(flat), np.int64))}
        )
        g = t.group_by("w").aggregate([("n", "sum")])
        return g.rename_columns(["w", "n"])

    vocab_tbl = (
        docs.map_batches(
            _word_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("w")
        .aggregate(Sum("n"))
    )
    tabs = [t for t in ray.get(vocab_tbl.to_arrow_refs()) if len(t)]
    vt = (
        pa.concat_tables(tabs)
        if tabs
        else pa.table(
            {"w": pa.array([], pa.string()), "sum(n)": pa.array([], pa.int64())}
        )
    )
    if len(vt) > max_vocab:
        raise ValueError(
            f"bpe_train_merges: corpus vocabulary {len(vt)} exceeds "
            f"max_vocab={max_vocab} — raise the cap or pre-filter"
        )
    words = vt["w"].to_pylist()
    freqs = pc.cast(vt["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
    # deterministic iteration order regardless of block arrival
    order = np.argsort(np.asarray(words, dtype=object), kind="stable")
    seqs: list[list[str]] = [list(words[i]) for i in order]
    fs: list[int] = [int(freqs[i]) for i in order]

    out_l: list[str] = []
    out_r: list[str] = []
    out_c: list[int] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, fs):
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), cnt = best
        merged = la + rb
        for si, seq in enumerate(seqs):
            j = 0
            out: list[str] = []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == la and seq[j + 1] == rb:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[si] = out
        out_l.append(la)
        out_r.append(rb)
        out_c.append(cnt)
    return pa.table(
        {
            "merge_rank": pa.array(
                np.arange(len(out_l), dtype=np.int64)
            ),
            "left": pa.array(out_l, pa.string()),
            "right": pa.array(out_r, pa.string()),
            "pair_count": pa.array(out_c, pa.int64()),
        }
    )


def bigram_lm_scores(
    docs: ray.data.Dataset,
    text_col: str = "text",
    max_vocab: int = 5_000_000,
) -> ray.data.Dataset:
    """LM-based quality scoring (the CCNet/KenLM curation step): train
    an add-one-smoothed word-bigram LM on the corpus, then score every
    document by its total bigram log-probability.

    Pinned arithmetic (the chi2-cells discipline, adapted): each
    DISTINCT bigram's term ``ln((c_xy + 1) / (c_x + V))`` is quantized
    ONCE to int64 micro-nats — ``floor(ln(d) * 1e6)`` with one exact
    int→double division and libm ``ln`` (math.log, NOT np.log — the
    ``bm25_score`` 1-ulp lesson) — so the per-document score is an
    INT64 SUM, order-independent under any partitioning, and the SQL
    mirror evaluates the identical expression tree bit-for-bit.

    Scale shape: two vocabulary-bounded exchanges (unigram counts,
    bigram counts); the term table is built once per DISTINCT bigram
    (never per occurrence) behind a loud ``max_vocab`` guard and
    broadcast via ``ray.put`` — at a corpus where the bigram vocabulary
    exceeds the guard, swap the broadcast for a hash-bucket semi-join
    of pair rows against the term table (``relational.hash_bucket_
    join``); the quantized-term factoring is unchanged.

    Output: (doc_id, n_pairs, logprob_micronats) for documents with at
    least one adjacent pair (docs with <2 tokens carry no LM evidence
    and are excluded, matching the SQL mirror's join semantics).
    """
    import math

    import pandas as pd

    def _pair_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1), " "
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        mask = np.ones(n - 1, dtype=bool)
        interior = offsets[1:-1]
        interior = interior[(interior > 0) & (interior < n)]
        mask[interior - 1] = False
        g = (
            pa.table({"bigram": joined.filter(pa.array(mask))})
            .group_by("bigram")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["bigram", "n"])

    def _uni_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        g = (
            pa.table({"w": toks.flatten()})
            .group_by("w")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["w", "n"])

    uni = (
        docs.map_batches(_uni_partial, batch_format="pyarrow")
        .groupby("w")
        .sum("n")
        .to_pandas()  # bounded: unigram vocabulary (max_vocab guard below)
    )
    if len(uni) > max_vocab:
        raise ValueError(
            f"bigram_lm_scores: unigram vocabulary {len(uni)} exceeds "
            f"max_vocab={max_vocab} — broadcast would not fit; use the "
            "hash-bucket semi-join variant documented in the docstring"
        )
    V = len(uni)
    cx_lut = dict(zip(uni["w"], uni["sum(n)"].astype(np.int64)))

    big = (
        docs.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
        .to_pandas()  # bounded: bigram vocabulary (same guard class)
    )
    if len(big) > max_vocab:
        raise ValueError(
            f"bigram_lm_scores: bigram vocabulary {len(big)} exceeds "
            f"max_vocab={max_vocab}"
        )
    # one quantized term per DISTINCT bigram: floor(ln(d) * 1e6), libm ln
    w1_of = big["bigram"].str.split(" ", n=1).str[0]
    cxy = big["sum(n)"].astype(np.int64).to_numpy()
    cx_arr = w1_of.map(cx_lut).to_numpy(dtype=np.int64)
    terms = np.array(
        [
            math.floor(math.log((int(a) + 1) / (int(b) + V)) * 1_000_000.0)
            for a, b in zip(cxy, cx_arr)
        ],
        dtype=np.int64,
    )
    term_lut = pd.Series(terms, index=big["bigram"].to_numpy())
    import ray as _ray

    term_ref = _ray.put(term_lut)

    def _score(b: pa.Table) -> pa.Table:
        lut = _ray.get(term_ref)
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        n = len(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        n_pairs = np.maximum(lens - 1, 0)
        keep_doc = n_pairs > 0
        if n < 2 or not keep_doc.any():
            return pa.table(
                {
                    "doc_id": b["doc_id"].filter(pa.array(keep_doc)),
                    "n_pairs": pa.array([], pa.int64()),
                    "logprob_micronats": pa.array([], pa.int64()),
                }
            )
        joined = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1), " "
        )
        mask = np.ones(n - 1, dtype=bool)
        interior = offsets[1:-1]
        interior = interior[(interior > 0) & (interior < n)]
        mask[interior - 1] = False
        pair_terms = (
            pd.Series(joined.filter(pa.array(mask)).to_pylist()).map(lut).to_numpy(
                dtype=np.int64
            )
        )  # training corpus ⇒ every pair is in the table (map never NaNs)
        starts = np.r_[0, np.cumsum(n_pairs[keep_doc])[:-1]].astype(np.int64)
        sums = np.add.reduceat(pair_terms, starts)
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep_doc)),
                "n_pairs": pa.array(n_pairs[keep_doc], pa.int64()),
                "logprob_micronats": pa.array(sums, pa.int64()),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")


def kgram_dup_coverage(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    max_dup_shingles: int = 10_000_000,
) -> ray.data.Dataset:
    """Exact substring-duplication coverage (the Lee et al. exact-
    substring dedup signal): the fraction of each document's k-token
    shingles that also appear in at least one OTHER document.

    Plan: one distinct-(shingle, doc) exchange keyed by shingle (every
    shingle's postings co-locate; a per-group distinct-doc count needs
    no second shuffle), the ≥2-doc shingle set broadcast behind a loud
    cap (scale path: hash-bucket semi-join instead of broadcast — the
    set itself is produced distributed either way), then one scoring
    pass. Exact string keys end-to-end — no rolling-hash collisions to
    reason about; a production 100-TB variant would key the exchange by
    a 128-bit shingle hash and attach strings only for verification
    (the MinHash attach-verify discipline, ``dedup.py``).

    Output: (doc_id, n_kgrams, n_dup_kgrams) for docs with ≥k tokens.
    """
    import pandas as pd

    import ray as _ray

    def _shingles_of(b: pa.Table):
        toks = pc.split_pattern(b[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        n = len(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        n_kg = np.maximum(lens - (k - 1), 0)
        if n < k or n_kg.sum() == 0:
            return None, n_kg
        joined = flat.slice(0, n - (k - 1))
        for j in range(1, k):
            joined = pc.binary_join_element_wise(
                joined, flat.slice(j, n - (k - 1)), " "
            )
        # valid positions: those not crossing a document boundary
        pos = np.arange(n - (k - 1))
        doc_of = np.repeat(np.arange(len(lens)), lens)[: n - (k - 1)]
        end_of_doc = np.repeat(offsets[1:], lens)[: n - (k - 1)]
        valid = pos + k <= end_of_doc
        _ = doc_of
        return joined.filter(pa.array(valid)), n_kg

    def _pair_partial(b: pa.Table) -> pa.Table:
        sh, n_kg = _shingles_of(b)
        if sh is None:
            return pa.table(
                {
                    "shingle": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        doc_ids = pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        rep = np.repeat(doc_ids, n_kg)
        g = (
            pa.table({"shingle": sh, "doc_id": pa.array(rep, pa.int64())})
            .group_by(["shingle", "doc_id"])
            .aggregate([])
        )  # block-side distinct
        return g

    # two vectorized aggregates (no per-group Python): global distinct
    # (shingle, doc) pairs, then docs-per-shingle — both Arrow-native
    # reduce kernels inside Ray's sort-based groupby
    distinct_pairs = (
        docs.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby(["shingle", "doc_id"])
        .count()
    )
    counts = (
        distinct_pairs.map_batches(
            lambda b: b.select(["shingle"]), batch_format="pyarrow"
        )
        .groupby("shingle")
        .count()
    )
    dup = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["count()"], 2)).select(["shingle"]),
        batch_format="pyarrow",
    ).to_pandas()  # bounded: ≥2-doc shingle set (loud cap below)
    if len(dup) > max_dup_shingles:
        raise ValueError(
            f"kgram_dup_coverage: {len(dup)} duplicated shingles exceed "
            f"max_dup_shingles={max_dup_shingles} — use the hash-bucket "
            "semi-join variant documented in the docstring"
        )
    # an all-empty Ray dataset loses its schema in to_pandas — a corpus
    # with NO cross-doc duplication is a legal (good!) outcome
    dup_vals = (
        dup["shingle"].to_numpy() if "shingle" in dup.columns else np.array([], object)
    )
    dup_sorted = np.sort(dup_vals)
    dup_ref = _ray.put(dup_sorted)

    def _score(b: pa.Table) -> pa.Table:
        dups = _ray.get(dup_ref)
        sh, n_kg = _shingles_of(b)
        keep_doc = n_kg > 0
        if sh is None:
            return pa.table(
                {
                    "doc_id": b["doc_id"].filter(pa.array(keep_doc)),
                    "n_kgrams": pa.array([], pa.int64()),
                    "n_dup_kgrams": pa.array([], pa.int64()),
                }
            )
        arr = np.asarray(sh.to_pylist(), dtype=object)
        if len(dups):
            i = np.searchsorted(dups, arr)
            i = np.clip(i, 0, len(dups) - 1)
            hit = (dups[i] == arr).astype(np.int64)
        else:
            hit = np.zeros(len(arr), dtype=np.int64)
        starts = np.r_[0, np.cumsum(n_kg[keep_doc])[:-1]].astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep_doc)),
                "n_kgrams": pa.array(n_kg[keep_doc], pa.int64()),
                "n_dup_kgrams": pa.array(
                    np.add.reduceat(hit, starts) if len(arr) else [], pa.int64()
                ),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")
