"""r5 text operators: bigram-LM quality scoring and exact k-gram
duplication coverage — engineered-corpus truth + partition invariance."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from workbook_exporter_fe_ray.stages.text import (
    bigram_lm_scores,
    kgram_dup_coverage,
)


def _docs_ds(texts, ids=None, blocks=1):
    ids = ids if ids is not None else list(range(len(texts)))
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def _lm_reference(texts, ids):
    """Independent reference: build counts with plain dicts, score with
    math.log — the same spec, none of the engine's machinery."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for i, t in zip(ids, texts):
        ws = t.split(" ")
        if len(ws) < 2:
            continue
        s = 0
        for a, b in zip(ws, ws[1:]):
            s += math.floor(
                math.log((big[(a, b)] + 1) / (uni[a] + V)) * 1_000_000.0
            )
        out[i] = (len(ws) - 1, s)
    return out


def test_bigram_lm_matches_reference(ray_session):
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "mat",  # single token: excluded (no pairs)
        "a b a b a b",
        "the the the",
    ]
    ids = [10, 11, 12, 13, 14]
    want = _lm_reference(texts, ids)
    got = bigram_lm_scores(_docs_ds(texts, ids)).to_pandas().set_index("doc_id")
    assert set(got.index) == set(want)
    for i, (np_, s) in want.items():
        assert got.loc[i, "n_pairs"] == np_
        assert got.loc[i, "logprob_micronats"] == s


def test_bigram_lm_partition_invariant(ray_session):
    rng = np.random.default_rng(6)
    vocab = [f"w{j}" for j in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(2, 40)).tolist()) for _ in range(60)
    ]
    a = (
        bigram_lm_scores(_docs_ds(texts, blocks=1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bigram_lm_scores(_docs_ds(texts, blocks=7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_kgram_dup_planted(ray_session):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly k=8
    texts = [
        f"intro words here {shared} trailing one",
        f"{shared} completely different tail text",
        "no duplication in this document at all kept unique",
        "short doc",  # < 8 tokens: excluded
    ]
    got = (
        kgram_dup_coverage(_docs_ds(texts), k=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [0, 1, 2]  # doc 3 excluded
    # doc0: 13 tokens → 6 kgrams; the shared 8-gram starts at pos 3
    assert got.loc[0, "n_kgrams"] == 6 and got.loc[0, "n_dup_kgrams"] == 1
    # doc1: 12 tokens → 5 kgrams; shared at pos 0
    assert got.loc[1, "n_kgrams"] == 5 and got.loc[1, "n_dup_kgrams"] == 1
    assert got.loc[2, "n_dup_kgrams"] == 0


def test_kgram_dup_within_doc_repeat_not_counted(ray_session):
    """A shingle repeated WITHIN one doc only is not cross-doc
    duplication (distinct-doc count is 1)."""
    span = "a b c d e f g h"
    texts = [f"{span} x {span}", "totally different words for the other doc here"]
    got = kgram_dup_coverage(_docs_ds(texts), k=8).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_dup_kgrams"] == 0


def test_kgram_dup_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"t{j}" for j in range(6)]  # tiny vocab + k=3 → natural dups
    texts = [
        " ".join(rng.choice(vocab, rng.integers(8, 30)).tolist()) for _ in range(40)
    ]
    a = (
        kgram_dup_coverage(_docs_ds(texts, blocks=1), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        kgram_dup_coverage(_docs_ds(texts, blocks=5), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["n_dup_kgrams"] > 0).any()  # the tiny vocab really collides


def test_bigram_lm_vocab_guard(ray_session):
    with pytest.raises(ValueError, match="max_vocab"):
        bigram_lm_scores(_docs_ds(["a b c d e f g h"]), max_vocab=3).to_pandas()
