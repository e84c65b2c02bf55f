"""Round-4n: user growth curve and the composed curation pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.text import corpus_curation_full
from workbook_exporter_fe_ray.stages.window import user_growth_curve

US = 1_000_000
DAY = 86_400 * US


def test_user_growth_curve_vs_brute(ray_session):
    rng = np.random.default_rng(3)
    n = 3000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 200, n).astype(np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 30 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    out = (
        user_growth_curve(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["day"] = tbl["ts"].cast(pa.int64()).to_numpy() // DAY
    first = df.groupby("user_id")["day"].min()
    exp = first.value_counts().sort_index()
    assert list(out.index) == list(exp.index)
    assert list(out["n_new_users"]) == list(exp.values)
    assert list(out["cum_users"]) == list(exp.cumsum().values)
    assert out["cum_users"].iloc[-1] == df["user_id"].nunique()


def test_corpus_curation_vs_brute(ray_session):
    rng = np.random.default_rng(21)
    texts, langs, ids = [], [], []
    for i in range(300):
        words = [f"w{k}" for k in rng.integers(0, 20, rng.integers(3, 60))]
        t = " ".join(words)
        if i % 7 == 0 and texts:  # planted exact dup of an earlier doc
            t = texts[i - 1]
        texts.append(t)
        langs.append(["en", "de", "fr"][int(rng.integers(0, 3))])
        ids.append(i)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * 300, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    out = (
        corpus_curation_full(
            ray.data.from_arrow(tbl).repartition(5), min_chars=100
        )
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    df = tbl.to_pandas()
    s = df[df["n_chars"] >= 100]
    keep = s.loc[s.groupby("text")["doc_id"].idxmin()]
    exp = keep.groupby("lang").agg(
        n_docs=("doc_id", "size"),
        sum_tokens=("text", lambda t: sum(len(x.split(" ")) for x in t)),
        sum_chars=("n_chars", "sum"),
    )
    assert out.equals(exp.sort_index().astype(np.int64))
    assert len(keep) < len(s)  # the planted dups were actually dropped
