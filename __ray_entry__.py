"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Each ``queries()`` entry is one operator/pipeline from SURVEY.md §2 (or
a training-data op mandated by the brief); ``oracle_sql()`` holds the
DuckDB-equivalent SQL over the same parquet views where expressible.
Column names match exactly between both sides. Float-aggregate results
use exact integer cents (the events corpus is 2-decimal) so sums are
exact int64 and means are single int→float divisions — hash-identical
across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


# --------------------------------------------------------------------------
# helpers (lazy imports keep module import cheap for the driver)
# --------------------------------------------------------------------------


def _events(sf_dir: str) -> ray.data.Dataset:
    from workbook_exporter_fe_ray.sources import read_table

    return read_table(f"{sf_dir}/events.parquet")


def _documents(sf_dir: str) -> ray.data.Dataset:
    from workbook_exporter_fe_ray.sources import read_table

    return read_table(f"{sf_dir}/documents.parquet")


def _embeddings(sf_dir: str) -> ray.data.Dataset:
    from workbook_exporter_fe_ray.sources import read_table

    return read_table(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# individual queries
# --------------------------------------------------------------------------


def _q_rollup(bucket_s: int):
    def f(sf_dir: str):
        from workbook_exporter_fe_ray.pipelines.events import rollup_events

        return rollup_events(sf_dir, bucket_s)

    return f


def _q_rollup_cascade(fine_s: int, coarse_s: int):
    def f(sf_dir: str):
        from workbook_exporter_fe_ray.pipelines.events import rollup_events_cascade

        return rollup_events_cascade(sf_dir, fine_s, coarse_s)

    return f


def _q_gapfill(strategy: str):
    def f(sf_dir: str):
        from workbook_exporter_fe_ray.pipelines.events import gapfill_events_1h

        return gapfill_events_1h(sf_dir, strategy)

    return f


def _q_dedup_first_event(sf_dir: str):
    from ray.data.aggregate import Count, Min

    agg = _events(sf_dir).groupby("user_id").aggregate(Min("ts"), Count())

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "first_ts": b["min(ts)"],
                "n_events": pc.cast(b["count()"], pa.int64()),
            }
        )

    return agg.map_batches(_rename, batch_format="pyarrow")


def _q_dedup_exact_text(sf_dir: str):
    from workbook_exporter_fe_ray.stages.dedup import exact_dedup_by_content_hash

    return exact_dedup_by_content_hash(_documents(sf_dir), "text", "doc_id")


def _q_filter_project(sf_dir: str):
    ds = _events(sf_dir).filter(expr="event_type == 'purchase'")
    return ds.select_columns(["event_id", "user_id", "value"])


def _q_explode_tokens(sf_dir: str):
    def _explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), lengths)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "token": pc.list_flatten(toks)}
        )

    return _documents(sf_dir).map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_topk_sources(sf_dir: str):
    from ray.data.aggregate import Count

    agg = _events(sf_dir).groupby("event_type").aggregate(Count())

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"source": b["event_type"], "n": pc.cast(b["count()"], pa.int64())}
        )

    renamed = agg.map_batches(_rename, batch_format="pyarrow")
    return renamed.sort(["n", "source"], descending=[True, False]).limit(5)


def _q_group_users(sf_dir: str):
    """count + count-distinct via two-level groupby (no driver loops)."""
    from ray.data.aggregate import Count, Sum

    per_user = _events(sf_dir).groupby(["event_type", "user_id"]).aggregate(Count())

    def _partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "event_type": b["event_type"],
                    "n_events": pc.cast(b["count()"], pa.int64()),
                }
            )
            .group_by("event_type")
            .aggregate([("n_events", "sum"), ("n_events", "count")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n_events": g["n_events_sum"],
                "n_users": pc.cast(g["n_events_count"], pa.int64()),
            }
        )

    partials = per_user.map_batches(_partial, batch_format="pyarrow")
    merged = partials.groupby("event_type").aggregate(Sum("n_events"), Sum("n_users"))

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "n_events": pc.cast(b["sum(n_events)"], pa.int64()),
                "n_users": pc.cast(b["sum(n_users)"], pa.int64()),
            }
        )

    return merged.map_batches(_rename, batch_format="pyarrow")


def _q_token_count(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from workbook_exporter_fe_ray.stages.text import token_count_batch

    counted = _documents(sf_dir).map_batches(
        lambda b: token_count_batch(b), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = counted.groupby("source").aggregate(Count(), Sum("n_tokens"))

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pc.cast(b["count()"], pa.int64()),
                "total_tokens": pc.cast(b["sum(n_tokens)"], pa.int64()),
            }
        )

    return agg.map_batches(_rename, batch_format="pyarrow")


def _q_quality(sf_dir: str):
    from workbook_exporter_fe_ray.stages.text import quality_batch

    scored = _documents(sf_dir).map_batches(
        lambda b: quality_batch(b), batch_format="pyarrow", zero_copy_batch=True
    )
    return scored.select_columns(["doc_id", "n_words", "avg_word_len"])


def _q_fingerprint(sf_dir: str):
    from workbook_exporter_fe_ray.stages.text import fingerprint_batch

    fp = _documents(sf_dir).map_batches(
        lambda b: fingerprint_batch(b), batch_format="pyarrow", zero_copy_batch=True
    )
    return fp.select_columns(["doc_id", "md5"])


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.stages.similarity import topk_cosine

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qrow = qtbl.filter(pc.equal(qtbl["vec_id"], 0))
    query = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
    top = topk_cosine(_embeddings(sf_dir), query, k=10)
    return top.select_columns(["vec_id"])


def _q_lang_id(sf_dir: str):
    from workbook_exporter_fe_ray.stages.text import LangId

    out = _documents(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    )
    return out.select_columns(["doc_id", "lang_pred"])


def _q_minhash_pairs(sf_dir: str):
    from workbook_exporter_fe_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_documents(sf_dir), threshold=0.35)


def _q_simhash_pairs(sf_dir: str):
    from workbook_exporter_fe_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_documents(sf_dir))


def _q_cosine_neardup(sf_dir: str):
    from workbook_exporter_fe_ray.stages.similarity import cosine_neardup_pairs

    # the driver corpus is near-random (max pairwise cosine ≈ 0.51);
    # 0.4 exercises the real pair-emitting path
    return cosine_neardup_pairs(_embeddings(sf_dir), threshold=0.4)


def _q_gapfill_linear(sf_dir: str):
    from workbook_exporter_fe_ray.pipelines.events import gapfill_events_1h

    return gapfill_events_1h(sf_dir, "linear")


def _q_compress_chunks(sf_dir: str):
    from workbook_exporter_fe_ray.pipelines.events import compress_events

    chunks = compress_events(sf_dir)

    def _stats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "chunk_start_ts": b["chunk_start_ts"],
                "n_points": pc.cast(b["n_points"], pa.int64()),
                "ts_bytes": pa.array(
                    [len(x) for x in b["ts_dod_bytes"].to_pylist()], pa.int64()
                ),
                "val_bytes": pa.array(
                    [len(x) for x in b["val_xor_bytes"].to_pylist()], pa.int64()
                ),
            }
        )

    return chunks.map_batches(_stats, batch_format="pyarrow")


def _q_flagship_synthetic(sf_dir: str):
    """The authoritative tokenized-sequence cascade on a deterministic
    synthetic table (generated under /tmp, cached). Rows-only check —
    bit-identity vs the independent oracle is asserted in pytest."""
    import os

    from workbook_exporter_fe_ray import datagen
    from workbook_exporter_fe_ray.sources import read_points_input
    from workbook_exporter_fe_ray.stages.points import derive_points
    from workbook_exporter_fe_ray.stages.rollup import cascade_rollup

    d = "/tmp/wfer_flagship_sf"
    if not os.path.isdir(d) or not os.listdir(d):
        datagen.generate(d, n_sources=8, base_seqs=600, seed=42, n_shards=4)
    paths = sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
    return cascade_rollup(derive_points(read_points_input(paths)))


def _q_multimodal(sf_dir: str):
    from workbook_exporter_fe_ray.stages.multimodal import (
        decode_pipeline,
        synth_media_table,
    )

    ds = ray.data.from_arrow(synth_media_table(64))
    out = decode_pipeline(ds, fake=True)
    return out.select_columns(
        ["media_id", "media_type", "payload_bytes", "decode_checksum"]
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: full 1m→5m→1h→1d continuous-aggregate cascade over the
    sf0.001 events stream (all tiers tagged + unioned)."""
    from workbook_exporter_fe_ray.pipelines.events import events_flagship

    return events_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- tiered rollups / continuous aggregates (north rule core) ---
        "rollup_1m": _q_rollup(60),
        "rollup_5m": _q_rollup(300),
        "rollup_1h_cascade": _q_rollup_cascade(60, 3600),
        "rollup_1d_cascade": _q_rollup_cascade(3600, 86_400),
        "gapfill_locf_1h": _q_gapfill("locf"),
        "gapfill_linear_1h": _q_gapfill_linear,
        "compress_chunks_events": _q_compress_chunks,
        "flagship_synthetic_cascade": _q_flagship_synthetic,
        # --- reference operator semantics (SURVEY §2) ---
        "filter_project": _q_filter_project,          # F1/F5
        "explode_tokens": _q_explode_tokens,          # F7 explode
        "topk_sources": _q_topk_sources,              # O1 sort + limit
        "group_users": _q_group_users,                # A1/A2 group + distinct
        "dedup_first_event": _q_dedup_first_event,    # ST2/J1 first-per-key
        "dedup_exact_text": _q_dedup_exact_text,      # exact content dedup
        # --- training-data ops ---
        "token_count": _q_token_count,
        "quality_score": _q_quality,
        "doc_fingerprint": _q_fingerprint,
        "lang_id": _q_lang_id,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "cosine_neardup": _q_cosine_neardup,
        "ann_topk": _q_ann_topk,
        "multimodal_decode": _q_multimodal,
    }


_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _rollup_sql(bucket_expr: str) -> str:
    return f"""
SELECT event_type AS source,
       {bucket_expr} AS bucket_ts,
       count(*) AS n_points,
       CAST(sum({_CENTS}) AS BIGINT) AS sum_cents,
       min({_CENTS}) AS min_cents,
       max({_CENTS}) AS max_cents,
       CAST(CAST(sum({_CENTS}) AS BIGINT) AS DOUBLE) / count(*) AS mean_cents
FROM events
GROUP BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m": _rollup_sql("date_trunc('minute', ts)"),
        "rollup_5m": _rollup_sql("time_bucket(INTERVAL '5 minutes', ts)"),
        "rollup_1h_cascade": _rollup_sql("date_trunc('hour', ts)"),
        "rollup_1d_cascade": _rollup_sql("date_trunc('day', ts)"),
        "gapfill_locf_1h": f"""
WITH t AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_ts,
         CAST(CAST(sum({_CENTS}) AS BIGINT) AS DOUBLE) / count(*) AS mean_cents
  FROM events GROUP BY 1, 2),
bounds AS (SELECT source, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM t GROUP BY 1),
grid AS (
  SELECT b.source, gs.ts AS bucket_ts
  FROM bounds b, LATERAL unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS gs(ts)),
j AS (
  SELECT g.source, g.bucket_ts, t.mean_cents, t.bucket_ts IS NULL AS filled
  FROM grid g LEFT JOIN t ON g.source = t.source AND g.bucket_ts = t.bucket_ts)
SELECT source, bucket_ts,
       last_value(mean_cents IGNORE NULLS)
         OVER (PARTITION BY source ORDER BY bucket_ts) AS value,
       filled
FROM j
""",
        "filter_project": "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
        "explode_tokens": "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents",
        "topk_sources": """
SELECT event_type AS source, count(*) AS n FROM events
GROUP BY 1 ORDER BY n DESC, source LIMIT 5
""",
        "group_users": """
SELECT event_type AS source, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
        "dedup_first_event": """
SELECT user_id, min(ts) AS first_ts, count(*) AS n_events
FROM events GROUP BY user_id
""",
        "dedup_exact_text": """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS content_hash
FROM documents GROUP BY md5(text)
""",
        "token_count": """
SELECT source, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY source
""",
        "quality_score": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len
FROM documents
""",
        "doc_fingerprint": "SELECT doc_id, md5(text) AS md5 FROM documents",
        "ann_topk": """
SELECT e.vec_id
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
LIMIT 10
""",
    }
