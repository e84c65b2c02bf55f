"""High-key-cardinality correctness for the coarse-partition sweep
operators (stages/sweep.py pattern).

The driver testdata has ~150 users / 5 event types — far too few to
exercise the many-keys path these operators are shaped for. Here a
50k-user synthetic event table checks each rewritten operator against a
single-process pandas/NumPy oracle, including keys that hash into the
same coarse partition and users whose events span many blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

N_USERS = 50_000
N_ROWS = 300_000
US = 1_000_000


@pytest.fixture(scope="module")
def highcard_df() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    uid = rng.integers(0, N_USERS, N_ROWS).astype(np.int64)
    ts = rng.integers(0, 30 * 86_400 * US, N_ROWS).astype(np.int64)
    val = rng.integers(0, 10_000, N_ROWS).astype(np.int64) / 100.0
    etype = np.array(["t%04d" % t for t in rng.integers(0, 2_000, N_ROWS)])
    return pd.DataFrame(
        {
            "event_id": np.arange(N_ROWS, dtype=np.int64),
            "user_id": uid,
            "ts": ts,
            "value": val,
            "event_type": etype,
        }
    )


@pytest.fixture(scope="module")
def highcard_ds(highcard_df, ray_session) -> ray.data.Dataset:
    t = pa.Table.from_pandas(highcard_df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    # many small blocks so per-user rows genuinely span blocks
    return ray.data.from_arrow(t).repartition(40)


def test_first_event_highcard(highcard_ds, highcard_df):
    from workbook_exporter_fe_ray.stages.relational import first_event_per_user

    got = (
        first_event_per_user(highcard_ds, num_partitions=16)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        highcard_df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        .groupby("user_id", as_index=False)
        .first()[["user_id", "ts", "event_type"]]
        .rename(columns={"ts": "first_ts", "event_type": "first_type"})
    )
    assert len(got) == len(want)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (
        got["first_ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        == want["first_ts"].to_numpy()
    ).all()
    assert (got["first_type"].to_numpy() == want["first_type"].to_numpy()).all()


def test_topn_per_group_highcard(highcard_ds, highcard_df):
    from workbook_exporter_fe_ray.stages.relational import topn_per_group

    got = (
        topn_per_group(highcard_ds, n=3, num_partitions=16)
        .to_pandas()
        .sort_values(["source", "event_id"])
        .reset_index(drop=True)
    )
    df = highcard_df.sort_values(
        ["event_type", "value", "event_id"],
        ascending=[True, False, True],
        kind="stable",
    )
    want = (
        df.groupby("event_type", as_index=False)
        .head(3)[["event_type", "event_id", "value"]]
        .rename(columns={"event_type": "source"})
        .sort_values(["source", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_sessionize_highcard(highcard_ds, highcard_df):
    from workbook_exporter_fe_ray.stages.relational import sessionize

    got = (
        sessionize(highcard_ds, gap_s=3600, num_partitions=16)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    gap_us = 3600 * US
    rows = []
    for uid, grp in highcard_df.groupby("user_id"):
        ts = np.sort(grp["ts"].to_numpy())
        new_s = np.r_[True, np.diff(ts) > gap_us]
        starts = np.flatnonzero(new_s)
        lens = np.diff(np.r_[starts, len(ts)])
        rows.append((uid, len(starts), int(lens.max()), len(ts)))
    want = pd.DataFrame(
        rows, columns=["user_id", "n_sessions", "max_session_events", "n_events"]
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_highcard(highcard_df, ray_session):
    import duckdb

    from workbook_exporter_fe_ray.stages.sketch import grouped_quantiles

    t = pa.Table.from_pandas(
        highcard_df[["event_type", "event_id"]].rename(
            columns={"event_type": "source", "event_id": "n_chars"}
        ),
        preserve_index=False,
    )
    ds = ray.data.from_arrow(t).repartition(20)
    got = (
        grouped_quantiles(ds, key="source", value_col="n_chars")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", highcard_df)
    want = con.sql(
        """
        SELECT event_type AS source,
               quantile_disc(event_id, 0.50) AS p50,
               quantile_disc(event_id, 0.90) AS p90,
               count(*) AS n_rows
        FROM d GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert len(got) == len(want)
    assert (got["p50"].to_numpy() == want["p50"].to_numpy()).all()
    assert (got["p90"].to_numpy() == want["p90"].to_numpy()).all()
    assert (got["n_rows"].to_numpy() == want["n_rows"].to_numpy()).all()


def test_hll_distinct_highcard(highcard_ds, highcard_df):
    from workbook_exporter_fe_ray.stages.sketch import hll_distinct

    got = hll_distinct(
        highcard_ds, key="event_type", value_col="user_id"
    ).to_pandas()
    exact = highcard_df.groupby("event_type")["user_id"].nunique()
    assert len(got) == len(exact)
    for _, row in got.iterrows():
        true = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - true) / true < 0.15


def test_exact_dedup_highcard(highcard_ds, highcard_df):
    from workbook_exporter_fe_ray.stages.dedup import exact_dedup

    got = (
        exact_dedup(highcard_ds, keys=["user_id"], tie_col="event_id")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        highcard_df.sort_values(["user_id", "event_id"], kind="stable")
        .groupby("user_id", as_index=False)
        .first()
    )
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()


def test_range_join_highcard(highcard_ds, highcard_df):
    """2,000 window keys x 5 windows = 10k windows through the composite
    searchsorted counter (the driver corpus has only 5 keys), checked
    against a per-key NumPy brute force."""
    from workbook_exporter_fe_ray.stages.relational import range_join_window_counts

    window_s = 37 * 60
    got = range_join_window_counts(
        highcard_ds, key="event_type", n_windows=5, window_s=window_s
    ).to_pandas()
    got["w_start"] = got["w_start"].astype("datetime64[us]").astype(np.int64)
    got = got.sort_values(["event_type", "w_start"]).reset_index(drop=True)

    df = highcard_df
    heads = df.sort_values(["event_type", "ts", "event_id"], kind="stable").groupby(
        "event_type"
    ).head(5)
    rows = []
    for k, grp in df.groupby("event_type"):
        tsk = np.sort(grp["ts"].to_numpy())
        starts = heads.loc[heads["event_type"] == k, "ts"].to_numpy()
        cnt = np.searchsorted(tsk, starts + window_s * US, "right") - np.searchsorted(
            tsk, starts, "left"
        )
        rows += [(k, s, c) for s, c in zip(starts, cnt) if c > 0]
    want = (
        pd.DataFrame(rows, columns=["event_type", "w_start", "n_matched"])
        .groupby(["event_type", "w_start"], as_index=False)  # dup starts merge
        .sum()
        .sort_values(["event_type", "w_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["event_type"].to_numpy() == want["event_type"].to_numpy()).all()
    assert (got["w_start"].to_numpy() == want["w_start"].to_numpy()).all()
    assert (got["n_matched"].to_numpy() == want["n_matched"].to_numpy()).all()
