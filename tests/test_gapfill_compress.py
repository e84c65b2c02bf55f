"""Gap-fill correctness vs oracle + compression stage round-trip through Ray."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from workbook_exporter_fe_ray.sources import read_points_input
from workbook_exporter_fe_ray.stages.compress import compress_chunks, decompress_chunks
from workbook_exporter_fe_ray.stages.gapfill import gapfill
from workbook_exporter_fe_ray.stages.points import derive_points
from workbook_exporter_fe_ray.stages.rollup import cascade_rollup, split_tiers


@pytest.fixture(scope="module")
def tier_1m(sf_test_paths):
    pts = derive_points(read_points_input(sf_test_paths))
    return split_tiers(cascade_rollup(pts).materialize())["1m"].materialize()


@pytest.fixture(scope="module")
def oracle_1m(sf_test_paths):
    return oracle.rollup(oracle.read_points(sf_test_paths), 60)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["source", "bucket_ts_us"], kind="stable").reset_index(drop=True)
    return df[["source", "bucket_ts_us", "value", "filled"]]


@pytest.mark.parametrize("strategy", ["locf", "linear"])
def test_gapfill_matches_oracle(tier_1m, oracle_1m, strategy):
    got = gapfill(tier_1m, 60, strategy=strategy).to_pandas()
    got["bucket_ts_us"] = got["bucket_ts"].astype("int64")
    got = _norm(got)
    want = (
        oracle.gapfill_locf(oracle_1m, 60)
        if strategy == "locf"
        else oracle.gapfill_linear(oracle_1m, 60)
    )
    want = _norm(want)
    assert len(got) == len(want)
    assert list(got["source"]) == list(want["source"])
    np.testing.assert_array_equal(got["bucket_ts_us"], want["bucket_ts_us"])
    np.testing.assert_array_equal(got["filled"], want["filled"])
    np.testing.assert_array_equal(
        got["value"].to_numpy(np.float64).view(np.int64),
        want["value"].to_numpy(np.float64).view(np.int64),
        err_msg=f"gapfill {strategy}: value bits",
    )


def test_gapfill_fills_spec_gap_rate(tier_1m):
    """~3% of 1m buckets are gaps by construction (FIXTURES §1)."""
    got = gapfill(tier_1m, 60).to_pandas()
    rate = got["filled"].mean()
    assert 0.01 < rate < 0.06, rate


def test_gapfill_bad_strategy(tier_1m):
    with pytest.raises(ValueError, match="strategy"):
        gapfill(tier_1m, 60, strategy="cubic")


def test_compress_roundtrip_through_ray(sf_test_paths):
    """Chunks decode to the exact deduplicated point series (SURVEY §5.2 #3),
    and chunk bytes equal the naive oracle codec's bytes."""
    pts = derive_points(read_points_input(sf_test_paths))
    chunks = compress_chunks(pts, concurrency=2).materialize()

    cdf = chunks.to_pandas()
    assert (cdf["n_points"] > 0).all()
    # bytes vs independent naive codec, per chunk, for a sample
    want_pts = oracle.read_points(sf_test_paths)
    want_pts["chunk"] = (want_pts["ts_us"] // (86_400 * oracle.US)) * (
        86_400 * oracle.US
    )
    sample = cdf.sort_values(["source", "chunk_start_ts"]).head(5)
    for _, row in sample.iterrows():
        g = want_pts[
            (want_pts["source"] == row["source"])
            & (want_pts["chunk"] == int(pd.Timestamp(row["chunk_start_ts"]).value // 1000))
        ].sort_values("ts_us")
        assert row["n_points"] == len(g)
        assert row["ts_dod_bytes"] == oracle.encode_dod_naive(g["ts_us"].to_numpy())
        assert row["val_xor_bytes"] == oracle.encode_xor_naive(
            g["n_tok"].to_numpy().astype(np.float64)
        )

    # full decode == original dedup'd points
    dec = decompress_chunks(chunks).to_pandas()
    dec["ts_us"] = dec["ts"].astype("int64")
    dec = dec.sort_values(["source", "ts_us"], kind="stable").reset_index(drop=True)
    want = want_pts.sort_values(["source", "ts_us"], kind="stable").reset_index(drop=True)
    assert len(dec) == len(want)
    np.testing.assert_array_equal(dec["ts_us"], want["ts_us"])
    np.testing.assert_array_equal(
        dec["value"].to_numpy(np.float64),
        want["n_tok"].to_numpy().astype(np.float64),
    )
    # compression actually compresses (regular minute grid, int-valued floats)
    raw_bytes = len(want) * 16
    comp_bytes = int(cdf["ts_dod_bytes"].str.len().sum() + cdf["val_xor_bytes"].str.len().sum())
    assert comp_bytes < raw_bytes / 2, (comp_bytes, raw_bytes)


@pytest.mark.parametrize("strategy", ["locf", "linear"])
def test_gapfill_windowed_matches_unwindowed(tier_1m, strategy):
    """The windowed (unbounded-series) plan must be bit-identical to the
    one-group-per-source plan — including windows with no real points
    (gaps longer than a window)."""
    cols = ["source", "bucket_ts", "value", "filled"]
    base = (
        gapfill(tier_1m, 60, strategy=strategy)
        .to_pandas()[cols]
        .sort_values(["source", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    for wb in (30, 1440):
        win = (
            gapfill(tier_1m, 60, strategy=strategy, window_buckets=wb)
            .to_pandas()[cols]
            .sort_values(["source", "bucket_ts"], kind="stable")
            .reset_index(drop=True)
        )
        assert len(win) == len(base), wb
        assert (win["source"].to_numpy() == base["source"].to_numpy()).all()
        assert (win["bucket_ts"].to_numpy() == base["bucket_ts"].to_numpy()).all()
        np.testing.assert_array_equal(
            win["value"].to_numpy().view(np.int64),
            base["value"].to_numpy().view(np.int64),
        )
        assert (win["filled"].to_numpy() == base["filled"].to_numpy()).all()


@pytest.mark.parametrize("strategy", ["locf", "linear"])
def test_gapfill_windowed_empty_windows(ray_session, strategy):
    """A gap spanning several whole windows: every empty window's slice
    must still be emitted, filled from the cross-window carries."""
    import pyarrow as pa
    import ray.data

    US = 1_000_000
    bucket = 60 * US
    # two clusters of real points separated by ~50 windows of 10 buckets
    ts = np.array([0, 2, 3, 520, 523], dtype=np.int64) * bucket
    t = pa.table(
        {
            "source": pa.array(["s"] * len(ts)),
            "bucket_ts": pa.array(ts).cast(pa.timestamp("us")),
            "mean": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    cols = ["source", "bucket_ts", "value", "filled"]
    base = (
        gapfill(ds, 60, strategy=strategy)
        .to_pandas()[cols]
        .sort_values("bucket_ts").reset_index(drop=True)
    )
    win = (
        gapfill(ds, 60, strategy=strategy, window_buckets=10)
        .to_pandas()[cols]
        .sort_values("bucket_ts").reset_index(drop=True)
    )
    assert len(base) == 524
    assert len(win) == len(base)
    np.testing.assert_array_equal(
        win["value"].to_numpy().view(np.int64),
        base["value"].to_numpy().view(np.int64),
    )
    assert (win["filled"].to_numpy() == base["filled"].to_numpy()).all()


def test_gapfill_windowed_high_dimension_no_driver_state(ray_session):
    """VERDICT r3 item 4: the windowed plan must not hold sources ×
    windows on the driver. The plan is fully distributed by construction
    (summary → per-source anchor groups → routed anchor rows; no
    take_all, no ray.put broadcast); this pins correctness at a
    dimension (2 000 sources × ~40 windows ≈ 80 000 (source, window)
    pairs) where a driver-side dict would already dominate the test's
    footprint, and proves bit-identity against the unwindowed oracle."""
    import inspect

    import pyarrow as pa
    import ray.data

    from workbook_exporter_fe_ray.stages import gapfill as gf_mod

    # structural guard: no driver-side materialization in the windowed plan
    src = inspect.getsource(gf_mod._gapfill_windowed)
    assert "take_all" not in src and "ray.put" not in src

    US = 1_000_000
    bucket = 60 * US
    n_src, n_buckets = 2000, 400  # window_buckets=10 → ~40 windows/source
    rng = np.random.default_rng(5)
    # per-source sparse series: ~12% of buckets present → long gaps
    rows_src, rows_ts, rows_val = [], [], []
    for s in range(n_src):
        keep = rng.random(n_buckets) < 0.12
        keep[rng.integers(0, n_buckets)] = True  # ≥1 point per series
        idx = np.flatnonzero(keep)
        rows_src.append(np.full(len(idx), f"src{s:05d}"))
        rows_ts.append(idx.astype(np.int64) * bucket)
        rows_val.append(rng.integers(0, 1000, len(idx)).astype(np.float64))
    t = pa.table(
        {
            "source": pa.array(np.concatenate(rows_src)),
            "bucket_ts": pa.array(np.concatenate(rows_ts)).cast(pa.timestamp("us")),
            "mean": pa.array(np.concatenate(rows_val)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    cols = ["source", "bucket_ts", "value", "filled"]
    base = (
        gapfill(ds, 60, strategy="locf")
        .to_pandas()[cols]
        .sort_values(["source", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    win = (
        gapfill(ds, 60, strategy="locf", window_buckets=10)
        .to_pandas()[cols]
        .sort_values(["source", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(win) == len(base) > n_src * 40  # dense grids materialized
    np.testing.assert_array_equal(
        win["value"].to_numpy().view(np.int64),
        base["value"].to_numpy().view(np.int64),
    )
    assert (win["filled"].to_numpy() == base["filled"].to_numpy()).all()
