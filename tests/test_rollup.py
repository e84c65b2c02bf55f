"""Golden-fixture tier tests: every rolled-up point at every tier must be
BIT-identical to the independent pandas oracle (BASELINE.json north_star)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from workbook_exporter_fe_ray.sources import read_points_input
from workbook_exporter_fe_ray.stages.points import derive_points
from workbook_exporter_fe_ray.stages.rollup import (
    cascade_from_tier,
    cascade_rollup,
    rollup_tier,
    split_tiers,
)


def _tier_to_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["bucket_ts_us"] = df["bucket_ts"].astype("int64")
    df = df.sort_values(["source", "bucket_ts_us"], kind="stable").reset_index(drop=True)
    return df[["source", "bucket_ts_us", "count", "sum", "min", "max", "mean"]]


def _assert_bit_identical(got: pd.DataFrame, want: pd.DataFrame, tier: str):
    want = want.sort_values(["source", "bucket_ts_us"], kind="stable").reset_index(
        drop=True
    )
    assert len(got) == len(want), f"{tier}: row count {len(got)} != {len(want)}"
    assert list(got["source"]) == list(want["source"]), f"{tier}: source mismatch"
    for col in ("bucket_ts_us", "count", "sum", "min", "max"):
        np.testing.assert_array_equal(
            got[col].to_numpy(), want[col].to_numpy(), err_msg=f"{tier}:{col}"
        )
    # float64 bit-pattern equality for mean
    gm = got["mean"].to_numpy(np.float64).view(np.int64)
    wm = want["mean"].to_numpy(np.float64).view(np.int64)
    np.testing.assert_array_equal(gm, wm, err_msg=f"{tier}:mean bits")


@pytest.fixture(scope="module")
def oracle_tiers(sf_test_paths):
    pts = oracle.read_points(sf_test_paths)
    return oracle.all_tiers(pts)


@pytest.fixture(scope="module")
def engine_rollup(sf_test_paths):
    pts = derive_points(read_points_input(sf_test_paths))
    return cascade_rollup(pts).materialize()


@pytest.mark.parametrize("tier", ["1m", "5m", "1h", "1d"])
def test_cascade_tier_bit_identical(engine_rollup, oracle_tiers, tier):
    got = _tier_to_df(split_tiers(engine_rollup)[tier])
    _assert_bit_identical(got, oracle_tiers[tier], tier)


def test_generic_rollup_matches_cascade_1m(sf_test_paths, oracle_tiers):
    """The generic two-phase salted path (no dedup) over pre-deduplicated
    points must equal the oracle 1m tier — and be salt-invariant."""
    pts_df = oracle.read_points(sf_test_paths)
    import ray.data

    ds = ray.data.from_pandas(pts_df.rename(columns={"ts_us": "ts"})).repartition(8)
    for salt in (None, 4):
        out = rollup_tier(ds, 60, value_col="n_tok", salt_mod=salt)
        df = out.to_pandas()
        df["bucket_ts_us"] = df["bucket_ts"].astype("int64")
        df["sum"] = df["sum"].astype("int64")
        df["mean"] = df["sum"].to_numpy(np.int64).astype(np.float64) / df[
            "count"
        ].to_numpy(np.int64).astype(np.float64)
        df = df.sort_values(["source", "bucket_ts_us"], kind="stable").reset_index(
            drop=True
        )
        _assert_bit_identical(
            df[["source", "bucket_ts_us", "count", "sum", "min", "max", "mean"]],
            oracle_tiers["1m"],
            f"generic-1m salt={salt}",
        )


def test_cascade_from_tier_associativity(engine_rollup, oracle_tiers):
    """1h built from the 5m tier's partials == 1h built from raw (cascade
    correctness / associativity)."""
    t5 = split_tiers(engine_rollup)["5m"]
    t1h = cascade_from_tier(t5, 3600)
    df = t1h.to_pandas()
    df["bucket_ts_us"] = df["bucket_ts"].astype("int64")
    df = df.sort_values(["source", "bucket_ts_us"], kind="stable").reset_index(drop=True)
    _assert_bit_identical(
        df[["source", "bucket_ts_us", "count", "sum", "min", "max", "mean"]],
        oracle_tiers["1h"],
        "1h-from-5m",
    )


def test_packed_equals_unpacked(sf_test_paths):
    """The segment-packed exchange must be bit-identical to the raw-row
    shuffle path (same dedup, same cascade) — the A/B guard for the
    combiner that carries the 100 TB design."""
    pts = derive_points(read_points_input(sf_test_paths))
    a = _tier_to_df(cascade_rollup(pts, packed=True))
    b = _tier_to_df(cascade_rollup(pts, packed=False))
    pd.testing.assert_frame_equal(a, b)


def test_block_count_invariance(sf_test_paths, oracle_tiers):
    """Same input at different block counts (the knob parallelism turns)
    must produce bit-identical tiers — cross-block duplicate rows and
    fragment merges included (SURVEY §5.2 #6)."""
    for nb in (1, 3, 17):
        pts = derive_points(
            read_points_input(sf_test_paths).repartition(nb)
        )
        got = _tier_to_df(split_tiers(cascade_rollup(pts).materialize())["1m"])
        _assert_bit_identical(got, oracle_tiers["1m"], f"nb={nb}")


def test_segment_const_delta_elision_roundtrip():
    """Constant-delta runs ship no delta list; irregular runs keep the
    explicit list — decode must be bit-exact for both, mixed in one
    group, and the regular path must actually elide (empty ts_deltas)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from workbook_exporter_fe_ray.schema import EPOCH0_US
    from workbook_exporter_fe_ray.stages.rollup import (
        _pack_day_segments,
        decode_segments,
    )

    rng = np.random.default_rng(3)
    # regular grid source + irregular source + single-point source
    reg_ts = EPOCH0_US + np.arange(500, dtype=np.int64) * 60_000_000
    irr_ts = EPOCH0_US + np.sort(
        rng.choice(np.arange(1, 86_400, dtype=np.int64) * 1_000_000, 400, replace=False)
    )
    one_ts = np.array([EPOCH0_US + 123_000_000], dtype=np.int64)
    tbl = pa.table(
        {
            "source": pa.array(["reg"] * 500 + ["irr"] * 400 + ["one"]),
            "ts": pa.array(np.r_[reg_ts, irr_ts, one_ts]).cast(pa.timestamp("us")),
            "n_tok": pa.array(rng.integers(1, 400, 901).astype(np.int32)),
        }
    )
    seg = _pack_day_segments(tbl, "n_tok")
    const = seg["const_delta"].to_numpy(zero_copy_only=False)
    src = seg["source"].to_pylist()
    dl = pc.list_value_length(seg["ts_deltas"]).to_numpy(zero_copy_only=False)
    for s, c, d in zip(src, const, dl):
        if s in ("reg", "one"):
            assert c >= 0 and d == 0, (s, c, d)  # elided
        else:
            assert c == -1 and d > 0, (s, c, d)  # explicit deltas kept
    for s, want_ts in [("reg", reg_ts), ("irr", irr_ts), ("one", one_ts)]:
        g = seg.filter(pc.equal(seg["source"], s))
        ts_dec, raw = decode_segments(g)
        np.testing.assert_array_equal(ts_dec, want_ts, err_msg=s)
        m = pc.equal(tbl["source"], s)
        order = np.argsort(pc.cast(tbl.filter(m)["ts"], pa.int64()).to_numpy(zero_copy_only=False))
        np.testing.assert_array_equal(raw, tbl.filter(m)["n_tok"].to_numpy()[order])


def test_skey_collision_group_splits_exactly():
    """The packed exchange keys on the int64 blake2b-8 hash of source; a
    64-bit collision delivers TWO sources in one (skey, day) group. The
    merge kernels must split them exactly — simulated by handing the
    merge a group holding two sources directly."""
    import numpy as np
    import pyarrow as pa

    from workbook_exporter_fe_ray.schema import DEFAULT_TIERS, EPOCH0_US
    from workbook_exporter_fe_ray.stages.compress import merge_encode_chunk
    from workbook_exporter_fe_ray.stages.rollup import (
        _merge_cascade_group,
        _pack_day_segments,
    )

    ts_a = EPOCH0_US + np.arange(100, dtype=np.int64) * 60_000_000
    ts_b = EPOCH0_US + np.arange(80, dtype=np.int64) * 90_000_000
    tbl = pa.table(
        {
            "source": pa.array(["alpha"] * 100 + ["beta"] * 80),
            "ts": pa.array(np.r_[ts_a, ts_b]).cast(pa.timestamp("us")),
            "n_tok": pa.array(np.arange(180, dtype=np.int32)),
        }
    )
    seg = _pack_day_segments(tbl, "n_tok")
    # collide: force one skey for the whole group (routing key only)
    seg = seg.set_column(0, "skey", pa.array([7] * len(seg), pa.int64()))

    merged = _merge_cascade_group(seg, DEFAULT_TIERS)
    srcs = set(merged["source"].to_pylist())
    assert srcs == {"alpha", "beta"}
    # per-source totals survive the split exactly
    import pyarrow.compute as pc

    for s, n in [("alpha", 100), ("beta", 80)]:
        m = merged.filter(
            pc.and_(pc.equal(merged["source"], s), pc.equal(merged["tier"], "1m"))
        )
        assert int(pc.sum(m["count"]).as_py()) == n, s

    chunks = merge_encode_chunk(seg)
    assert set(chunks["source"].to_pylist()) == {"alpha", "beta"}
    assert sorted(chunks["n_points"].to_pylist(), reverse=True) == [100, 80]


def test_fused_flagship_bit_identical_to_separate(sf_test_paths):
    """The r5 fused plan (ONE exchange → tier rows + Gorilla chunks,
    ``fused_rollup_compress``) must be bit-identical to the two separate
    pipelines on both faces."""
    from workbook_exporter_fe_ray.stages.compress import compress_chunks
    from workbook_exporter_fe_ray.stages.rollup import fused_rollup_compress

    pts = lambda: derive_points(read_points_input(sf_test_paths))  # noqa: E731
    fused = fused_rollup_compress(pts()).to_pandas()
    casc = cascade_rollup(pts()).to_pandas()
    comp = compress_chunks(pts()).to_pandas()

    ft = (
        fused[fused["kind"] == "tier"][casc.columns.tolist()]
        .sort_values(["tier", "source", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    cs = casc.sort_values(["tier", "source", "bucket_ts"], kind="stable").reset_index(
        drop=True
    )
    assert len(ft) == len(cs)
    for col in ("tier", "source", "bucket_ts", "count", "sum", "min", "max"):
        np.testing.assert_array_equal(
            ft[col].to_numpy(), cs[col].to_numpy(), err_msg=f"tier:{col}"
        )
    np.testing.assert_array_equal(
        ft["mean"].to_numpy(np.float64).view(np.int64),
        cs["mean"].to_numpy(np.float64).view(np.int64),
        err_msg="tier:mean bits",
    )

    fc = (
        fused[fused["kind"] == "chunk"][comp.columns.tolist()]
        .sort_values(["source", "chunk_start_ts"], kind="stable")
        .reset_index(drop=True)
    )
    cc = comp.sort_values(["source", "chunk_start_ts"], kind="stable").reset_index(
        drop=True
    )
    assert len(fc) == len(cc)
    for col in comp.columns:
        np.testing.assert_array_equal(
            fc[col].to_numpy(), cc[col].to_numpy(), err_msg=f"chunk:{col}"
        )
    # tier rows carry null chunk columns and vice versa (union schema)
    assert fused[fused["kind"] == "tier"]["ts_dod_bytes"].isna().all()
    assert fused[fused["kind"] == "chunk"]["tier"].isna().all()
