"""Two-pass global-rank plan (stages/window.py `_rank_plan`) vs the
coarse-partition sweep: bit-identity under the adversarial shape the
plan exists for — LOW-cardinality PARTITION BY keys whose value runs
span many tiny blocks (VERDICT r3 item 1).

The global plan's correctness hinges on three broadcast offsets
(row_offset / dense_offset / cont_after) being merge-adjusted when a
value run crosses a block boundary; the fixture forces exactly that:
3 sources x 40 blocks, one source with heavy ties (8 distinct values
over 10k rows => every value run spans many blocks) and one source
with a SINGLE constant value (the whole key is one run => cont_after
must chain across every block it touches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

US = 1_000_000


@pytest.fixture(scope="module")
def tied_events(ray_session) -> ray.data.Dataset:
    rng = np.random.default_rng(11)
    n = 30_000
    src = np.array(["a", "b", "const"])[rng.integers(0, 3, n)]
    # heavy ties: 8 distinct values; source "const" collapses to ONE value
    val = rng.integers(0, 8, n).astype(np.int64) / 100.0
    val[src == "const"] = 0.42
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "ts": rng.integers(0, 30 * 86_400 * US, n).astype(np.int64),
            "value": val,
            "event_type": src,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    return ray.data.from_arrow(t).repartition(40)


def _both(fn, ds, **kw):
    got = fn(ds, plan="global", **kw).to_pandas().sort_values("event_id")
    ref = fn(ds, plan="sweep", **kw).to_pandas().sort_values("event_id")
    assert len(got) == len(ref) > 0
    return got.reset_index(drop=True), ref.reset_index(drop=True)


def test_percent_rank_global_vs_sweep(tied_events):
    from workbook_exporter_fe_ray.stages.window import percent_rank_by_value

    got, ref = _both(percent_rank_by_value, tied_events)
    assert (got["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert (
        got["prank"].to_numpy().view(np.int64)
        == ref["prank"].to_numpy().view(np.int64)
    ).all()


def test_dense_rank_global_vs_sweep(tied_events):
    from workbook_exporter_fe_ray.stages.window import dense_rank_by_value

    got, ref = _both(dense_rank_by_value, tied_events)
    assert (got["drank"].to_numpy() == ref["drank"].to_numpy()).all()
    # the constant source must be rank 1 everywhere despite spanning blocks
    const = got[got["source"] == "const"]
    assert (const["drank"] == 1).all()


def test_cume_dist_global_vs_sweep(tied_events):
    from workbook_exporter_fe_ray.stages.window import cume_dist_by_value

    got, ref = _both(cume_dist_by_value, tied_events)
    assert (
        got["cdist"].to_numpy().view(np.int64)
        == ref["cdist"].to_numpy().view(np.int64)
    ).all()
    # single-valued key: every row's run end is the key's last row => 1.0
    const = got[got["source"] == "const"]
    assert (const["cdist"] == 1.0).all()


def test_ntile_global_vs_sweep(tied_events):
    from workbook_exporter_fe_ray.stages.window import ntile_by_value

    got, ref = _both(ntile_by_value, tied_events, k=7)
    assert (got["tile"].to_numpy() == ref["tile"].to_numpy()).all()


def test_ewma_windowed_equals_sweep_bitexact(tied_events):
    """The windowed carry chain re-seeds the compiled kernel with each
    window's exact carry, so ANY window size reproduces the unwindowed
    scan bit-for-bit (the asof_join_windowed contract)."""
    from workbook_exporter_fe_ray.stages.window import ewma_per_source

    ref = (
        ewma_per_source(tied_events, alpha=0.5, plan="sweep")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for window_s in (86_400, 3_600):  # ~30 windows and ~720 windows
        got = (
            ewma_per_source(tied_events, alpha=0.5, plan="windowed", window_s=window_s)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(ref)
        assert (got["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
        assert (
            got["ewma"].to_numpy().view(np.int64)
            == ref["ewma"].to_numpy().view(np.int64)
        ).all(), f"window_s={window_s} not bit-identical"


def test_lttb_windowed_equals_sweep(tied_events):
    """The bucket-chain LTTB (one Ray task per output slot, carry =
    previously selected point, centroids from the pack manifest) must
    select EXACTLY the rows the one-task-per-key sweep selects."""
    from workbook_exporter_fe_ray.stages.window import lttb_downsample

    ref = (
        lttb_downsample(tied_events, n_out=50, plan="sweep")
        .to_pandas()
        .sort_values(["source", "ts", "event_id"])
        .reset_index(drop=True)
    )
    got = (
        lttb_downsample(tied_events, n_out=50, plan="windowed")
        .to_pandas()
        .sort_values(["source", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref) > 0
    assert (got["event_id"].to_numpy() == ref["event_id"].to_numpy()).all()
    assert (got["value_cents"].to_numpy() == ref["value_cents"].to_numpy()).all()


def test_lttb_windowed_small_series_path(ray_session):
    """Sources with n <= 3*n_out take the single-task reference path;
    n_out >= n keeps every row."""
    import pandas as pd
    import ray.data

    n = 120
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": (np.arange(n, dtype=np.int64) * US),
            "value": (np.arange(n) % 7).astype(np.float64) / 100.0,
            "event_type": ["tiny"] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    ds = ray.data.from_arrow(t).repartition(5)
    from workbook_exporter_fe_ray.stages.window import lttb_downsample

    got = lttb_downsample(ds, n_out=50, plan="windowed").to_pandas()
    ref = lttb_downsample(ds, n_out=50, plan="sweep").to_pandas()
    assert sorted(got["event_id"]) == sorted(ref["event_id"])
    # n_out >= n -> identity
    full = lttb_downsample(ds, n_out=500, plan="windowed").to_pandas()
    assert len(full) == n


def test_windowed_pack_manifest_is_object_store_native(tied_events):
    """The r4 VERDICT scale finding: the windowed-plan exchange must not
    hand node-local filesystem paths across task boundaries. The pack
    manifest carries (blk, row) coordinates into object-store block
    refs — no 'path' key, no string that resolves on one node only —
    and every run is addressable as one row of a plasma block."""
    from workbook_exporter_fe_ray.stages.sweep import with_part
    from workbook_exporter_fe_ray.stages.window import (
        _cents,
        _pack_groups_to_refs,
    )

    US_ = 1_000_000
    window_us = 86_400 * US_

    def _route(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b["event_type"],
                "w": pa.array((ts // window_us) * window_us, pa.int64()),
                "ts": b["ts"],
                "event_id": b["event_id"],
                "cents": _cents(b),
            }
        )
        return with_part(t, ["source", "w"], 16)

    routed = tied_events.map_batches(_route, batch_format="pyarrow")
    manifest, block_refs = _pack_groups_to_refs(
        routed, ["source", "w"], ["ts", "event_id"]
    )
    assert manifest and block_refs
    assert all(isinstance(r, ray.ObjectRef) for r in block_refs)
    total = 0
    for m in manifest:
        assert "path" not in m, "node-local path leaked into the manifest"
        assert not any(
            isinstance(v, str) and v.startswith("/") for v in m.values()
        ), "absolute-path-looking manifest value"
        assert 0 <= m["blk"] < len(block_refs)
        total += m["n"]
    assert total == tied_events.count()
    # a run row is directly addressable in the block (the window-task path)
    blk = ray.get(block_refs[manifest[0]["blk"]])
    assert {"ts_l", "event_id_l", "cents_l"} <= set(blk.column_names)
    row = blk.slice(manifest[0]["row"], 1)
    assert len(row["ts_l"][0].values) == manifest[0]["n"]
