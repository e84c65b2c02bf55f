"""Multimodal plumbing: decode / feature-extract / resize / frame-sample
actor-pool stages over opaque binary payload columns. Codec libraries
are absent in this container, so the kernels are deterministic fakes —
these tests pin the REAL parts: schema contract, batch sizing, actor
signatures, fan-out arithmetic, determinism, and the honest
NotImplementedError gates."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from workbook_exporter_fe_ray.stages.multimodal import (
    DecodeStub,
    ResizeStub,
    decode_pipeline,
    frame_sample_pipeline,
    synth_media_table,
)


def test_decode_pipeline_schema_and_determinism(ray_session):
    ds = ray.data.from_arrow(synth_media_table(48))
    a = decode_pipeline(ds, fake=True).to_pandas().sort_values("media_id")
    b = decode_pipeline(ds, fake=True).to_pandas().sort_values("media_id")
    assert len(a) == 48
    assert "payload" not in a.columns  # raw bytes dropped post-decode
    for col in ("payload_bytes", "decode_checksum", "features"):
        assert col in a.columns
    assert (a["decode_checksum"].to_numpy() == b["decode_checksum"].to_numpy()).all()
    assert all(len(f) == 8 for f in a["features"])


def test_decode_gate_raises_without_codecs(ray_session):
    import pyarrow as pa

    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)(synth_media_table(2))
    with pytest.raises(NotImplementedError):
        ResizeStub(fake=False)


def test_frame_sample_fanout(ray_session):
    tbl = synth_media_table(30)
    ds = ray.data.from_arrow(tbl)
    out = frame_sample_pipeline(ds, fps=2.0).to_pandas()
    dur = dict(zip(tbl["media_id"].to_pylist(), tbl["duration_ms"].to_pylist()))
    typ = dict(zip(tbl["media_id"].to_pylist(), tbl["media_type"].to_pylist()))
    for mid, grp in out.groupby("media_id"):
        if typ[mid] == "video":
            expect = max(int(dur[mid] * 2.0 / 1000.0), 1)
        else:
            expect = 1
        assert len(grp) == expect, (mid, typ[mid])
        idx = np.sort(grp["frame_idx"].to_numpy())
        assert (idx == np.arange(expect)).all()
        if typ[mid] == "video" and expect > 1:
            ts = np.sort(grp["frame_ts_ms"].to_numpy())
            assert ts[1] - ts[0] == 500  # 2 fps → 500 ms stride
    # resize contract: fixed target dims, payload scaled by pixel ratio
    assert (out["out_width"] == 32).all() and (out["out_height"] == 32).all()
    assert (out["resized_bytes"] >= 1).all()
