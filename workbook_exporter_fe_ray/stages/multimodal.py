"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar
metadata columns; decode / resize / frame-sample run as actor-pool
``map_batches`` stages sized for large payloads (SMALL batch_size so
batch × concurrency fits worker heaps).

The image/audio codec libraries are NOT in this container, so the
decode kernel is stubbed: ``DecodeStub`` raises NotImplementedError
unless ``fake=True``, in which case it produces a deterministic fake
decode (shape + checksum derived from the bytes). The Ray-side plumbing
— schema, actor signature, batch sizing, output layout — is real and
tested; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests (payload bytes
    are seeded pseudo-random; metadata consistent)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    types = [("image", "audio", "video")[i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array([64 + (i % 4) * 32 for i in range(n)], pa.int32()),
            "height": pa.array([64 + (i % 3) * 32 for i in range(n)], pa.int32()),
            "duration_ms": pa.array([0 if t == "image" else 1000 + i for i, t in enumerate(types)], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStub:
    """Actor-pool decode stage (the real decoder would load its codec in
    __init__ once per actor)."""

    def __init__(self, fake: bool = False):
        self.fake = fake
        # real impl: self.codec = PIL/libav handle, loaded once per actor
        self.codec = "fake-codec" if fake else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "construct DecodeStub(fake=True) for the deterministic stub"
            )
        checksums, n_bytes = [], []
        for buf in batch["payload"].to_pylist():
            checksums.append(zlib.crc32(buf))
            n_bytes.append(len(buf))
        out = batch.drop_columns(["payload"])  # decoded stages drop raw bytes
        out = out.append_column("payload_bytes", pa.array(n_bytes, pa.int64()))
        return out.append_column("decode_checksum", pa.array(checksums, pa.int64()))


class FeatureExtractStub:
    """Deterministic fake feature vector per media item (8-dim, derived
    from payload digest) — stands in for a model-inference actor stage."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf in batch["payload"].to_pylist():
            d = hashlib.blake2b(buf, digest_size=self.dim).digest()
            feats.append((np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0))
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class ResizeStub:
    """Resize stage (images): emits target dimensions plus a
    deterministic fake resized-payload size (scaled by pixel ratio).
    A real implementation swaps the body for PIL's ``resize`` — the
    actor signature, batch sizing and schema contract stay as-is."""

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "construct ResizeStub(fake=True) for the deterministic stub"
            )
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.array(
            [len(b) for b in batch["payload"].to_pylist()], dtype=np.int64
        )
        # fake: payload scales with the pixel ratio (floor, ≥ 1 byte)
        out_bytes = np.maximum(sizes * (self.tw * self.th) // (w * h), 1)
        out = batch.append_column("out_width", pa.array(np.full(len(batch), self.tw, np.int32)))
        out = out.append_column("out_height", pa.array(np.full(len(batch), self.th, np.int32)))
        return out.append_column("resized_bytes", pa.array(out_bytes, pa.int64()))


class FrameSampleStub:
    """Frame-sampling stage (videos): one row per sampled frame at
    ``fps`` frames/second of ``duration_ms`` — the row fan-out shape of
    real video pipelines (payload dropped post-sample; a real impl
    would emit decoded frame tensors instead of (frame_idx, frame_ts)).
    Non-video rows pass through with a single frame_idx 0 row."""

    def __init__(self, fps: float = 2.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_video = pa.compute.equal(batch["media_type"], "video").to_numpy(
            zero_copy_only=False
        )
        n_frames = np.where(
            is_video, np.maximum((dur * self.fps / 1000.0).astype(np.int64), 1), 1
        )
        rep = np.repeat(np.arange(len(batch)), n_frames)
        offs = np.r_[0, np.cumsum(n_frames)[:-1]]
        frame_idx = np.arange(int(n_frames.sum())) - np.repeat(offs, n_frames)
        step_ms = np.repeat(np.where(is_video, 1000.0 / self.fps, 0.0), n_frames)
        out = batch.drop_columns(["payload"]).take(pa.array(rep))
        out = out.append_column("frame_idx", pa.array(frame_idx, pa.int32()))
        return out.append_column(
            "frame_ts_ms",
            pa.array((frame_idx * step_ms).astype(np.int64), pa.int64()),
        )


def decode_pipeline(
    ds: ray.data.Dataset,
    fake: bool = True,
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Decode + feature-extract with payload-friendly batch sizing."""
    decoded = ds.map_batches(
        FeatureExtractStub,
        batch_format="pyarrow",
        batch_size=batch_size,  # large binary payloads → small batches
        concurrency=concurrency,
    )
    return decoded.map_batches(
        DecodeStub,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_pipeline(
    ds: ray.data.Dataset,
    fps: float = 2.0,
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Resize (images) + frame-sample (videos) over the media table."""
    resized = ds.map_batches(
        ResizeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return resized.map_batches(
        FrameSampleStub,
        fn_constructor_args=(fps,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
