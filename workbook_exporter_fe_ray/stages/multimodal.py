"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar
metadata columns; decode / feature-extract / resize / frame-sample run
as actor-pool ``map_batches`` stages sized for large payloads (SMALL
batch_size so batch × concurrency fits worker heaps).

The decode/resize kernels are REAL for uncompressed containers —
BMP (24-bit BI_RGB), PPM (P6), WAV (PCM16) and YUV4MPEG2 4:2:0 video
(``.y4m``: plain-text header + raw planar frames) are parsed and
re-encoded with pure NumPy (``functions/codecs.py``); baseline JPEG
(ITU-T T.81 sequential DCT) decodes for real via the pure-NumPy codec
in ``functions/jpeg.py`` (r5); PNG decodes for real via zlib-DEFLATE +
the five scanline filters in ``functions/png.py`` (r5); GIF decodes
for real via the pure-Python LZW in ``functions/gif.py`` (r5);
bilinear image resize, linear audio resample and per-frame video
resize are vectorized NumPy. Containers needing a true video codec
(MP4/H.264/…) remain honestly gated:
``on_unsupported='stub'`` emits a flagged deterministic fallback
(crc32 of the raw bytes), ``'raise'`` raises NotImplementedError. The
synthetic corpus below generates VALID BMP/PPM/WAV/Y4M payloads so
every media type exercises real byte→tensor work; the stub path is
reached only by genuinely undecodable containers (e.g. an injected
MP4 row — see tests).

Reference parity: the reference app (workbook_exporter-fe.py) has no
media path; these stages implement the brief-mandated multimodal
operators.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.functions.codecs import (
    bilinear_resize,
    decode_bmp,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
    linear_resample,
    rgb_to_yuv420,
    sniff_media_format,
    yuv420_to_rgb,
)

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

_AUDIO_RATE = 16000


def _synth_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic test image: per-channel gradients + seeded noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int64)
    noise = rng.integers(-24, 25, size=img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus with VALID payloads: images alternate
    BMP / PPM (pixel content seeded), audio rows are PCM16 WAV whose
    sample count matches ``duration_ms``, video rows are real YUV4MPEG2
    4:2:0 streams whose frame count matches ``duration_ms`` at the
    source rate (_VIDEO_FPS)."""
    rng = np.random.default_rng(seed)
    payloads, types, widths, heights, durs = [], [], [], [], []
    for i in range(n):
        t = ("image", "audio", "video")[i % 3]
        w, h = 64 + (i % 4) * 32, 64 + (i % 5) * 16
        dur = 0
        if t == "image":
            img = _synth_image(rng, w, h)
            payloads.append(encode_bmp(img) if i % 2 == 0 else encode_ppm(img))
        elif t == "audio":
            dur = 250 + (i % 7) * 125
            n_samp = _AUDIO_RATE * dur // 1000
            tone = np.sin(np.arange(n_samp) * (2 * np.pi * (220 + i) / _AUDIO_RATE))
            wave = np.clip(
                tone * 12000 + rng.integers(-500, 501, n_samp), -32768, 32767
            ).astype(np.int16)
            payloads.append(encode_wav(wave, _AUDIO_RATE))
            w = h = 0
        else:
            dur = 1000 + i
            # even dims for 4:2:0; frames = moving gradient + seeded noise
            w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
            fn, fd = _VIDEO_FPS
            n_frames = max(dur * fn // (1000 * fd), 1)
            base = _synth_image(rng, w, h).astype(np.int64)
            shift = (np.arange(n_frames) * 7)[:, None, None, None]
            frames = ((base[None] + shift) % 256).astype(np.uint8)
            payloads.append(encode_y4m(*rgb_to_yuv420(frames), fps=(fn, fd)))
        types.append(t)
        widths.append(w)
        heights.append(h)
        durs.append(dur)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


_VIDEO_FPS = (10, 1)  # synthetic corpus source rate


def _decode_payload(buf: bytes):
    """Decode one payload by sniffed magic → (tensor, kind) or (None, 'unknown').

    Tensor shapes: image → (H, W, 3) uint8 RGB; wav → (N, C) int16;
    y4m video → (N_frames, H, W, 3) uint8 RGB (full-range integer
    BT.601 view of the decoded planes)."""
    kind = sniff_media_format(buf)
    if kind == "bmp":
        return decode_bmp(buf), kind
    if kind == "ppm":
        return decode_ppm(buf), kind
    if kind == "wav":
        samples, rate = decode_wav(buf)
        return samples, kind
    if kind == "y4m":
        y, u, v, _fn, _fd = decode_y4m(buf)
        return yuv420_to_rgb(y, u, v), kind
    if kind == "jpeg":
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(buf), kind
    if kind == "png":
        from ..functions.png import decode_png

        t = decode_png(buf)
        # normalize to the image contract (H, W, 3): replicate grey,
        # drop alpha (payload metadata carries no matte to composite on)
        if t.shape[2] == 1:
            t = np.repeat(t, 3, axis=2)
        elif t.shape[2] == 2:  # grey+alpha
            t = np.repeat(t[:, :, :1], 3, axis=2)
        elif t.shape[2] == 4:
            t = t[:, :, :3]
        return np.ascontiguousarray(t), kind
    if kind == "gif":
        from ..functions.gif import decode_gif

        return decode_gif(buf), kind
    return None, kind


class Decode:
    """Actor-pool decode stage: real BMP/PPM/WAV/Y4M/JPEG/PNG/GIF parsing
    (pure NumPy + stdlib zlib for PNG's DEFLATE).

    Emits per-row ``payload_bytes`` (raw), ``decode_checksum`` (crc32 of
    the DECODED tensor bytes — proof the bytes were actually parsed),
    ``dec_width`` / ``dec_height`` (image dims or (samples, channels)
    for audio) and ``decoded_real``. Unsupported containers follow
    ``on_unsupported``: 'stub' → crc32 of raw bytes, flagged false;
    'raise' → NotImplementedError. Raw payload is dropped post-decode.
    """

    def __init__(self, on_unsupported: str = "stub"):
        if on_unsupported not in ("stub", "raise"):
            raise ValueError(f"on_unsupported must be 'stub' or 'raise', got {on_unsupported!r}")
        self.on_unsupported = on_unsupported

    def __call__(self, batch: pa.Table) -> pa.Table:
        checksums, n_bytes, dec_w, dec_h, real = [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            n_bytes.append(len(buf))
            tensor, kind = _decode_payload(buf)
            if tensor is None:
                if self.on_unsupported == "raise":
                    raise NotImplementedError(
                        "no codec for compressed/unknown container "
                        f"(magic={buf[:4]!r}); only BMP/PPM/WAV/Y4M/JPEG/PNG/GIF "
                        "decode in this environment — use "
                        "on_unsupported='stub'"
                    )
                checksums.append(zlib.crc32(buf))
                dec_w.append(0)
                dec_h.append(0)
                real.append(False)
            else:
                checksums.append(zlib.crc32(np.ascontiguousarray(tensor).tobytes()))
                if kind == "wav":
                    dec_w.append(tensor.shape[0])  # samples
                    dec_h.append(tensor.shape[1])  # channels
                elif kind == "y4m":  # (N_frames, H, W, 3)
                    dec_h.append(tensor.shape[1])
                    dec_w.append(tensor.shape[2])
                else:
                    dec_h.append(tensor.shape[0])
                    dec_w.append(tensor.shape[1])
                real.append(True)
        out = batch.drop_columns(["payload"])  # decoded stages drop raw bytes
        out = out.append_column("payload_bytes", pa.array(n_bytes, pa.int64()))
        out = out.append_column("decode_checksum", pa.array(checksums, pa.int64()))
        out = out.append_column("dec_width", pa.array(dec_w, pa.int32()))
        out = out.append_column("dec_height", pa.array(dec_h, pa.int32()))
        return out.append_column("decoded_real", pa.array(real, pa.bool_()))


class FeatureExtract:
    """8-dim feature vector per media item from the DECODED content
    (channel means, contrast, shape stats for images; RMS/zero-crossing
    stats for audio) — the model-inference actor-pool shape. Unknown
    containers fall back to a flagged digest-derived vector."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def _image_features(self, img: np.ndarray) -> np.ndarray:
        f = img.astype(np.float64)
        h, w = img.shape[:2]
        return np.array(
            [
                f[..., 0].mean() / 255.0,
                f[..., 1].mean() / 255.0,
                f[..., 2].mean() / 255.0,
                f.std() / 255.0,
                np.abs(np.diff(f.mean(axis=2), axis=1)).mean() / 255.0,  # x-gradient energy
                np.abs(np.diff(f.mean(axis=2), axis=0)).mean() / 255.0,  # y-gradient energy
                min(w, h) / max(w, h),
                np.log1p(w * h) / 20.0,
            ],
            dtype=np.float32,
        )

    def _audio_features(self, samples: np.ndarray) -> np.ndarray:
        x = samples[:, 0].astype(np.float64) / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
        return np.array(
            [
                x.mean(),
                x.std(),
                np.sqrt(np.mean(x * x)),
                np.abs(x).max() if len(x) else 0.0,
                zc,
                np.log1p(len(x)) / 20.0,
                float(samples.shape[1]),
                0.0,
            ],
            dtype=np.float32,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf in batch["payload"].to_pylist():
            tensor, kind = _decode_payload(buf)
            if kind in ("bmp", "ppm"):
                v = self._image_features(tensor)
            elif kind == "y4m":  # first decoded frame's image features
                v = self._image_features(tensor[0])
            elif kind == "wav":
                v = self._audio_features(tensor)
            else:  # flagged digest fallback for codec-gated containers
                d = hashlib.blake2b(buf, digest_size=self.dim).digest()
                v = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0
            if self.dim != 8:
                v = np.resize(v, self.dim)
            feats.append(v.tolist())
        return batch.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class Resize:
    """Resize stage: REAL bilinear resize for images AND video frames
    (decode → resize → re-encode in the source container;
    ``resized_bytes`` is the actual re-encoded length,
    ``resize_checksum`` the crc32 of the resized pixels — every frame
    for video). Audio rows are linear-resampled to ``target_rate``
    (their ``resized_bytes`` is the real resampled WAV length; their
    out_width/out_height stay 0 — resampled, not resized, ADVICE r3).
    JPEG rows decode for real (r5) and re-encode as baseline JPEG at
    quality 85. Codec-gated rows (containers with no decoder here,
    e.g. PNG) pass through with resized_bytes = raw length, flagged
    ``resized_real=false``.
    """

    def __init__(self, target_w: int = 32, target_h: int = 32, target_rate: int = 8000):
        self.tw, self.th, self.rate = target_w, target_h, target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        sizes, checksums, real, ows, ohs = [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            tensor, kind = _decode_payload(buf)
            if kind in ("bmp", "ppm", "jpeg", "png", "gif"):
                resized = bilinear_resize(tensor, self.tw, self.th)
                if kind == "bmp":
                    enc = encode_bmp(resized)
                elif kind == "ppm":
                    enc = encode_ppm(resized)
                elif kind == "png":
                    from ..functions.png import encode_png

                    enc = encode_png(resized)
                elif kind == "gif":
                    from ..functions.gif import encode_gif

                    # bilinear blending exceeds the 256-color budget:
                    # re-quantize to the SOURCE frame's palette (what
                    # real GIF resizers do), nearest-by-L2, then the
                    # checksum below is of the quantized pixels
                    pal = np.unique(tensor.reshape(-1, 3), axis=0)
                    d = (
                        resized.reshape(-1, 1, 3).astype(np.int64)
                        - pal[None, :, :].astype(np.int64)
                    )
                    resized = pal[np.argmin((d * d).sum(axis=2), axis=1)].reshape(
                        resized.shape
                    )
                    enc = encode_gif(resized)
                else:
                    from ..functions.jpeg import encode_jpeg

                    enc = encode_jpeg(resized, quality=85, subsampling="420")
                sizes.append(len(enc))
                checksums.append(zlib.crc32(resized.tobytes()))
                real.append(True)
                ows.append(self.tw)
                ohs.append(self.th)
            elif kind == "y4m":
                # (N, H, W, 3) → resize every frame, re-encode 4:2:0
                rs = np.stack(
                    [bilinear_resize(fr, self.tw, self.th) for fr in tensor]
                )
                enc = encode_y4m(*rgb_to_yuv420(rs), fps=_VIDEO_FPS)
                sizes.append(len(enc))
                checksums.append(zlib.crc32(rs.tobytes()))
                real.append(True)
                ows.append(self.tw)
                ohs.append(self.th)
            elif kind == "wav":
                samples, rate = decode_wav(buf)
                res = linear_resample(samples, rate, self.rate)
                enc = encode_wav(res, self.rate)
                sizes.append(len(enc))
                checksums.append(zlib.crc32(np.ascontiguousarray(res).tobytes()))
                real.append(True)
                ows.append(0)  # audio is resampled, not resized (ADVICE r3)
                ohs.append(0)
            else:
                sizes.append(len(buf))
                checksums.append(zlib.crc32(buf))
                real.append(False)
                ows.append(0)
                ohs.append(0)
        out = batch.append_column("out_width", pa.array(ows, pa.int32()))
        out = out.append_column("out_height", pa.array(ohs, pa.int32()))
        out = out.append_column("resized_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column("resize_checksum", pa.array(checksums, pa.int64()))
        return out.append_column("resized_real", pa.array(real, pa.bool_()))


class FrameSample:
    """Frame-sampling stage (videos): one row per sampled frame at
    ``fps`` frames/second of ``duration_ms``, with REAL pixels — each
    emitted row carries ``frame_checksum`` = crc32 of the decoded RGB
    frame nearest the sample timestamp (Y4M rows). Image rows emit one
    row checksummed over the decoded image; audio / codec-gated rows
    emit one flagged row (``frames_real=false``). Payload dropped
    post-sample."""

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
        frame_ts = (frame_idx * step_ms).astype(np.int64)
        # real pixel work per emitted row (loop is per PAYLOAD, the
        # pixel ops are vectorized NumPy inside the codecs)
        payloads = batch["payload"].to_pylist()
        checksums = np.zeros(len(frame_idx), np.int64)
        real = np.zeros(len(frame_idx), bool)
        for row, buf in enumerate(payloads):
            lo, hi = int(offs[row]), int(offs[row] + n_frames[row])
            tensor, kind = _decode_payload(buf)
            if kind == "y4m":
                fn, fd = _VIDEO_FPS
                src = np.minimum(
                    frame_ts[lo:hi] * fn // (1000 * fd), tensor.shape[0] - 1
                )
                checksums[lo:hi] = [zlib.crc32(tensor[s].tobytes()) for s in src]
                real[lo:hi] = True
            elif kind in ("bmp", "ppm"):
                checksums[lo:hi] = zlib.crc32(tensor.tobytes())
                real[lo:hi] = True
        out = batch.drop_columns(["payload"]).take(pa.array(rep))
        out = out.append_column("frame_idx", pa.array(frame_idx, pa.int32()))
        out = out.append_column("frame_ts_ms", pa.array(frame_ts, pa.int64()))
        out = out.append_column("frame_checksum", pa.array(checksums, pa.int64()))
        return out.append_column("frames_real", pa.array(real, pa.bool_()))


# Back-compat aliases (r1/r2 names; kernels are now real for BMP/PPM/WAV)
DecodeStub = Decode
ResizeStub = Resize
FeatureExtractStub = FeatureExtract
FrameSampleStub = FrameSample


def decode_pipeline(
    ds: ray.data.Dataset,
    on_unsupported: str = "stub",
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Feature-extract + decode with payload-friendly batch sizing.

    Both stages parse the payload independently (actor-pool plumbing
    demo); a production pipeline would fuse them into one actor to
    decode once."""
    decoded = ds.map_batches(
        FeatureExtract,
        batch_format="pyarrow",
        batch_size=batch_size,  # large binary payloads → small batches
        concurrency=concurrency,
    )
    return decoded.map_batches(
        Decode,
        fn_constructor_args=(on_unsupported,),
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
    """Resize (images) / resample (audio) + frame-sample (videos)."""
    resized = ds.map_batches(
        Resize,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return resized.map_batches(
        FrameSample,
        fn_constructor_args=(fps,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class PerceptualHash:
    """Average-hash (aHash) stage over REAL decoded pixels: decode →
    grayscale → bilinear-resize to ``side``×``side`` → 64-bit
    above-mean bitmap. Scale/re-encode-invariant by construction, so
    resized copies of an image collide — the standard cheap perceptual
    near-dup key. Non-image rows emit null."""

    def __init__(self, side: int = 8):
        self.side = side

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes: list[int | None] = []
        for buf in batch["payload"].to_pylist():
            tensor, kind = _decode_payload(buf)
            if kind not in ("bmp", "ppm"):
                hashes.append(None)
                continue
            # integer-exact Rec.601 luma (×1000) keeps the grayscale
            # deterministic across platforms
            f = tensor.astype(np.int64)
            gray = (299 * f[..., 0] + 587 * f[..., 1] + 114 * f[..., 2]) // 1000
            small = bilinear_resize(gray.astype(np.uint8), self.side, self.side)
            bits = (small.astype(np.int64) > int(small.mean())).flatten()
            h = 0
            for b in bits:  # 64 iterations — fixed, not data-sized
                h = (h << 1) | int(b)
            hashes.append(h - (1 << 63))  # store as signed int64
        out = batch.drop_columns(["payload"])
        return out.append_column("phash", pa.array(hashes, pa.int64()))


def phash_dup_pairs(
    ds: ray.data.Dataset,
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Image near-dup pairs by exact perceptual-hash collision: aHash
    every image (actor pool, real decode), then reuse the engine's
    hash-bucket dedup shape — group by phash, emit (id_a < id_b) pairs
    inside each bucket. Resized/re-encoded copies of the same picture
    collide; the exchange carries 16 B (media_id, phash) rows only."""
    hashed = ds.map_batches(
        PerceptualHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def _slim(b: pa.Table) -> pa.Table:
        t = b.select(["media_id", "phash"])
        return t.filter(pa.compute.is_valid(t["phash"]))

    def _pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g["media_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "phash": pa.array([], pa.int64()),
                }
            )
        x, y = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[x], pa.int64()),
                "id_b": pa.array(ids[y], pa.int64()),
                "phash": g["phash"].slice(0, 1).take(pa.array(np.zeros(len(x), np.int64))),
            }
        )

    return (
        hashed.map_batches(_slim, batch_format="pyarrow")
        .groupby("phash")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def synth_media_with_dups(n: int, seed: int = 7) -> pa.Table:
    """Media corpus where every 5th image is a bilinear-resized copy of
    the previous image (re-encoded in the OTHER container) — planted
    perceptual near-dups for the phash pipeline. Unlike
    :func:`synth_media_table`'s shared-gradient images (which aHash
    deliberately cannot tell apart — they share coarse structure), each
    original here gets a DISTINCT random coarse block pattern so only
    the planted copies collide."""
    base = synth_media_table(n, seed=seed)
    rng = np.random.default_rng(seed + 1)
    payloads = base["payload"].to_pylist()
    types = base["media_type"].to_pylist()
    widths = base["width"].to_pylist()
    heights = base["height"].to_pylist()
    prev_img = None
    for i in range(n):
        if types[i] != "image":
            continue
        w, h = widths[i], heights[i]
        if prev_img is not None and i % 5 == 0:
            # downscale 2x and swap container: aHash must still collide
            resized = bilinear_resize(prev_img, prev_img.shape[1] // 2, prev_img.shape[0] // 2)
            payloads[i] = encode_ppm(resized) if i % 2 == 0 else encode_bmp(resized)
            widths[i], heights[i] = resized.shape[1], resized.shape[0]
        else:
            # distinct coarse structure: random 8x8 binary block pattern
            # upscaled, one channel tint per image
            blocks = rng.integers(0, 2, (8, 8)).astype(np.uint8) * 200 + 25
            img = np.repeat(np.repeat(blocks, h // 8 + 1, 0), w // 8 + 1, 1)[:h, :w]
            tint = rng.integers(0, 3)
            rgb = np.stack([img // (2 if c != tint else 1) for c in range(3)], axis=-1)
            prev_img = rgb.astype(np.uint8)
            payloads[i] = encode_bmp(prev_img) if i % 2 == 0 else encode_ppm(prev_img)
    return pa.table(
        {
            "media_id": base["media_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": base["media_type"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": base["duration_ms"],
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_dup_truth(n: int, seed: int = 7) -> pa.Table:
    """Ground-truth planted pairs for :func:`synth_media_with_dups` —
    derived by replaying the SAME planting control flow (never by
    hashing pixels), so the DuckDB oracle can hash-gate the engine's
    decode→aHash→bucket pipeline against the construction itself."""
    base = synth_media_table(n, seed=seed)
    types = base["media_type"].to_pylist()
    ids = base["media_id"].to_pylist()
    # cluster = one original + all its planted copies (a copy does NOT
    # become the new original — prev_img is unchanged in
    # synth_media_with_dups — so consecutive i%5==0 hits with no fresh
    # original in between pile onto the SAME cluster); the engine emits
    # ALL pairs inside a phash bucket, so the truth must too
    clusters: list[list[int]] = []
    prev_id = None
    for i in range(n):
        if types[i] != "image":
            continue
        if prev_id is not None and i % 5 == 0:
            clusters[-1].append(ids[i])
        else:
            prev_id = ids[i]
            clusters.append([prev_id])
    a: list[int] = []
    b: list[int] = []
    for c in clusters:
        c = sorted(c)
        for j in range(len(c)):
            for k in range(j + 1, len(c)):
                a.append(c[j])
                b.append(c[k])
    return pa.table(
        {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
    )


def synth_media_dims_truth(n: int, seed: int = 42) -> pa.Table:
    """Expected decode geometry for :func:`synth_media_table`, derived
    by replaying only the size CONTROL FLOW of the generator (never by
    encoding or decoding payloads), so a DuckDB oracle can hash-gate
    the real Decode stage: matching (dec_width, dec_height) per row
    proves each container's header+payload was actually parsed —
    the decode output takes dims from the decoded tensor's shape, not
    from the metadata columns."""
    ids, types, ws, hs, real = [], [], [], [], []
    for i in range(n):
        t = ("image", "audio", "video")[i % 3]
        if t == "image":
            w, h = 64 + (i % 4) * 32, 64 + (i % 5) * 16
        elif t == "audio":
            dur = 250 + (i % 7) * 125
            w, h = _AUDIO_RATE * dur // 1000, 1  # (samples, channels)
        else:
            w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
        ids.append(i)
        types.append(t)
        ws.append(w)
        hs.append(h)
        real.append(True)  # every synthetic payload is a valid container
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "dec_width": pa.array(ws, pa.int32()),
            "dec_height": pa.array(hs, pa.int32()),
            "decoded_real": pa.array(real, pa.bool_()),
        }
    )


def synth_media_frames_truth(n: int, fps: float = 2.0) -> pa.Table:
    """Expected frame-sampling plan for :func:`synth_media_table` →
    :class:`FrameSample` at ``fps``, replayed from the generator's size
    control flow only (pixel checksums excluded — those are gated by
    the planted-duplicate and roundtrip pytests).  Float expressions
    mirror FrameSample exactly: ``n = trunc(dur * fps / 1000)`` (min 1)
    and ``ts = trunc(idx * (1000 / fps))``."""
    ids, types, idxs, tss, real = [], [], [], [], []
    for i in range(n):
        t = ("image", "audio", "video")[i % 3]
        if t == "video":
            dur = 1000 + i
            nf = max(int(dur * fps / 1000.0), 1)
            step = 1000.0 / fps
        else:
            nf, step = 1, 0.0
        for j in range(nf):
            ids.append(i)
            types.append(t)
            idxs.append(j)
            tss.append(int(j * step))
            real.append(t != "audio")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ts_ms": pa.array(tss, pa.int64()),
            "frames_real": pa.array(real, pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# scene-cut detection (video shot segmentation)
# ---------------------------------------------------------------------------


def _scene_plan(n: int, seed: int) -> list[list[int]]:
    """Per-video scene lengths — PURE integer control flow (blake2b of
    (seed, media_id, key)), so the planted-cut truth can be replayed
    without generating or decoding a single pixel."""

    def h(i: int, k: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(f"{seed}:{i}:{k}".encode(), digest_size=8).digest(),
            "little",
        )

    plans: list[list[int]] = []
    for i in range(n):
        n_scenes = 2 + h(i, "ns") % 3  # 2..4 scenes
        plans.append([3 + h(i, f"len{s}") % 5 for s in range(n_scenes)])
    return plans


def synth_media_scenes(n: int, seed: int = 13) -> pa.Table:
    """Deterministic video corpus with PLANTED scene cuts: each video is
    2–4 scenes of 3–7 frames; within a scene the luma drifts by +3/frame
    (mean |Δ| ≈ 6 with wraparound), across a cut the base is an
    independent uniform plane (mean |Δ| ≈ 85) — separable by an
    integer threshold with huge margin at ≥768 px/frame."""
    plans = _scene_plan(n, seed)
    ids, payloads, ws, hs, nframes = [], [], [], [], []
    for i, lens in enumerate(plans):
        w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
        ys = []
        for s, ln in enumerate(lens):
            rng = np.random.default_rng(seed * 1_000_003 + i * 101 + s)
            base = rng.integers(0, 256, (h, w), dtype=np.uint8)
            for f in range(ln):
                ys.append(((base.astype(np.int64) + 3 * f) % 256).astype(np.uint8))
        y = np.stack(ys)
        u = np.full((len(ys), h // 2, w // 2), 128, np.uint8)
        payloads.append(encode_y4m(y, u, u))
        ids.append(i)
        ws.append(w)
        hs.append(h)
        nframes.append(len(ys))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nframes, pa.int32()),
        }
    )


def synth_media_scenes_truth(n: int, seed: int = 13) -> pa.Table:
    """Planted scene-cut ground truth for :func:`synth_media_scenes`:
    (media_id, frame_idx of each scene's first frame after a cut),
    replayed from the pure-integer scene plan only."""
    ids, idxs = [], []
    for i, lens in enumerate(_scene_plan(n, seed)):
        off = 0
        for ln in lens[:-1]:
            off += ln
            ids.append(i)
            idxs.append(off)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
        }
    )


def scene_cut_detect(
    media: ray.data.Dataset,
    mean_thr: int = 40,
) -> ray.data.Dataset:
    """Shot segmentation over real decoded video: a cut is declared
    between consecutive frames whose summed absolute luma difference
    exceeds ``mean_thr`` per pixel — compared in INTEGERS
    (``diff_sum > mean_thr · w · h``), so the output is hash-exact.

    Per-payload work is a vectorized NumPy pass over the full (N, H, W)
    luma tensor (one abs-diff + one axis-sum per video); the per-row
    loop is container-bound like every decode stage. Non-video rows
    pass through without rows (no cuts).

    Output: (media_id, frame_idx, diff_sum) — frame_idx is the first
    frame AFTER the cut.
    """

    THR = int(mean_thr)

    def _detect(batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        idx_out: list[int] = []
        energy: list[int] = []
        mids = batch["media_id"].to_pylist()
        for mid, buf in zip(mids, batch["payload"].to_pylist()):
            if sniff_media_format(buf) != "y4m":
                continue
            y, _u, _v, _fn, _fd = decode_y4m(buf)
            if len(y) < 2:
                continue
            d = np.abs(y[1:].astype(np.int32) - y[:-1].astype(np.int32)).sum(
                axis=(1, 2), dtype=np.int64
            )
            lim = np.int64(THR) * y.shape[1] * y.shape[2]
            cuts = np.flatnonzero(d > lim)
            ids_out.extend([mid] * len(cuts))
            idx_out.extend((cuts + 1).tolist())
            energy.extend(d[cuts].tolist())
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int64()),
                "diff_sum": pa.array(energy, pa.int64()),
            }
        )

    return media.map_batches(_detect, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# JPEG parity gate (r5): real baseline-JPEG decode, content-checked
# ---------------------------------------------------------------------------


def synth_jpeg_media_table(n: int, seed: int = 21) -> pa.Table:
    """Deterministic JPEG corpus for the decode-parity gate: each row
    carries the baseline-JPEG payload (mix of 4:4:4 / 4:2:0 / greyscale
    / restart-interval variants) AND a lossless BMP reference of the
    SAME source pixels, so the decoded JPEG can be content-checked
    against ground truth without any external codec."""
    from ..functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    ids, payloads, refs, variants = [], [], [], []
    for i in range(n):
        w, h = 48 + (i % 5) * 16, 40 + (i % 4) * 24
        img = _synth_image(rng, w, h)
        if i % 4 == 3:
            variant = "grey"
            grey = img[:, :, 0]
            buf = encode_jpeg(grey, quality=90)
            ref = encode_bmp(np.repeat(grey[:, :, None], 3, axis=2))
        else:
            variant = ("444", "420", "420rst")[i % 4 % 3]
            buf = encode_jpeg(
                img,
                quality=90,
                subsampling="444" if variant == "444" else "420",
                restart_interval=2 if variant == "420rst" else 0,
            )
            ref = encode_bmp(img)
        ids.append(i)
        payloads.append(buf)
        refs.append(ref)
        variants.append(variant)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "ref_payload": pa.array(refs, pa.binary()),
            "variant": pa.array(variants, pa.string()),
        }
    )


class JpegParity:
    """Actor-pool stage: decode each row's baseline JPEG AND its BMP
    reference, emit geometry + the exact max-abs pixel error. A decoder
    that mis-parses any stage (huffman, dequant, IDCT, upsample, color
    convert) blows the error bound; headers alone can't pass."""

    # q90 worst case on the synthetic gradient+noise corpus: 4:2:0
    # chroma box-averaging of the ±24 seeded noise dominates (measured
    # max ~53 across variants); a mis-parse of any codec stage produces
    # near-full-scale errors, so 96 keeps the gate's power
    ERR_TOL = 96

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.jpeg import decode_jpeg

        ws, hs, errs, ok = [], [], [], []
        for buf, ref in zip(
            batch["payload"].to_pylist(), batch["ref_payload"].to_pylist()
        ):
            dec = decode_jpeg(buf)
            want = decode_bmp(ref)
            err = int(
                np.abs(dec.astype(np.int64) - want.astype(np.int64)).max()
            )
            hs.append(dec.shape[0])
            ws.append(dec.shape[1])
            errs.append(err)
            ok.append(err <= self.ERR_TOL)
        out = batch.select(["media_id", "variant"])
        out = out.append_column("dec_width", pa.array(ws, pa.int32()))
        out = out.append_column("dec_height", pa.array(hs, pa.int32()))
        return out.append_column("err_le_tol", pa.array(ok, pa.bool_()))


def jpeg_parity_pipeline(
    ds: ray.data.Dataset, batch_size: int = 16, concurrency: int | tuple[int, int] = (1, 4)
) -> ray.data.Dataset:
    return ds.map_batches(
        JpegParity,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_jpeg_dims_truth(n: int, seed: int = 21) -> pa.Table:
    """Construction replay for :func:`synth_jpeg_media_table` — size
    control flow only; ``err_le_tol`` is True by the codec's contract
    (pytest-pinned bounds in tests/test_jpeg.py)."""
    ids, ws, hs, variants, ok = [], [], [], [], []
    for i in range(n):
        w, h = 48 + (i % 5) * 16, 40 + (i % 4) * 24
        variants.append("grey" if i % 4 == 3 else ("444", "420", "420rst")[i % 4 % 3])
        ids.append(i)
        ws.append(w)
        hs.append(h)
        ok.append(True)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.string()),
            "dec_width": pa.array(ws, pa.int32()),
            "dec_height": pa.array(hs, pa.int32()),
            "err_le_tol": pa.array(ok, pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# PNG parity gate (r5): lossless decode, exact-match-checked
# ---------------------------------------------------------------------------


def synth_png_media_table(n: int, seed: int = 33) -> pa.Table:
    """Deterministic PNG corpus: variants cover plain RGB (filter None),
    mixed scanline filters (Sub/Up/Average/Paeth), greyscale and RGBA;
    each row carries a BMP reference of the same RGB pixels. PNG is
    lossless, so the decode gate is EXACT equality."""
    from ..functions.png import encode_png

    rng = np.random.default_rng(seed)
    ids, payloads, refs, variants = [], [], [], []
    for i in range(n):
        w, h = 24 + (i % 6) * 8, 20 + (i % 5) * 12
        img = _synth_image(rng, w, h)
        variant = ("rgb", "filters", "grey", "rgba")[i % 4]
        if variant == "rgb":
            buf = encode_png(img)
            ref = img
        elif variant == "filters":
            buf = encode_png(img, row_filters=[(y * 3 + i) % 5 for y in range(h)])
            ref = img
        elif variant == "grey":
            g = img[:, :, 0]
            buf = encode_png(g)
            ref = np.repeat(g[:, :, None], 3, axis=2)
        else:  # rgba: alpha is dropped by the decode contract
            a = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
            buf = encode_png(np.concatenate([img, a], axis=2))
            ref = img
        ids.append(i)
        payloads.append(buf)
        refs.append(encode_bmp(np.ascontiguousarray(ref)))
        variants.append(variant)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "ref_payload": pa.array(refs, pa.binary()),
            "variant": pa.array(variants, pa.string()),
        }
    )


class PngParity:
    """Actor-pool stage: decode each row's PNG through the stage's
    normalizing `_decode_payload` path and require EXACT equality with
    the lossless BMP reference (PNG has no quantization — any filter /
    inflate / palette mis-step flips `exact_match`)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, exact = [], [], []
        for buf, ref in zip(
            batch["payload"].to_pylist(), batch["ref_payload"].to_pylist()
        ):
            dec, kind = _decode_payload(buf)
            want = decode_bmp(ref)
            hs.append(dec.shape[0])
            ws.append(dec.shape[1])
            exact.append(kind == "png" and np.array_equal(dec, want))
        out = batch.select(["media_id", "variant"])
        out = out.append_column("dec_width", pa.array(ws, pa.int32()))
        out = out.append_column("dec_height", pa.array(hs, pa.int32()))
        return out.append_column("exact_match", pa.array(exact, pa.bool_()))


def png_parity_pipeline(
    ds: ray.data.Dataset, batch_size: int = 16, concurrency: int | tuple[int, int] = (1, 4)
) -> ray.data.Dataset:
    return ds.map_batches(
        PngParity,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_png_dims_truth(n: int, seed: int = 33) -> pa.Table:
    """Construction replay for :func:`synth_png_media_table` (size
    control flow; exact_match=True is the lossless codec's contract,
    pytest-pinned in tests/test_png.py)."""
    ids, ws, hs, variants, ok = [], [], [], [], []
    for i in range(n):
        w, h = 24 + (i % 6) * 8, 20 + (i % 5) * 12
        ids.append(i)
        ws.append(w)
        hs.append(h)
        variants.append(("rgb", "filters", "grey", "rgba")[i % 4])
        ok.append(True)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.string()),
            "dec_width": pa.array(ws, pa.int32()),
            "dec_height": pa.array(hs, pa.int32()),
            "exact_match": pa.array(ok, pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# GIF parity gate (r5): real LZW decode, exact-match-checked
# ---------------------------------------------------------------------------


def synth_gif_media_table(n: int, seed: int = 44) -> pa.Table:
    """Deterministic GIF corpus: palettized content (GIF's 256-color
    budget) across palette sizes 2..250, with a BMP reference of the
    same pixels. GIF is lossless on palettized content, so the gate is
    EXACT equality."""
    from ..functions.gif import encode_gif

    rng = np.random.default_rng(seed)
    ids, payloads, refs, variants = [], [], [], []
    sizes = (2, 4, 16, 64, 250)
    for i in range(n):
        w, h = 20 + (i % 5) * 10, 16 + (i % 4) * 12
        n_colors = sizes[i % len(sizes)]
        pal = np.unique(
            rng.integers(0, 256, (n_colors * 2, 3), dtype=np.uint8), axis=0
        )[:n_colors]
        img = pal[rng.integers(0, len(pal), (h, w))]
        ids.append(i)
        payloads.append(encode_gif(img))
        refs.append(encode_bmp(np.ascontiguousarray(img)))
        variants.append(f"pal{n_colors}")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "ref_payload": pa.array(refs, pa.binary()),
            "variant": pa.array(variants, pa.string()),
        }
    )


def gif_parity_pipeline(
    ds: ray.data.Dataset, batch_size: int = 16, concurrency: int | tuple[int, int] = (1, 4)
) -> ray.data.Dataset:
    # PngParity's contract is container-agnostic (decode via the stage's
    # `_decode_payload`, exact-match vs the BMP reference) except for
    # the kind check — reuse it with the gif kind
    class _GifParity(PngParity):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ws, hs, exact = [], [], []
            for buf, ref in zip(
                batch["payload"].to_pylist(), batch["ref_payload"].to_pylist()
            ):
                dec, kind = _decode_payload(buf)
                want = decode_bmp(ref)
                hs.append(dec.shape[0])
                ws.append(dec.shape[1])
                exact.append(kind == "gif" and np.array_equal(dec, want))
            out = batch.select(["media_id", "variant"])
            out = out.append_column("dec_width", pa.array(ws, pa.int32()))
            out = out.append_column("dec_height", pa.array(hs, pa.int32()))
            return out.append_column("exact_match", pa.array(exact, pa.bool_()))

    return ds.map_batches(
        _GifParity,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_gif_dims_truth(n: int, seed: int = 44) -> pa.Table:
    """Construction replay for :func:`synth_gif_media_table`."""
    ids, ws, hs, variants, ok = [], [], [], [], []
    sizes = (2, 4, 16, 64, 250)
    for i in range(n):
        w, h = 20 + (i % 5) * 10, 16 + (i % 4) * 12
        ids.append(i)
        ws.append(w)
        hs.append(h)
        variants.append(f"pal{sizes[i % len(sizes)]}")
        ok.append(True)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.string()),
            "dec_width": pa.array(ws, pa.int32()),
            "dec_height": pa.array(hs, pa.int32()),
            "exact_match": pa.array(ok, pa.bool_()),
        }
    )
