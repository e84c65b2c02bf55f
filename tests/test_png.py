"""PNG codec tests (``functions/png.py``): lossless roundtrips across
color types and all five scanline filters, a hand-built palette stream,
CRC/truncation/interlace gates."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from workbook_exporter_fe_ray.functions.png import (
    PngFormatError,
    _chunk,
    decode_png,
    encode_png,
)


def _rand(shape):
    return np.random.default_rng(hash(shape) % 2**32).integers(
        0, 256, shape, dtype=np.uint8
    )


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (7, 5, 3), (33, 47, 3), (16, 24, 4), (21, 13)]
)
def test_roundtrip_lossless(shape):
    img = _rand(shape)
    dec = decode_png(encode_png(img))
    if len(shape) == 2:
        assert dec.shape == (*shape, 1)
        assert np.array_equal(dec[:, :, 0], img)
    else:
        assert np.array_equal(dec, img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_every_filter_type_reconstructs(ft):
    img = _rand((19, 23, 3))
    assert np.array_equal(decode_png(encode_png(img, row_filters=[ft] * 19)), img)


def test_mixed_filters_and_smaller_output():
    # gradient content: Sub/Up filters should beat None on size
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([xx * 4 % 256, yy * 4 % 256, (xx + yy) * 2 % 256], -1).astype(
        np.uint8
    )
    plain = encode_png(img)
    filtered = encode_png(img, row_filters=[1 if y % 2 else 2 for y in range(64)])
    assert np.array_equal(decode_png(filtered), img)
    assert len(filtered) < len(plain)


def test_handbuilt_palette_stream():
    """Color type 3 with an explicit PLTE, built chunk-by-chunk."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    h, w = idx.shape
    raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(h))
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(buf), pal[idx])


def test_multiple_idat_chunks_concatenate():
    img = _rand((9, 11, 3))
    buf = encode_png(img)
    # split the single IDAT into two
    i = buf.find(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", buf, i)
    payload = buf[i + 8 : i + 8 + ln]
    a, b = payload[: ln // 2], payload[ln // 2 :]
    rebuilt = (
        buf[:i] + _chunk(b"IDAT", a) + _chunk(b"IDAT", b) + buf[i + 12 + ln :]
    )
    assert np.array_equal(decode_png(rebuilt), img)


def test_crc_mismatch_raises():
    buf = bytearray(encode_png(_rand((5, 5, 3))))
    buf[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(buf))


def test_truncated_raises():
    buf = encode_png(_rand((5, 5, 3)))
    with pytest.raises(PngFormatError):
        decode_png(buf[: len(buf) // 2])


def test_interlace_raises_loudly():
    buf = bytearray(encode_png(_rand((5, 5, 3))))
    i = buf.find(b"IHDR")
    buf[i + 4 + 12] = 1  # interlace byte (last of the 13-byte IHDR)
    # re-CRC the IHDR chunk so only the interlace gate fires
    payload = bytes(buf[i + 4 : i + 17])
    struct.pack_into(">I", buf, i + 17, zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(bytes(buf))


def test_not_a_png_raises():
    with pytest.raises(PngFormatError):
        decode_png(b"GIF89a" + bytes(16))
