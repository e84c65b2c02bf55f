"""Baseline JPEG codec tests (``functions/jpeg.py``).

The decoder reads every table (DQT/DHT/SOF/SOS/DRI) from the stream, so
the roundtrip tests exercise full spec semantics; the hand-crafted
DC-only stream test validates decode against a hand-computed expectation
that does NOT depend on the encoder's bit emission.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from workbook_exporter_fe_ray.functions.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    UNZIGZAG,
    ZIGZAG,
    JpegFormatError,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 13.0)).astype(np.uint8)
    g = (128 + 40 * np.sin((xx + yy) / 23.0)).astype(np.uint8)
    b = (90 + 70 * np.cos(xx / 29.0)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_zigzag_tables_are_inverse_permutations():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))
    # spec's first diagonal entries (T.81 figure A.6)
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_smooth_content_tight(sub):
    img = _smooth(64, 80)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # 4:2:0 averages chroma 2x2, so its bound is looser
    assert err.max() <= (3 if sub == "444" else 14)


def test_roundtrip_flat_is_exact():
    flat = np.full((24, 40, 3), 123, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90, "444")), flat)


def test_roundtrip_odd_dims_and_grey():
    img = _smooth(45, 51)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, 90, sub))
        assert dec.shape == (45, 51, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16
    grey = _smooth(37, 29)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(grey, 92))
    assert dec.shape == (37, 29, 3)
    # grey replicates to 3 identical channels
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.abs(dec[:, :, 0].astype(int) - grey.astype(int)).max() <= 4


def test_restart_intervals_do_not_change_pixels():
    img = _smooth(48, 64)
    plain = decode_jpeg(encode_jpeg(img, 85, "420"))
    with_rst = decode_jpeg(encode_jpeg(img, 85, "420", restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_encode_deterministic():
    img = _smooth(32, 32)
    assert encode_jpeg(img, 80, "420") == encode_jpeg(img, 80, "420")


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noisy, 95, "444"))
    rmse = float(np.sqrt(((dec.astype(int) - noisy.astype(int)) ** 2).mean()))
    assert rmse < 8.0  # q95 quant steps are tiny even on noise


def _handcrafted_dc_only(dc_code: int, expect: int) -> bytes:
    """Minimal 8x8 grey baseline stream with one DC-only block, built
    byte-by-byte from the spec (independent of encode_jpeg's writer).

    Quant table: all 16s (zigzag order). DC coefficient = ``dc_code`` →
    dequantized dc_code*16; IDCT of a DC-only block is flat
    dc_code*16/8 + 128 = 2*dc_code + 128 = ``expect``."""

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    )
    out += seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    # entropy bits: huffman(DC size) + magnitude bits + huffman(EOB)
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    size = int(abs(dc_code)).bit_length() if dc_code else 0
    magnitude = dc_code if dc_code > 0 else dc_code + (1 << size) - 1
    acc, nbits = 0, 0
    for code, length in (
        dc_codes[size],
        (magnitude, size),
        ac_codes[0x00],
    ):
        acc = (acc << length) | (code & ((1 << length) - 1))
        nbits += length
    pad = (-nbits) % 8
    acc = (acc << pad) | ((1 << pad) - 1)
    nbits += pad
    scan = acc.to_bytes(nbits // 8, "big").replace(b"\xff", b"\xff\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dc,expect", [(10, 148), (0, 128), (-20, 88)])
def test_handcrafted_dc_only_stream_decodes_flat(dc, expect):
    dec = decode_jpeg(_handcrafted_dc_only(dc, expect))
    assert dec.shape == (8, 8, 3)
    assert np.array_equal(dec, np.full((8, 8, 3), expect, np.uint8))


def test_progressive_marker_raises_loudly():
    img = _smooth(16, 16)
    buf = bytearray(encode_jpeg(img, 85, "444"))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(buf))


def test_not_a_jpeg_raises():
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + bytes(32))


def test_sixteen_bit_dqt_entries_parse():
    """Pq=1 (16-bit) quant tables are legal in extended streams; the
    decoder must honor them. Rebuild the handcrafted stream with a
    16-bit table of the same values."""
    buf = _handcrafted_dc_only(10, 148)
    # locate the 8-bit DQT segment and replace with the 16-bit form
    i = buf.find(b"\xff\xdb")
    old = buf[i : i + 4 + 1 + 64]
    payload16 = bytes([0x10]) + b"".join(
        struct.pack(">H", 16) for _ in range(64)
    )
    new = struct.pack(">BBH", 0xFF, 0xDB, len(payload16) + 2) + payload16
    buf2 = buf[:i] + new + buf[i + len(old) :]
    dec = decode_jpeg(buf2)
    assert np.array_equal(dec, np.full((8, 8, 3), 148, np.uint8))
