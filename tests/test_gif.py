"""GIF codec tests (``functions/gif.py``): real LZW roundtrips across
palette sizes and dictionary-stress content, interlace reordering,
extension skipping, and format gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from workbook_exporter_fe_ray.functions.gif import (
    GifFormatError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _palette_image(rng, h, w, n_colors):
    pal = np.unique(
        rng.integers(0, 256, (n_colors * 2, 3), dtype=np.uint8), axis=0
    )[:n_colors]
    return pal[rng.integers(0, len(pal), (h, w))]


@pytest.mark.parametrize("n_colors", [2, 4, 17, 128, 250])
def test_roundtrip_lossless(n_colors):
    rng = np.random.default_rng(n_colors)
    img = _palette_image(rng, 31, 45, n_colors)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_dictionary_growth_and_reset():
    """>4096 dictionary entries forces 12-bit codes and a table reset —
    the width-synchronization edge every LZW pair must agree on."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 200, 300_000).astype(np.uint8)
    assert np.array_equal(_lzw_decode(8, _lzw_encode(8, idx), len(idx)), idx)
    # deep repetition: long dictionary chains
    rep = np.tile(np.arange(16, dtype=np.uint8).repeat(7), 400)
    assert np.array_equal(_lzw_decode(4, _lzw_encode(4, rep), len(rep)), rep)


def test_interlaced_rows_reorder():
    """Hand-build an interlaced GIF: rows stored in the four-pass order
    must come back in display order."""
    rng = np.random.default_rng(1)
    img = _palette_image(rng, 13, 8, 16)
    plain = encode_gif(img)
    # recover the palette index array the encoder used
    colors, inverse = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    idx = inverse.astype(np.uint8).reshape(13, 8)
    order = np.concatenate(
        [np.arange(s, 13, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    stored = idx[order]  # rows in interlace transmission order
    # image descriptor offset: header(6) + LSD(7) + global color table
    # (0x2C also occurs inside palette bytes, so don't search for it)
    ct_bits = (plain[10] & 0x07) + 1
    i = 13 + (1 << ct_bits) * 3
    assert plain[i] == 0x2C
    left, top, w, h, iflags = struct.unpack_from("<HHHHB", plain, i + 1)
    min_code = plain[i + 10]
    lzw = _lzw_encode(min_code, stored.reshape(-1))
    blocks = b"".join(
        bytes([len(lzw[j : j + 255])]) + lzw[j : j + 255]
        for j in range(0, len(lzw), 255)
    )
    buf = (
        plain[:i]
        + b"\x2c"
        + struct.pack("<HHHHB", left, top, w, h, iflags | 0x40)
        + bytes([min_code])
        + blocks
        + b"\x00\x3b"
    )
    assert np.array_equal(decode_gif(buf), img)


def test_extension_blocks_skipped():
    rng = np.random.default_rng(2)
    img = _palette_image(rng, 9, 9, 8)
    buf = encode_gif(img)
    # inject a graphic-control extension right before the image descriptor
    i = 13 + (1 << ((buf[10] & 0x07) + 1)) * 3
    assert buf[i] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert np.array_equal(decode_gif(buf[:i] + gce + buf[i:]), img)


def test_too_many_colors_raises():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(img)


def test_not_a_gif_raises():
    with pytest.raises(GifFormatError):
        decode_gif(b"\x00\x00\x00\x18ftypisom" + bytes(32))


def test_truncated_lzw_raises():
    rng = np.random.default_rng(4)
    img = _palette_image(rng, 16, 16, 32)
    buf = bytearray(encode_gif(img))
    # chop the data sub-blocks: keep header + descriptor, drop half the stream
    with pytest.raises((GifFormatError, IndexError)):
        decode_gif(bytes(buf[: len(buf) // 2]))
