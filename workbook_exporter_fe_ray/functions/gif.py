"""GIF codec (GIF87a/89a) in pure Python/NumPy — real LZW.

The third r5 codec (after ``jpeg.py`` and ``png.py``): GIF's only
compression is LZW with variable code widths (3-12 bits), which is
fully implementable from the public spec. With this, every common
legacy IMAGE container decodes for real in the multimodal stage; only
true video codecs (MP4/H.264 etc.) remain honestly gated.

Scope:
  encoder: single-frame, global color table built from the image's
    unique colors (≤256 required — synthetic fixtures use palettized
    content), real dictionary-growing LZW compression.
  decoder: global/local color tables, interlaced row order (the
    four-pass Adam-style reorder), extension-block skipping, full LZW
    with clear/end codes and 12-bit dictionary cap; first frame of an
    animation is returned (frames after the first are ignored —
    decode-one-frame matches the image contract).

Performance: LZW is inherently byte-serial per payload (like JPEG's
entropy decode); the actor pool parallelizes across media rows, and
palette→RGB expansion is one NumPy gather.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream into ``expected`` palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # bit reader (LSB-first per GIF spec)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    # dictionary: list of byte sequences; base entries are single indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifFormatError("LZW stream truncated before end code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifFormatError("first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifFormatError(f"LZW code {code} beyond table {len(table)}")
        if n_out + len(entry) > expected:
            raise GifFormatError("LZW output exceeds image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out != expected:
        raise GifFormatError(f"LZW produced {n_out} of {expected} pixels")
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real dictionary-growing GIF LZW encoder (matches the decoder)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear)
    w = b""
    for b in indices.tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        put(table[w])
        table[wk] = next_code
        next_code += 1
        # width grows AFTER emitting; decoder grows its width when the
        # table reaches 2^width, which happens at the same point
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):  # table full: reset
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        put(table[w])
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB with ≤256 unique colors as GIF89a."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected (H,W,3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} unique colors > 256; quantize first")
    # color table size must be a power of two ≥ 2
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct_size = 1 << ct_bits
    palette = np.zeros((ct_size, 3), np.uint8)
    palette[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, ct_bits
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    out += palette.tobytes()
    # image descriptor (no local table, not interlaced)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, ct_bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, inverse.astype(np.uint8))
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(buf: bytes) -> np.ndarray:
    """Decode the first frame of a GIF → (H, W, 3) uint8 RGB."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    while pos < len(buf):
        b = buf[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b:02x} at {pos - 1}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        ct = global_ct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise GifFormatError("image without any color table")
        min_code = buf[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise GifFormatError(f"bad LZW min code size {min_code}")
        parts = []
        while buf[pos] != 0:
            ln = buf[pos]
            parts.append(buf[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(parts), w * h)
        if int(idx.max(initial=0)) >= len(ct):
            raise GifFormatError("palette index out of range")
        frame = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in four passes
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            de = np.empty_like(frame)
            de[order] = frame
            frame = de
        # first frame only; place on the logical screen if offset
        if (left, top, w, h) != (0, 0, sw, sh):
            canvas = np.zeros((sh, sw), dtype=np.uint8)
            canvas[top : top + h, left : left + w] = frame
            frame = canvas
        return ct[frame]
    raise GifFormatError("no image descriptor found")
