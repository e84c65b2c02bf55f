"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure NumPy.

Retires the last loud stub gate in ``stages/multimodal.py``: compressed
image containers previously routed through ``decoded_real=False``. The
reference accepts image uploads by extension only and never decodes
(workbook_exporter-fe.py:1928 ``ALLOWED_EXTENSIONS``); decoding here is
a beyond-reference capability for the multimodal pipeline, so the codec
is implemented from the public spec (ITU-T T.81 Annex F baseline
sequential process, JFIF 1.02 container), like the other codecs in
``functions/codecs.py``.

Scope — baseline sequential DCT, 8-bit precision:
  encoder: greyscale (1 component) or YCbCr 4:4:4 / 4:2:0, libjpeg-style
    quality scaling of the Annex K quantization tables, Annex K Huffman
    tables, optional restart intervals.
  decoder: SOF0 frames with 1..4 components, arbitrary sampling factors
    in {1,2}, 8/16-bit DQT entries, DHT tables read from the stream (so
    decode does NOT depend on the encoder's table constants), DRI/RSTn,
    APPn/COM skip. Progressive (SOF2) and the other non-baseline frame
    types raise a loud NotImplementedError.

Performance shape: the entropy-coded segment is a bit-serial stream —
inherently sequential PER PAYLOAD (true of every JPEG decoder; this is
why the actor-pool stage parallelizes across media rows, not within
one). Everything after entropy decode (dequantize, de-zigzag, IDCT,
upsample, colour convert) is vectorized over all blocks of the image at
once; entropy decode itself is a tight loop over a prebuilt per-table
(length, symbol) lookup keyed by a 16-bit peek window.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Raster index of the i-th coefficient in zig-zag order (K.1 fig)."""
    out = []
    for s in range(15):
        lo, hi = max(0, s - 7), min(s, 7)
        rows = range(hi, lo - 1, -1) if s % 2 == 0 else range(lo, hi + 1)
        out.extend(r * 8 + (s - r) for r in rows)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()           # zigzag position -> raster position
UNZIGZAG = np.argsort(ZIGZAG)      # raster position -> zigzag position

# Annex K.1 / K.2 quantization tables (luminance, chrominance).
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3-K.6 Huffman specs: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (float64)."""
    k = np.arange(8)[:, None].astype(np.float64)
    n = np.arange(8)[None, :].astype(np.float64)
    c = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 Annex C canonical assignment."""
    codes, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit peek-window LUT: lut_len[w], lut_sym[w] for every 16-bit
    window w whose prefix is a valid code. Invalid prefixes get len 0."""
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_len[lo:hi] = length
            lut_sym[lo:hi] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return lut_len, lut_sym


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: Q<50 -> 5000/Q, else 200-2Q (percent)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with 8|H, 8|W -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _fdct_quant(blocks: np.ndarray, qtbl_raster: np.ndarray) -> np.ndarray:
    """Level-shift, 2-D DCT, quantize -> int32 coefficients in RASTER
    order, vectorized over all blocks: (..., 8, 8) -> (..., 64)."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,...jk,lk->...il", _DCT, shifted, _DCT)
    q = qtbl_raster.reshape(8, 8).astype(np.float64)
    out = np.round(coef / q).astype(np.int32)
    return out.reshape(*out.shape[:-2], 64)


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, extend-coded bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    coef_raster: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coef_raster[ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    c, l = dc_codes[size]
    w.put(c, l)
    w.put(bits, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        prev = int(idx) + 1
        while run >= 16:
            c, l = ac_codes[0xF0]  # ZRL
            w.put(c, l)
            run -= 16
        size, bits = _magnitude(int(zz[1 + idx]))
        c, l = ac_codes[(run << 4) | size]
        w.put(c, l)
        w.put(bits, size)
    if prev != 63:
        c, l = ac_codes[0x00]  # EOB
        w.put(c, l)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB or (H, W) uint8 grey as baseline JFIF.

    ``subsampling``: '420' (2x2 chroma) or '444'; ignored for grey.
    ``restart_interval``: MCUs per restart segment (0 = no RSTn).
    """
    grey = img.ndim == 2
    if not grey and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {img.shape}")
    if subsampling not in ("420", "444"):
        raise ValueError(f"subsampling must be '420' or '444', got {subsampling!r}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qy = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    if grey:
        comps = [("y", img.astype(np.float64), 1, 1, 0)]
        hmax = vmax = 1
    else:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "420":
            y = ycc[..., 0]
            cbp = _pad_edge(ycc[..., 1], 2)
            crp = _pad_edge(ycc[..., 2], 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            comps = [("y", y, 2, 2, 0), ("cb", cb, 1, 1, 1), ("cr", cr, 1, 1, 1)]
            hmax = vmax = 2
        else:
            comps = [
                ("y", ycc[..., 0], 1, 1, 0),
                ("cb", ycc[..., 1], 1, 1, 1),
                ("cr", ycc[..., 2], 1, 1, 1),
            ]
            hmax = vmax = 1

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # Per component: pad plane to full MCU coverage, DCT+quantize all
    # blocks at once, then walk MCUs emitting entropy codes.
    coef: dict[str, np.ndarray] = {}
    for name, plane, ch, cv, tq in comps:
        target_h, target_w = mcus_y * cv * 8, mcus_x * ch * 8
        p = np.pad(
            plane,
            ((0, target_h - plane.shape[0]), (0, target_w - plane.shape[1])),
            mode="edge",
        )
        coef[name] = _fdct_quant(_plane_to_blocks(p), qy if tq == 0 else qc)

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    pred = {name: 0 for name, *_ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {name: 0 for name, *_ in comps}
            for name, _plane, ch, cv, tq in comps:
                dc_t, ac_t = (dc_y, ac_y) if tq == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        block = coef[name][my * cv + by, mx * ch + bx]
                        pred[name] = _encode_block(writer, block, pred[name], dc_t, ac_t)
            mcu_count += 1
    writer.flush()

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if not grey:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (name, _p, ch, cv, tq) in enumerate(comps, start=1):
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not grey:
        out += _seg(0xC4, dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, (name, _p, _ch, _cv, tq) in enumerate(comps, start=1):
        td_ta = 0x00 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += _seg(0xDA, sos)
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over a destuffed entropy segment (numpy bits)."""

    def __init__(self, data: bytes) -> None:
        arr = np.frombuffer(data, dtype=np.uint8)
        # pad 2 spare bytes so 16-bit peeks near the end stay in-bounds
        self.bits = np.unpackbits(np.concatenate([arr, np.zeros(2, np.uint8)]))
        self.pos = 0
        self.limit = len(arr) * 8

    def peek16(self) -> int:
        b = self.bits[self.pos : self.pos + 16]
        return int(b @ (1 << np.arange(15, -1, -1, dtype=np.int64)))

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        return int(b @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64)))


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class JpegFormatError(ValueError):
    pass


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline JFIF/JPEG bytes -> (H, W, 3) uint8 RGB (grey
    replicated to 3 channels so the multimodal stage sees one image
    shape). All tables are read from the stream; progressive or
    arithmetic-coded files raise a loud NotImplementedError."""
    if buf[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    restart_interval = 0
    scan = None

    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}, got {buf[pos]:#x}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq_, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq_ == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, off).astype(np.int64)
                    off += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, off).astype(np.int64)
                    off += 128
                qtables[tq] = tbl  # kept in zigzag order (matches the coefficient store)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                cnt = sum(bits)
                vals = list(seg[off + 17 : off + 17 + cnt])
                htables[(tc, th)] = _decode_lut(bits, vals)
                off += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(-ext) huff
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"only 8-bit precision supported, got {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}, e.g. "
                "progressive/arithmetic) is not supported by this decoder"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan = {"comps": scomps}
            # entropy-coded data follows until the next non-RST marker
            start = pos
            while pos < n - 1:
                if buf[pos] == 0xFF and buf[pos + 1] not in (0x00,) and not (
                    0xD0 <= buf[pos + 1] <= 0xD7
                ):
                    break
                pos += 1
            scan["data"] = buf[start:pos]
            break  # baseline: single scan
        # else: APPn / COM / DNL — skip
    if frame is None or scan is None:
        raise JpegFormatError("missing SOF0 or SOS")

    fh, fw, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError(f"sampling factors beyond 2x2 unsupported ({hmax}x{vmax})")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    by_id = {c["id"]: c for c in comps}
    order = []  # (comp, td, ta) in scan order
    for sc in scan["comps"]:
        order.append((by_id[sc["cs"]], sc["td"], sc["ta"]))

    # zigzag-order coefficient store per component: (n_blocks, 64) int32
    store = {
        c["id"]: np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int32)
        for c in comps
    }

    # split entropy data on restart markers (encoder byte-aligns each)
    raw = scan["data"]
    intervals: list[bytes] = []
    if restart_interval:
        cur = bytearray()
        i = 0
        while i < len(raw):
            if raw[i] == 0xFF and i + 1 < len(raw) and 0xD0 <= raw[i + 1] <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
            else:
                cur.append(raw[i])
                i += 1
        intervals.append(bytes(cur))
    else:
        intervals = [raw]

    def destuff(b: bytes) -> bytes:
        return b.replace(b"\xff\x00", b"\xff")

    mcu = 0
    for seg_i, segment in enumerate(intervals):
        reader = _BitReader(destuff(segment))
        pred = {c["id"]: 0 for c in comps}
        last_mcu = (
            min(n_mcus, (seg_i + 1) * restart_interval) if restart_interval else n_mcus
        )
        while mcu < last_mcu:
            my, mx = divmod(mcu, mcus_x)
            for comp, td, ta in order:
                dc_len, dc_sym = htables[(0, td)]
                ac_len, ac_sym = htables[(1, ta)]
                ch, cv = comp["h"], comp["v"]
                row_blocks = mcus_x * ch
                for by in range(cv):
                    for bx in range(ch):
                        zz = store[comp["id"]][
                            (my * cv + by) * row_blocks + (mx * ch + bx)
                        ]
                        # DC
                        w16 = reader.peek16()
                        ln = int(dc_len[w16])
                        if ln == 0:
                            raise JpegFormatError("invalid DC Huffman code")
                        reader.skip(ln)
                        size = int(dc_sym[w16])
                        diff = _extend(reader.read(size), size)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        # AC
                        k = 1
                        while k <= 63:
                            w16 = reader.peek16()
                            ln = int(ac_len[w16])
                            if ln == 0:
                                raise JpegFormatError("invalid AC Huffman code")
                            reader.skip(ln)
                            rs = int(ac_sym[w16])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise JpegFormatError("AC run past block end")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
            mcu += 1

    # vectorized dequantize + de-zigzag + IDCT + reassemble per component
    planes = {}
    for c in comps:
        q = qtables[c["tq"]]  # zigzag order
        zz = store[c["id"]].astype(np.float64) * q[None, :].astype(np.float64)
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        blocks = raster.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        rows, cols = mcus_y * c["v"], mcus_x * c["h"]
        plane = (
            pix.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        comp_h = -(-fh * c["v"] // vmax)
        comp_w = -(-fw * c["h"] // hmax)
        plane = plane[:comp_h, :comp_w]
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes[c["id"]] = plane[:fh, :fw]

    if len(comps) == 1:
        grey = np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return np.repeat(grey[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    ycc = np.stack([planes[c["id"]] for c in comps], axis=-1)
    return _ycbcr_to_rgb(ycc)
