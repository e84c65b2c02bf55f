"""Gorilla codecs: delta-of-delta timestamps + XOR float compression.

Pure-NumPy implementations of the two codecs from the Gorilla paper
(Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015, §4.1) adapted to microsecond int64 timestamps:

Timestamp stream (``encode_dod``): the chunk's first timestamp is kept
out-of-band (``first_ts`` column); the stream holds the first delta as
a raw 64-bit two's-complement word, then one variable-length code per
delta-of-delta:

    ``0``                     dod == 0
    ``10``  + 7  bits         dod ∈ [-63, 64]       (stored as dod+63)
    ``110`` + 9  bits         dod ∈ [-255, 256]     (stored as dod+255)
    ``1110``+ 12 bits         dod ∈ [-2047, 2048]   (stored as dod+2047)
    ``1111``+ 64 bits         raw two's complement  (µs deltas can be huge)

Value stream (``encode_xor``): first value out-of-band (``first_val``);
per subsequent value, XOR with the previous value's IEEE-754 bits:

    ``0``                               xor == 0
    ``10``  + meaningful bits           fits the previous window
    ``11``  + 5b lz + 6b (len-1) + bits new window (lz capped at 31)

Encoding is vectorized where the format allows (all dod class masks,
leading/trailing-zero counts, and the final bit-packing are NumPy);
only the XOR window-reuse scan is sequential, as it must be. Decoding
is a straightforward pointer walk (used for verification/invariant
checks, not the hot path).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

# ---------------------------------------------------------------------------
# bit helpers
# ---------------------------------------------------------------------------


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x==0 → 64)."""
    n = np.full(x.shape, 64, dtype=np.int64)
    cur = x.copy()
    shift_amounts = (32, 16, 8, 4, 2, 1)
    bits = np.zeros(x.shape, dtype=np.int64)
    for s in shift_amounts:
        has_high = cur >> _U64(s) != 0
        bits = np.where(has_high, bits + s, bits)
        cur = np.where(has_high, cur >> _U64(s), cur)
    nz = x != 0
    n[nz] = 63 - bits[nz]
    return n


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x==0 → 64)."""
    with np.errstate(over="ignore"):
        lsb = x & (~x + _U64(1))
    return np.where(x == 0, 64, 63 - _clz64(lsb))


def pack_bits(values: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack (value, width) pairs MSB-first into bytes.

    Vectorized by distinct width: for each width w, all fields of that
    width are written with one broadcasted shift/mask.
    """
    values = values.astype(np.uint64)
    widths = widths.astype(np.int64)
    offsets = np.zeros(len(widths) + 1, dtype=np.int64)
    np.cumsum(widths, out=offsets[1:])
    total = int(offsets[-1])
    bits = np.zeros((total + 7) // 8 * 8, dtype=np.uint8)
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.flatnonzero(widths == w)
        pos = offsets[idx][:, None] + np.arange(w)
        shift = (w - 1 - np.arange(w)).astype(np.uint64)
        bits_w = (values[idx][:, None] >> shift) & _U64(1)
        bits[pos.ravel()] = bits_w.ravel().astype(np.uint8)
    return np.packbits(bits[:total]).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, w: int) -> int:
        v = 0
        b = self.bits
        p = self.pos
        for i in range(w):
            v = (v << 1) | int(b[p + i])
        self.pos = p + w
        return v


def _to_signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


# ---------------------------------------------------------------------------
# delta-of-delta timestamps
# ---------------------------------------------------------------------------

_DOD_BOUNDS = (
    (64, 7, 63, (0b10, 2)),
    (256, 9, 255, (0b110, 3)),
    (2048, 12, 2047, (0b1110, 4)),
)


def encode_dod(ts: np.ndarray) -> bytes:
    """int64 µs timestamps (sorted, ≥2 points) → DoD bit stream.

    ``ts[0]`` is NOT encoded — store it out-of-band. Returns b"" for
    fewer than 2 points.
    """
    ts = np.asarray(ts, dtype=np.int64)
    if len(ts) < 2:
        return b""
    deltas = np.diff(ts)
    vals: list[np.ndarray] = [np.array([deltas[0]], dtype=np.int64).view(np.uint64)]
    widths: list[np.ndarray] = [np.array([64])]
    if len(deltas) >= 2:
        dod = deltas[1:] - deltas[:-1]
        n = len(dod)
        v = np.zeros((n, 2), dtype=np.uint64)  # (prefix, payload)
        w = np.zeros((n, 2), dtype=np.int64)
        done = dod == 0
        # prefix '0', no payload
        v[done, 0] = 0
        w[done, 0] = 1
        for bound, pw, bias, (prefix, plen) in _DOD_BOUNDS:
            m = (~done) & (dod > -bound) & (dod <= bound)
            v[m, 0] = prefix
            w[m, 0] = plen
            v[m, 1] = (dod[m] + bias).astype(np.uint64)
            w[m, 1] = pw
            done |= m
        rest = ~done
        v[rest, 0] = 0b1111
        w[rest, 0] = 4
        v[rest, 1] = dod[rest].view(np.uint64)  # two's complement
        w[rest, 1] = 64
        vals.append(v.ravel())
        widths.append(w.ravel())
    return pack_bits(np.concatenate(vals), np.concatenate(widths))


def decode_dod(data: bytes, n: int, first_ts: int) -> np.ndarray:
    """Inverse of :func:`encode_dod` (needs n and the out-of-band first ts)."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = first_ts
    if n == 1:
        return out
    r = _BitReader(data)
    delta = _to_signed(r.read(64), 64)
    out[1] = first_ts + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _to_signed(r.read(64), 64)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# XOR float values
# ---------------------------------------------------------------------------


def encode_xor(vals: np.ndarray) -> bytes:
    """float64 values (≥1 point) → Gorilla XOR bit stream.

    ``vals[0]`` is NOT encoded — store it out-of-band. Returns b"" for
    fewer than 2 points. NaNs round-trip bit-exactly (pure bit ops).

    Encoder policy (fully vectorized, format-compatible with the paper's
    decoder): a non-zero XOR opens a new window ('11' + 5b lz + 6b
    (len-1) + bits) whenever its (lz, tz) differs from the previous
    non-zero XOR's, and reuses the window ('10' + bits) while (lz, tz)
    is exactly unchanged — the reuse condition lz≥plz ∧ tz≥ptz holds
    with equality. Greedy Gorilla would also reuse on strictly-narrower
    values; this trades ≤ a few % of ratio for an encode that is all
    NumPy run detection instead of a per-value Python scan.
    """
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    if len(vals) < 2:
        return b""
    bits64 = vals.view(np.uint64)
    xors = bits64[1:] ^ bits64[:-1]
    nz_idx = np.flatnonzero(xors)

    n = len(xors)
    # zero-XOR elements: single '0' bit
    if len(nz_idx) == 0:
        return pack_bits(np.zeros(n, np.uint64), np.ones(n, np.int64))

    x = xors[nz_idx]
    lz = np.minimum(_clz64(x), 31).astype(np.int64)  # 5-bit field
    tz = _ctz64(x).astype(np.int64)
    new_w = np.ones(len(x), dtype=bool)
    new_w[1:] = (lz[1:] != lz[:-1]) | (tz[1:] != tz[:-1])
    mlen = 64 - lz - tz

    # per-element field layout: up to 4 (value,width) fields, width 0 = absent
    v = np.zeros((n, 4), dtype=np.uint64)
    w = np.zeros((n, 4), dtype=np.int64)
    w[:, 0] = 1  # default: the '0' control bit for zero XORs (value 0)
    # non-zero elements
    v[nz_idx, 0] = np.where(new_w, 0b11, 0b10)
    w[nz_idx, 0] = 2
    v[nz_idx, 1] = lz.astype(np.uint64)
    w[nz_idx, 1] = np.where(new_w, 5, 0)
    v[nz_idx, 2] = (mlen - 1).astype(np.uint64)
    w[nz_idx, 2] = np.where(new_w, 6, 0)
    v[nz_idx, 3] = x >> tz.astype(np.uint64)
    w[nz_idx, 3] = mlen
    keep = w.ravel() > 0
    return pack_bits(v.ravel()[keep], w.ravel()[keep])


def decode_xor(data: bytes, n: int, first_val: float) -> np.ndarray:
    """Inverse of :func:`encode_xor`."""
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    out_bits = np.empty(n, dtype=np.uint64)
    out_bits[0] = np.float64(first_val).view(np.uint64)
    r = _BitReader(data)
    plz, ptz = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out_bits[i] = out_bits[i - 1]
            continue
        if r.read(1) == 0:
            meaningful = r.read(64 - plz - ptz)
            x = meaningful << ptz
        else:
            plz = r.read(5)
            mlen = r.read(6) + 1
            ptz = 64 - plz - mlen
            x = r.read(mlen) << ptz
        out_bits[i] = out_bits[i - 1] ^ _U64(x)
    return out_bits.view(np.float64)
