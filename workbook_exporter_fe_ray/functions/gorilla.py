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


def _to_signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


class _WordReader:
    """Decode-side bit cursor over the stream as 64-bit big-endian words
    (plain Python ints — each read is a handful of int ops, not a
    per-bit loop). ``ones`` holds the positions of all 1-bits, so runs
    of '0' control codes at a code boundary can be skipped in O(log)
    with one searchsorted instead of bit-by-bit."""

    __slots__ = ("words", "ones", "nbits")

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8
        padded = data + b"\x00" * (pad + 8)  # +1 spare word for 2-word reads
        self.words = np.frombuffer(padded, dtype=">u8").tolist()
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(bits)
        self.nbits = len(data) * 8

    def field(self, b: int, w: int) -> int:
        """Value of bits [b, b+w) — w ≤ 64."""
        i, off = divmod(b, 64)
        v = (self.words[i] << 64) | self.words[i + 1]
        return (v >> (128 - off - w)) & ((1 << w) - 1)

    def zeros_from(self, b: int) -> int:
        """Length of the run of 0-bits starting at position b."""
        j = int(np.searchsorted(self.ones, b))
        return (int(self.ones[j]) if j < len(self.ones) else self.nbits) - b


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


def _decode_dod_vectorized(bits: np.ndarray, m: int) -> np.ndarray:
    """All dods of a DoD stream, fully vectorized.

    The DoD code is SELF-DELIMITING (width is a pure function of its
    first 4 bits), so the code-boundary chain is recovered without a
    sequential walk: per-position widths come from 4 shifted compares,
    and the boundary list doubles each round via binary lifting
    (P ← P ∥ J[P]; J ← J[J] — after k rounds P holds the first 2^k
    boundaries). Payloads then decode class-by-class with one gather +
    matmul per class. O(B log m) vectorized work, no per-code Python."""
    B = len(bits)
    pad = np.zeros(80, dtype=bits.dtype)  # safe gathers up to P+68
    bits_p = np.concatenate([bits, pad])
    b0 = bits_p[:B].astype(np.int64)
    b1 = bits_p[1 : B + 1]
    b2 = bits_p[2 : B + 2]
    b3 = bits_p[3 : B + 3]
    # width = 1 / 9 / 12 / 16 / 68 by prefix class, branch-free
    w = 1 + b0 * (8 + b1 * (3 + b2 * (4 + b3 * 52)))
    nxt = np.minimum(np.arange(B, dtype=np.int64) + w, B - 1)

    P = np.array([64], dtype=np.int64)
    J = nxt
    while len(P) < m:
        P = np.concatenate([P, J[P]])
        J = J[J]
    P = P[:m]

    dods = np.zeros(m, dtype=np.int64)
    nz = bits_p[P] == 1
    cls10 = nz & (bits_p[P + 1] == 0)
    cls110 = nz & ~cls10 & (bits_p[P + 2] == 0)
    cls1110 = nz & ~cls10 & ~cls110 & (bits_p[P + 3] == 0)
    cls1111 = nz & ~cls10 & ~cls110 & ~cls1110
    for sel, off, width, bias in (
        (cls10, 2, 7, 63),
        (cls110, 3, 9, 255),
        (cls1110, 4, 12, 2047),
    ):
        p = P[sel]
        if len(p):
            mat = bits_p[p[:, None] + off + np.arange(width)].astype(np.int64)
            vals = mat @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
            dods[sel] = vals - bias
    p = P[cls1111]
    if len(p):
        mat = bits_p[p[:, None] + 4 + np.arange(64)].astype(np.uint64)
        with np.errstate(over="ignore"):
            powers = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
            vals = (mat * powers).sum(axis=1, dtype=np.uint64)
        dods[cls1111] = vals.view(np.int64)  # two's complement
    return dods


def decode_dod(data: bytes, n: int, first_ts: int) -> np.ndarray:
    """Inverse of :func:`encode_dod` (needs n and the out-of-band first ts).

    Fully vectorized via :func:`_decode_dod_vectorized` for larger
    chunks; a hybrid word-reader path (bulk zero-run skipping + O(1)
    reads per non-zero dod) covers small ones where the vectorized
    setup would dominate. The final double prefix-sum (dod → delta →
    ts) is pure NumPy either way."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = first_ts
    if n == 1:
        return out
    r = _WordReader(data)
    first_delta = _to_signed(r.field(0, 64), 64)
    if n == 2:
        out[1] = first_ts + first_delta
        return out
    m = n - 2
    # vectorized pays off on DENSE code streams (small codes — regular
    # grids); on wide streams (mostly raw-64 payloads) its O(B log m)
    # lifting over 68 bits/code loses to the O(1)-per-code word reader
    if m >= 64 and len(data) * 8 <= m * 20 + 64:
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        dods = _decode_dod_vectorized(bits, m)
        deltas = first_delta + np.cumsum(np.concatenate([[0], dods]))
        out[1:] = first_ts + np.cumsum(deltas)
        return out
    dods = np.zeros(n - 2, dtype=np.int64)
    pos = 64
    i = 0
    # hot loop: everything local, one ≤68-bit window read per code
    words = r.words
    ones_l = r.ones.tolist()
    n_ones = len(ones_l)
    nbits = r.nbits
    from bisect import bisect_left

    idxs: list[int] = []
    vals: list[int] = []
    nwords = len(words)
    while i < m:
        iw = pos >> 6
        off = pos & 63
        wv = words[iw]
        if not (wv >> (63 - off)) & 1:  # zero-run of dod==0 codes
            j = bisect_left(ones_l, pos)
            nxt = ones_l[j] if j < n_ones else nbits
            run = min(nxt - pos, m - i)
            i += run
            pos += run
            continue
        if off <= 47:  # whole ≤16-bit short code fits this word
            c = (wv >> (60 - off)) & 0xF
            if c < 0b1100:  # '10' + 7
                dod = ((wv >> (55 - off)) & 0x7F) - 63
                pos += 9
            elif c < 0b1110:  # '110' + 9
                dod = ((wv >> (52 - off)) & 0x1FF) - 255
                pos += 12
            elif c == 0b1110:  # '1110' + 12
                dod = ((wv >> (48 - off)) & 0xFFF) - 2047
                pos += 16
            else:  # '1111' + raw 64
                v = (wv << 128) | (words[iw + 1] << 64) | (
                    words[iw + 2] if iw + 2 < nwords else 0
                )
                raw = (v >> (124 - off)) & 0xFFFFFFFFFFFFFFFF
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
                pos += 68
        else:  # code straddles words: 192-bit window
            v = (wv << 128) | (words[iw + 1] << 64) | (
                words[iw + 2] if iw + 2 < nwords else 0
            )
            c = (v >> (188 - off)) & 0xF
            if c < 0b1100:
                dod = ((v >> (183 - off)) & 0x7F) - 63
                pos += 9
            elif c < 0b1110:
                dod = ((v >> (180 - off)) & 0x1FF) - 255
                pos += 12
            elif c == 0b1110:
                dod = ((v >> (176 - off)) & 0xFFF) - 2047
                pos += 16
            else:
                raw = (v >> (124 - off)) & 0xFFFFFFFFFFFFFFFF
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
                pos += 68
        idxs.append(i)
        vals.append(dod)
        i += 1
    if idxs:
        dods[np.array(idxs, dtype=np.int64)] = np.array(vals, dtype=np.int64)
    deltas = first_delta + np.cumsum(np.concatenate([[0], dods]))
    out[1:] = first_ts + np.cumsum(deltas)
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
    """Inverse of :func:`encode_xor`.

    Hybrid: runs of '0' controls (value repeats) skip in bulk via the
    1-bit index; each non-zero XOR costs a few O(1) word reads. The
    XOR→value chain is a cumulative-XOR over the collected per-index
    XOR words, vectorized with ``np.bitwise_xor.accumulate``."""
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    xors = np.zeros(n, dtype=np.uint64)
    xors[0] = np.float64(first_val).view(np.uint64)
    if n > 1:
        r = _WordReader(data)
        pos = 0
        i = 1
        ptz, pmlen = -1, -1
        # hot loop: everything local, one 13-bit header read + one
        # payload read per non-zero XOR
        words = r.words
        ones_l = r.ones.tolist()
        n_ones = len(ones_l)
        nbits = r.nbits
        from bisect import bisect_left

        idxs: list[int] = []
        vals: list[int] = []
        mask64 = 0xFFFFFFFFFFFFFFFF
        while i < n:
            iw = pos >> 6
            off = pos & 63
            wv = words[iw]
            if not (wv >> (63 - off)) & 1:  # zero-run: value repeats
                j = bisect_left(ones_l, pos)
                nxt = ones_l[j] if j < n_ones else nbits
                run = min(nxt - pos, n - i)
                i += run
                pos += run
                continue
            if off <= 51:  # 13-bit header fits this word
                header = (wv >> (51 - off)) & 0x1FFF
            else:
                header = (((wv << 64) | words[iw + 1]) >> (115 - off)) & 0x1FFF
            if header & 0x800:  # '11': new window
                pmlen = (header & 63) + 1
                ptz = 64 - ((header >> 6) & 31) - pmlen
                pay = pos + 13
                pos += 13 + pmlen
            else:  # '10': reuse previous window
                pay = pos + 2
                pos += 2 + pmlen
            iw2 = pay >> 6
            off2 = pay & 63
            end = off2 + pmlen
            if end <= 64:  # payload fits one word
                x = ((words[iw2] >> (64 - end)) & ((1 << pmlen) - 1)) << ptz
            else:
                v2 = (words[iw2] << 64) | words[iw2 + 1]
                x = ((v2 >> (128 - end)) & ((1 << pmlen) - 1)) << ptz
            idxs.append(i)
            vals.append(x & mask64)
            i += 1
        if idxs:
            xors[np.array(idxs, dtype=np.int64)] = np.array(vals, dtype=np.uint64)
    out_bits = np.bitwise_xor.accumulate(xors)
    return out_bits.view(np.float64)
