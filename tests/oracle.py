"""Independent single-process NumPy/pandas reference implementation.

Deliberately written WITHOUT reusing engine stage code (only the shared
public spec constants): everything here is plain pandas groupbys and
naive Python loops, so a bit-identical match against the Ray engine is a
meaningful cross-check (BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

EPOCH0_US = 1_704_067_200_000_000
STEP_US = 60_000_000
US = 1_000_000

TIER_BUCKETS_S = {"1m": 60, "5m": 300, "1h": 3600, "1d": 86400}


def read_points(paths: list[str]) -> pd.DataFrame:
    """Input parquet files → deduplicated (source, ts_us, n_tok) points."""
    frames = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "n_tok", "source"])
        df = t.to_pandas()
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    seq = df["doc_id"].str[-12:].astype(np.int64)
    df["ts_us"] = EPOCH0_US + seq * STEP_US
    df = df.sort_values(["source", "ts_us"], kind="stable")
    df = df.drop_duplicates(subset=["source", "ts_us"], keep="first")
    return df[["source", "ts_us", "n_tok"]].reset_index(drop=True)


def rollup(points: pd.DataFrame, bucket_s: int) -> pd.DataFrame:
    """One tier from raw points: exact int aggregates, mean = sum/count."""
    bucket_us = bucket_s * US
    d = points.copy()
    d["bucket_ts_us"] = (d["ts_us"] // bucket_us) * bucket_us
    v = d["n_tok"].astype(np.int64)
    g = d.assign(v=v).groupby(["source", "bucket_ts_us"], sort=True)["v"]
    out = pd.DataFrame(
        {
            "count": g.count().astype(np.int64),
            "sum": g.sum().astype(np.int64),
            "min": g.min().astype(np.int32),
            "max": g.max().astype(np.int32),
        }
    ).reset_index()
    out["mean"] = out["sum"].to_numpy(np.int64).astype(np.float64) / out[
        "count"
    ].to_numpy(np.int64).astype(np.float64)
    return out


def all_tiers(points: pd.DataFrame) -> dict[str, pd.DataFrame]:
    return {name: rollup(points, s) for name, s in TIER_BUCKETS_S.items()}


def gapfill_locf(tier: pd.DataFrame, bucket_s: int) -> pd.DataFrame:
    """Per-source dense bucket grid from min..max, LOCF on mean."""
    bucket_us = bucket_s * US
    frames = []
    for src, g in tier.groupby("source", sort=True):
        g = g.sort_values("bucket_ts_us")
        grid = np.arange(
            g["bucket_ts_us"].min(), g["bucket_ts_us"].max() + bucket_us, bucket_us
        )
        d = g.set_index("bucket_ts_us").reindex(grid)
        filled = d["mean"].isna()
        d["mean"] = d["mean"].ffill()
        frames.append(
            pd.DataFrame(
                {
                    "source": src,
                    "bucket_ts_us": grid,
                    "value": d["mean"].to_numpy(),
                    "filled": filled.to_numpy(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def gapfill_linear(tier: pd.DataFrame, bucket_s: int) -> pd.DataFrame:
    """Per-source dense grid, linear interpolation between real points.

    Spec'd arithmetic (shared with the engine AND the SQL oracle so all
    three are bit-identical): for a filled bucket at t between real
    neighbors (t0, v0) and (t1, v1),
        v = v0 + (v1 - v0) * (float64(t - t0) / float64(t1 - t0))
    — each step one correctly-rounded IEEE op in this exact order."""
    bucket_us = bucket_s * US
    frames = []
    for src, g in tier.groupby("source", sort=True):
        g = g.sort_values("bucket_ts_us")
        grid = np.arange(
            g["bucket_ts_us"].min(), g["bucket_ts_us"].max() + bucket_us, bucket_us
        )
        x = g["bucket_ts_us"].to_numpy(np.int64)
        y = g["mean"].to_numpy(np.float64)
        pos = np.searchsorted(x, grid, side="right") - 1
        filled = x[pos] != grid
        vals = y[pos]
        f = np.flatnonzero(filled)
        if len(f):
            p = pos[f]
            frac = (grid[f] - x[p]).astype(np.float64) / (
                x[p + 1] - x[p]
            ).astype(np.float64)
            vals = vals.copy()
            vals[f] = y[p] + (y[p + 1] - y[p]) * frac
        frames.append(
            pd.DataFrame(
                {"source": src, "bucket_ts_us": grid, "value": vals, "filled": filled}
            )
        )
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# Naive independent Gorilla codecs (bit-string based, deliberately slow)
# ---------------------------------------------------------------------------


def _b(v: int, w: int) -> str:
    return format(v & ((1 << w) - 1), f"0{w}b")


def _bits_to_bytes(s: str) -> bytes:
    if not s:
        return b""
    pad = (-len(s)) % 8
    s = s + "0" * pad
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def encode_dod_naive(ts) -> bytes:
    ts = [int(t) for t in ts]
    if len(ts) < 2:
        return b""
    out = []
    deltas = [ts[i + 1] - ts[i] for i in range(len(ts) - 1)]
    out.append(_b(deltas[0], 64))
    for i in range(1, len(deltas)):
        dod = deltas[i] - deltas[i - 1]
        if dod == 0:
            out.append("0")
        elif -63 <= dod <= 64:
            out.append("10" + _b(dod + 63, 7))
        elif -255 <= dod <= 256:
            out.append("110" + _b(dod + 255, 9))
        elif -2047 <= dod <= 2048:
            out.append("1110" + _b(dod + 2047, 12))
        else:
            out.append("1111" + _b(dod, 64))
    return _bits_to_bytes("".join(out))


def encode_xor_naive(vals) -> bytes:
    import struct

    bits = [struct.unpack("<Q", struct.pack("<d", float(v)))[0] for v in vals]
    if len(bits) < 2:
        return b""
    out = []
    plz = ptz = -1
    for i in range(1, len(bits)):
        x = bits[i] ^ bits[i - 1]
        if x == 0:
            out.append("0")
            continue
        s = _b(x, 64)
        lz = min(len(s) - len(s.lstrip("0")), 31)
        tz = len(s) - len(s.rstrip("0")) if x else 64
        # spec'd encoder policy (shared with the engine): reuse the
        # window only while (lz, tz) is EXACTLY unchanged; any change
        # opens a new window. (Greedy Gorilla would also reuse on
        # strictly-narrower values — either stream decodes identically.)
        if plz >= 0 and lz == plz and tz == ptz:
            out.append("10" + _b(x >> ptz, 64 - plz - ptz))
        else:
            mlen = 64 - lz - tz
            out.append("11" + _b(lz, 5) + _b(mlen - 1, 6) + _b(x >> tz, mlen))
            plz, ptz = lz, tz
    return _bits_to_bytes("".join(out))
