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
    """Per-source dense grid, linear interpolation between real points."""
    bucket_us = bucket_s * US
    frames = []
    for src, g in tier.groupby("source", sort=True):
        g = g.sort_values("bucket_ts_us")
        grid = np.arange(
            g["bucket_ts_us"].min(), g["bucket_ts_us"].max() + bucket_us, bucket_us
        )
        x = g["bucket_ts_us"].to_numpy(np.float64)
        y = g["mean"].to_numpy(np.float64)
        vals = np.interp(grid.astype(np.float64), x, y)
        filled = ~np.isin(grid, g["bucket_ts_us"].to_numpy())
        # keep real points bit-exact (np.interp at a knot returns the knot value,
        # but be explicit)
        vals[~filled] = y[np.searchsorted(x, grid[~filled].astype(np.float64))]
        frames.append(
            pd.DataFrame(
                {"source": src, "bucket_ts_us": grid, "value": vals, "filled": filled}
            )
        )
    return pd.concat(frames, ignore_index=True)
