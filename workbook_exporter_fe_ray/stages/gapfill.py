"""Gap-fill: densify a rolled-up tier onto its full bucket grid per series.

Strategies: LOCF (last-observation-carried-forward) and linear
interpolation. Real buckets pass through bit-exact; synthesized buckets
are flagged ``filled=true``.

Reference parity: the engine analog of the reference's default-fill of
missing optional columns/ports (``/root/reference/workbook_exporter-fe.py:
229-236`` schema widening, ``:200``/``:1664-1667`` null-port coalesce —
SURVEY.md §2.2 F4/F13) — lifted from "fill a missing cell" to "fill a
missing bucket in a time series".

Scale note: grouping is per ``source``, which for tier rows is tiny
(one row per bucket — a year of 1m buckets is ~525k rows/series). For
unbounded series you would window by (source, month) and run a second
tiny pass to fix each window's leading gap from the previous window's
last value; the group kernel below is already windowable (it only needs
``prev_value`` injected).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import US


def _fill_group(
    group: pa.Table, bucket_us: int, strategy: str, value_col: str
) -> pa.Table:
    ts = pc.cast(group["bucket_ts"], pa.int64()).to_numpy(zero_copy_only=False)
    val = group[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(ts, kind="stable")
    ts, val = ts[order], val[order]

    grid = np.arange(ts[0], ts[-1] + bucket_us, bucket_us)
    pos = np.searchsorted(ts, grid, side="right") - 1  # index of last real <= grid
    filled = ts[pos] != grid

    if strategy == "locf":
        out = val[pos]
    elif strategy == "linear":
        # explicit prev/next arithmetic (not np.interp) so each step is
        # one correctly-rounded IEEE op in a fixed order:
        #   v = v0 + (v1 - v0) * ((t - t0) / (t1 - t0))
        # — bit-identical to the equivalent SQL expression. Grid spans
        # ts[0]..ts[-1], so every filled bucket has both neighbors.
        out = val[pos]  # real points (and LOCF base) stay bit-exact
        f = np.flatnonzero(filled)
        if len(f):
            p = pos[f]
            t0, v0 = ts[p], val[p]
            t1, v1 = ts[p + 1], val[p + 1]
            frac = (grid[f] - t0).astype(np.float64) / (t1 - t0).astype(np.float64)
            out = out.copy()
            out[f] = v0 + (v1 - v0) * frac
    else:
        raise ValueError(f"unknown gap-fill strategy: {strategy!r}")

    source = group["source"][0].as_py()
    return pa.table(
        {
            "source": pa.array([source] * len(grid), pa.string()),
            "bucket_ts": pa.array(grid).cast(pa.timestamp("us")),
            "value": pa.array(out, pa.float64()),
            "filled": pa.array(filled),
        }
    )


def gapfill(
    tier: ray.data.Dataset,
    bucket_s: int,
    strategy: str = "locf",
    value_col: str = "mean",
) -> ray.data.Dataset:
    """Tier rows → dense (source, bucket_ts, value, filled) grid per series."""
    if strategy not in ("locf", "linear"):
        raise ValueError(f"unknown gap-fill strategy: {strategy!r}")
    bucket_us = bucket_s * US
    return tier.groupby("source").map_groups(
        lambda g: _fill_group(g, bucket_us, strategy, value_col),
        batch_format="pyarrow",
    )
