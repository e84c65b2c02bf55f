"""Property test: the packed segment exchange is semantics-preserving
for ARBITRARY point streams — irregular timestamps, duplicate (source,
ts) rows across different blocks, skewed sources, any block layout.

packed=True must equal packed=False (raw-row shuffle) bit-for-bit; both
must equal a direct pandas re-computation of the 1m tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from workbook_exporter_fe_ray.stages.rollup import cascade_rollup


def _mk_points(seed: int, n: int, n_sources: int, dup_frac: float) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_sources, n)
    # irregular µs timestamps across ~3 days, with collisions
    ts = rng.integers(0, 3 * 86_400, n) * 1_000_000 + rng.integers(0, 1000, n)
    val = rng.integers(1, 10_000, n).astype(np.int32)
    df = pd.DataFrame(
        {"source": [f"s{i}" for i in src], "ts_us": ts, "n_tok": val}
    )
    # exact duplicate rows (the dedup contract: dup rows are byte-identical)
    n_dup = int(n * dup_frac)
    if n_dup:
        dup = df.sample(n=n_dup, random_state=seed, replace=True)
        df = pd.concat([df, dup], ignore_index=True)
    return df.sample(frac=1.0, random_state=seed + 1).reset_index(drop=True)


def _oracle_1m(df: pd.DataFrame) -> pd.DataFrame:
    d = df.drop_duplicates(["source", "ts_us"]).copy()
    d["bucket"] = (d["ts_us"] // 60_000_000) * 60_000_000
    g = d.groupby(["source", "bucket"])["n_tok"].agg(["count", "sum", "min", "max"])
    g = g.reset_index().sort_values(["source", "bucket"]).reset_index(drop=True)
    g["mean"] = g["sum"].astype(np.int64).astype(np.float64) / g["count"].astype(
        np.int64
    ).astype(np.float64)
    return g


def _run(df: pd.DataFrame, nb: int, packed: bool) -> pd.DataFrame:
    tbl = pa.table(
        {
            "source": pa.array(df["source"], pa.string()),
            "ts": pa.array(df["ts_us"].to_numpy(np.int64)).cast(pa.timestamp("us")),
            "n_tok": pa.array(df["n_tok"].to_numpy(np.int32)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(nb)
    out = cascade_rollup(ds, packed=packed).to_pandas()
    out = out[out["tier"] == "1m"].copy()
    out["bucket"] = out["bucket_ts"].astype("int64")
    return out.sort_values(["source", "bucket"]).reset_index(drop=True)


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 2**16),
    n=st.integers(50, 800),
    n_sources=st.integers(1, 5),
    nb=st.integers(1, 7),
    dup_frac=st.floats(0.0, 0.3),
)
@pytest.mark.usefixtures("ray_session")
def test_packed_exchange_property(seed, n, n_sources, nb, dup_frac):
    df = _mk_points(seed, n, n_sources, dup_frac)
    want = _oracle_1m(df)
    for packed in (True, False):
        got = _run(df, nb, packed)
        assert len(got) == len(want), (packed, nb)
        assert list(got["source"]) == list(want["source"])
        np.testing.assert_array_equal(got["bucket"].to_numpy(), want["bucket"].to_numpy())
        for c in ("count", "sum", "min", "max"):
            np.testing.assert_array_equal(
                got[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
            )
        np.testing.assert_array_equal(
            got["mean"].to_numpy(np.float64).view(np.int64),
            want["mean"].to_numpy(np.float64).view(np.int64),
        )
