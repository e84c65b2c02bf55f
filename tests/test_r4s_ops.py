"""Round-4s operators: wavelet-matrix RANGE-frame sliding quantiles."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.window import range_frame_quantiles_1h

US = 1_000_000
HOUR = 3_600 * US
DAY = 86_400 * US


def test_range_frame_quantiles_multi_run_vs_brute(ray_session):
    # several sources forced into ONE partition: the composite run
    # encoding must keep frames in-run, the wavelet matrix must answer
    # every row's k-th query exactly, equal-ts peers included
    rng = np.random.default_rng(47)
    base = 1_700_000_000 * US
    parts = []
    for s in range(4):
        n = 300
        ts = base + s * 30 * DAY + rng.integers(0, 4 * HOUR, n)
        ts[40:55] = ts[39]  # equal-ts peers
        # heavy value duplication so rank compression has real ties
        vals = rng.integers(-5, 6, n).astype(np.float64) * 0.25
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        np.arange(n, dtype=np.int64) + 10_000 * s
                    ),
                    "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64)),
                    "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
                    "event_type": pa.array([f"s{s}"] * n, pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    out = (
        range_frame_quantiles_1h(
            ray.data.from_arrow(tbl).repartition(5), num_partitions=1
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["c"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    assert len(out) == len(df)
    for _, g in df.groupby("event_type"):
        tsu = g["tsu"].to_numpy()
        c = g["c"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            m = (tsu >= tsu[i] - HOUR) & (tsu <= tsu[i])
            fr = np.sort(c[m])
            nf = len(fr)
            row = out.loc[ids[i]]
            assert row["n_in_frame"] == nf, ids[i]
            # DuckDB quantile_disc: 0-indexed element ceil(q*n)-1
            assert row["median_cents"] == fr[math.ceil(0.5 * nf) - 1], ids[i]
            assert row["p90_cents"] == fr[math.ceil(0.9 * nf) - 1], ids[i]


def test_range_frame_quantiles_single_distinct_value(ray_session):
    # degenerate rank domain (|V| = 1) exercises the nbits floor
    n = 64
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                (base + np.arange(n, dtype=np.int64) * 60 * US),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["only"] * n, pa.string()),
            "value": pa.array(np.full(n, 7.5), pa.float64()),
        }
    )
    out = range_frame_quantiles_1h(
        ray.data.from_arrow(tbl), num_partitions=1
    ).to_pandas()
    assert (out["median_cents"] == 750).all()
    assert (out["p90_cents"] == 750).all()
    assert out["n_in_frame"].max() == 61  # trailing hour at 1/min + self
