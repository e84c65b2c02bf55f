"""Round-4l operators: sparse-table RANGE-frame extrema, join-free
day-over-day delta, gzipped-CSV source."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.window import (
    day_over_day_change,
    range_frame_extrema_1h,
)

US = 1_000_000
HOUR = 3_600 * US
DAY = 86_400 * US


def test_range_frame_extrema_multi_run_vs_brute(ray_session):
    # disjoint-range sources forced into ONE partition: the composite
    # encoding and the sparse-table layers must both stay in-run
    rng = np.random.default_rng(41)
    base = 1_700_000_000 * US
    parts = []
    for s in range(5):
        n = 250
        ts = base + s * 30 * DAY + rng.integers(0, 4 * HOUR, n)
        ts[20:30] = ts[19]  # equal-ts peers
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        np.arange(n, dtype=np.int64) + 10_000 * s
                    ),
                    "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64)),
                    "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
                    "event_type": pa.array([f"s{s}"] * n, pa.string()),
                    "value": pa.array(
                        np.round(rng.normal(0, 70, n), 2), pa.float64()
                    ),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    out = (
        range_frame_extrema_1h(
            ray.data.from_arrow(tbl).repartition(4), num_partitions=1
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
            row = out.loc[ids[i]]
            assert row["max_cents_frame"] == int(c[m].max()), ids[i]
            assert row["min_cents_frame"] == int(c[m].min()), ids[i]


def test_day_over_day_change_vs_brute(ray_session):
    rng = np.random.default_rng(8)
    n = 4000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 20, n).astype(np.int64)),
            # sparse days so some (source, day) pairs have no yesterday
            "ts": pa.array(
                (base + rng.integers(0, 20, n) * 2 * DAY
                 + rng.integers(0, DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [f"s{k}" for k in rng.integers(0, 3, n)], pa.string()
            ),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    out = (
        day_over_day_change(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index(["source", "day"])
        .sort_index()
    )
    df = tbl.to_pandas()
    df["day"] = tbl["ts"].cast(pa.int64()).to_numpy() // DAY
    cnt = df.groupby(["event_type", "day"]).size()
    assert len(out) == len(cnt)
    for (src, day), n_ev in cnt.items():
        r = out.loc[(src, day)]
        prev = int(cnt.get((src, day - 1), 0))
        assert r["n_events"] == n_ev
        assert r["n_prev"] == prev
        assert r["delta"] == n_ev - prev


def test_csv_gz_round_trip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.sources.formats import (
        read_auto,
        synth_logs_csv_gz,
    )

    p = str(tmp_path / "logs.csv.gz")
    synth_logs_csv_gz(p, n=1500)
    ds = read_auto(p)
    got = ds.to_pandas().sort_values("line_id").reset_index(drop=True)
    exp = (
        pq.read_table(str(tmp_path / "logs.parquet"))
        .to_pandas()
        .sort_values("line_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
