"""Low-cardinality scaling record for the windowed Kendall-discordance
kernel: 2M rows, ONE source — the shape where a plain hash(source)
route collapses onto a single task.  Compares the windowed
decomposition (7-day spans) against the single-window plan and records
both walls + the speedup to BENCH/lowcard_r4s_inversions.json.

Run: python BENCH/bench_r4s_inversions.py   (from /root/repo)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

US = 1_000_000
DAY = 86_400 * US


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from workbook_exporter_fe_ray.stages.window import ts_value_inversions

    rng = np.random.default_rng(9)
    n = 2_000_000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(
                np.sort(base + rng.integers(0, 180 * DAY, n)).astype(
                    np.int64
                ),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["only"] * n, pa.string()),
            "value": pa.array(
                rng.integers(-999, 1000, n).astype(np.float64) / 100.0
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(32).materialize()

    t0 = time.perf_counter()
    one = ts_value_inversions(
        ds, num_partitions=64, span_us=10**18
    ).to_pandas()
    t_single = time.perf_counter() - t0

    t0 = time.perf_counter()
    win = ts_value_inversions(
        ds, num_partitions=64, span_us=7 * DAY
    ).to_pandas()
    t_win = time.perf_counter() - t0

    assert one.sort_values("source").reset_index(drop=True).equals(
        win.sort_values("source").reset_index(drop=True)
    ), "windowed plan must be bit-identical"
    rec = {
        "rows": n,
        "sources": 1,
        "num_cpus": 32,
        "single_window_s": round(t_single, 2),
        "windowed_7d_s": round(t_win, 2),
        "speedup": round(t_single / t_win, 2),
        "n_inversions": int(one["n_inversions"].iloc[0]),
    }
    print(json.dumps(rec))
    json.dump(
        rec, open("BENCH/lowcard_r4s_inversions.json", "w"), indent=1
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
