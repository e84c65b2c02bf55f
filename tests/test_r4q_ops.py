"""Round-4q: day-over-day audience Jaccard and daily bounce rate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.window import (
    audience_overlap_dod,
    bounce_rate_daily,
)

US = 1_000_000
DAY = 86_400 * US


def _events(n=4000, seed=47, n_users=40, n_days=12) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, n_days * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )


def test_audience_overlap_vs_brute(ray_session):
    tbl = _events()
    out = (
        audience_overlap_dod(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["day"] = tbl["ts"].cast(pa.int64()).to_numpy() // DAY
    sets = {d: set(g["user_id"]) for d, g in df.groupby("day")}
    assert len(out) == len(sets)
    for d, cur in sets.items():
        prev = sets.get(d - 1, set())
        r = out.loc[d]
        both = len(cur & prev)
        assert r["n_cur"] == len(cur) and r["n_prev"] == len(prev)
        assert r["n_both"] == both
        assert r["jaccard"] == both / (len(cur) + len(prev) - both)


def test_bounce_rate_vs_brute(ray_session):
    tbl = _events(seed=9, n=1500, n_users=80)
    out = (
        bounce_rate_daily(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    exp_s: dict = {}
    exp_b: dict = {}
    for _, g in df.sort_values(["tsu", "event_id"]).groupby("user_id"):
        t = g["tsu"].to_numpy()
        brk = np.r_[True, (t[1:] - t[:-1]) > 1_800 * US]
        sid = np.cumsum(brk) - 1
        for s in range(sid[-1] + 1):
            m = sid == s
            d = int(t[m][0] // DAY)
            exp_s[d] = exp_s.get(d, 0) + 1
            if m.sum() == 1:
                exp_b[d] = exp_b.get(d, 0) + 1
    assert dict(out["n_sessions"]) == dict(sorted(exp_s.items()))
    for d in exp_s:
        assert out.loc[d, "n_bounces"] == exp_b.get(d, 0)
    assert out["n_bounces"].sum() > 0


def test_parquet_rowgroup_audit_multigroup(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.sources.parquet import parquet_rowgroup_audit

    n = 10_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(np.arange(n, dtype=np.int64) * 3),
        }
    )
    p = str(tmp_path / "multi.parquet")
    pq.write_table(tbl, p, row_group_size=1000)
    out = parquet_rowgroup_audit(p).to_pandas()
    assert len(out) == 10
    assert list(out["n_rows"]) == [1000] * 10
    assert list(out["min_val"]) == [k * 1000 for k in range(10)]
    assert list(out["max_val"]) == [k * 1000 + 999 for k in range(10)]
