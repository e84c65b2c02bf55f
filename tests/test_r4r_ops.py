"""Round-4r: DAU/MAU stickiness (interval-union MAU) and token drift."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.text import token_split_drift
from workbook_exporter_fe_ray.stages.window import dau_mau_stickiness

US = 1_000_000
DAY = 86_400 * US


def test_dau_mau_vs_brute_with_dormancy_gaps(ray_session):
    # 90-day horizon with sparse users -> some users have MULTIPLE
    # disjoint MAU intervals (gap > 29 days), the case the per-user
    # interval merge must split correctly
    rng = np.random.default_rng(29)
    n = 2500
    base = 1_700_000_000 * US
    uid = rng.integers(0, 60, n).astype(np.int64)
    ts = (base + rng.integers(0, 90 * DAY, n)).astype(np.int64)
    # planted dormant user: active day 2 and day 70 only (>29-day hole)
    uid = np.r_[uid, [999, 999]]
    ts = np.r_[ts, [base + 2 * DAY + 7, base + 70 * DAY + 11]]
    n += 2
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    out = (
        dau_mau_stickiness(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    df = tbl.to_pandas()
    df["day"] = tbl["ts"].cast(pa.int64()).to_numpy() // DAY
    du = df[["user_id", "day"]].drop_duplicates()
    days = sorted(du["day"].unique())
    assert list(out.index) == days
    for d in days:
        dau = du[du["day"] == d]["user_id"].nunique()
        mau = du[(du["day"] >= d - 29) & (du["day"] <= d)]["user_id"].nunique()
        assert out.loc[d, "dau"] == dau, d
        assert out.loc[d, "mau"] == mau, d
        assert out.loc[d, "stickiness"] == dau / mau, d
    # dormancy-gap sanity: at least one user has a >29-day hole
    gaps = du.sort_values("day").groupby("user_id")["day"].agg(
        lambda s: (np.diff(np.sort(s.to_numpy())) > 29).any()
    )
    assert gaps.any()


def test_token_split_drift_vs_brute(ray_session):
    rng = np.random.default_rng(83)
    vocab = [f"w{k}" for k in range(15)]
    texts = []
    for i in range(200):
        words = [vocab[k] for k in rng.integers(0, 15, 20)]
        if i % 2 == 0:
            words += ["evenword"] * 3  # planted imbalance
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = token_split_drift(
        ray.data.from_arrow(tbl).repartition(5), k=10
    ).to_pandas()
    cnt: dict = {}
    for i, t in enumerate(texts):
        for w in t.split(" "):
            a, b = cnt.get(w, (0, 0))
            cnt[w] = (a + (i % 2 == 0), b + (i % 2 == 1))
    ranked = sorted(cnt.items(), key=lambda kv: (-abs(kv[1][0] - kv[1][1]), kv[0]))
    exp = ranked[:10]
    got = [(t, (e, o)) for t, e, o in zip(out["token"], out["n_even"], out["n_odd"])]
    assert got == exp
    assert out["token"].iloc[0] == "evenword"
