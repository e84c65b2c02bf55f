"""Round-4 window/text operators vs brute-force single-process references:
hopping windows, counter increase with resets, seasonality profile,
interval-union coverage, OOV rate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from workbook_exporter_fe_ray.stages.text import oov_rate_by_source
from workbook_exporter_fe_ray.stages.window import (
    counter_rate_resets,
    hopping_window_avg,
    hour_of_day_profile,
    interval_coverage,
)

US = 1_000_000


def _events_table(n=5000, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = 1_700_000_000 * US
    ts = base + rng.integers(0, 3 * 86_400 * US, n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "event_type": pa.array(
                [f"type_{i}" for i in rng.integers(0, 5, n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.normal(50, 40, n), 2), pa.float64()
            ),
        }
    )


def _cents(v: np.ndarray) -> np.ndarray:
    return np.round(v * 100.0).astype(np.int64)


@pytest.fixture(scope="module")
def ev_tbl():
    return _events_table()


def _ds(tbl: pa.Table) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(6)


def test_hopping_window_vs_brute(ev_tbl, ray_session):
    out = hopping_window_avg(_ds(ev_tbl)).to_pandas()
    df = ev_tbl.to_pandas()
    c = _cents(df["value"].to_numpy())
    tsv = ev_tbl["ts"].cast(pa.int64()).to_numpy()
    hop, k = 900 * US, 4
    rows = {}
    for i in range(len(df)):
        b = tsv[i] - tsv[i] % hop
        for j in range(k):
            key = (df["event_type"][i], b - j * hop)
            n, s = rows.get(key, (0, 0))
            rows[key] = (n + 1, s + c[i])
    # pandas Timestamp .value is ns; engine timestamps are us
    got = {
        (r.source, r.window_ts.value // 1000): (r.n_points, r.sum_cents)
        for r in out.itertuples()
    }
    assert len(out) == len(rows)
    for (src, w), (n, s) in rows.items():
        assert got[(src, w)] == (n, s)
    # mean is the single pinned division
    assert np.allclose(
        out["mean_cents"], out["sum_cents"].astype(np.float64) / out["n_points"]
    )


def test_counter_rate_resets_vs_brute(ev_tbl, ray_session):
    out = counter_rate_resets(_ds(ev_tbl)).to_pandas()
    df = ev_tbl.to_pandas()
    df["c"] = _cents(df["value"].to_numpy())
    tsv = ev_tbl["ts"].cast(pa.int64()).to_numpy()
    df["bucket"] = tsv - tsv % (3600 * US)
    ref = {}
    for (src, b), g in df.sort_values(["ts", "event_id"]).groupby(
        ["event_type", "bucket"]
    ):
        cv = g["c"].to_numpy()
        inc = res = 0
        for i in range(1, len(cv)):
            d = cv[i] - cv[i - 1]
            if d >= 0:
                inc += d
            else:
                inc += cv[i]
                res += 1
        ref[(src, b)] = (len(cv), res, inc)
    assert len(out) == len(ref)
    for r in out.itertuples():
        key = (r.source, r.bucket_ts.value // 1000)
        assert ref[key] == (r.n_samples, r.n_resets, r.increase_cents), key


def test_hour_profile_vs_pandas(ev_tbl, ray_session):
    out = hour_of_day_profile(_ds(ev_tbl)).to_pandas()
    df = ev_tbl.to_pandas()
    df["c"] = _cents(df["value"].to_numpy())
    # pandas dayofweek: Monday=0; engine contract is DuckDB Sunday=0
    df["dow"] = (df["ts"].dt.dayofweek + 1) % 7
    df["hour"] = df["ts"].dt.hour
    ref = (
        df.groupby(["event_type", "dow", "hour"])["c"]
        .agg(["count", "sum"])
        .reset_index()
    )
    assert len(out) == len(ref)
    m = {
        (r.event_type, r.dow, r.hour): (r.count, r.sum) for r in ref.itertuples()
    }
    for r in out.itertuples():
        assert m[(r.source, r.dow, r.hour)] == (r.n_events, r.sum_cents)


def test_interval_coverage_vs_brute(ev_tbl, ray_session):
    out = interval_coverage(_ds(ev_tbl)).to_pandas()
    df = ev_tbl.to_pandas()
    c = _cents(df["value"].to_numpy())
    s = ev_tbl["ts"].cast(pa.int64()).to_numpy()
    e = s + (np.maximum(c, 0) + 100) * 1000
    day = s - s % (86_400 * US)
    ref = {}
    for key in set(zip(df["event_type"], day)):
        mask = (df["event_type"].to_numpy() == key[0]) & (day == key[1])
        ivs = sorted(zip(s[mask], e[mask]))
        covered, cur_s, cur_e = 0, None, None
        for a, b in ivs:
            if cur_e is None or a > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = a, b
            else:
                cur_e = max(cur_e, b)
        covered += cur_e - cur_s
        ref[key] = (int(mask.sum()), int(covered))
    assert len(out) == len(ref)
    for r in out.itertuples():
        key = (r.source, r.day.value // 1000)
        assert ref[key] == (r.n_intervals, r.covered_us), key


def test_interval_coverage_overlap_semantics(ray_session):
    # two overlapping + one disjoint interval, single source/day
    base = 1_700_006_400 * US  # midnight-aligned? not required
    day0 = base - base % (86_400 * US)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "ts": pa.array(
                [day0 + 1000 * US, day0 + 1005 * US, day0 + 5000 * US],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a", "a", "a"]),
            # cents 10000, 2000, 3000 -> durations 10.1s, 2.1s, 3.1s
            "value": pa.array([100.0, 20.0, 30.0], pa.float64()),
        }
    )
    out = interval_coverage(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 1
    # [1000,1010.1) ∪ [1005,1007.1) = 10.1s ; [5000,5003.1) = 3.1s
    assert out["covered_us"][0] == 13_200_000
    assert out["n_intervals"][0] == 3


def test_oov_rate_vs_brute(ray_session):
    rng = np.random.default_rng(11)
    common = [f"w{i}" for i in range(40)]
    rare = [f"rare{i}" for i in range(300)]
    texts, srcs = [], []
    for i in range(400):
        src = f"s{i % 3}"
        # source s2 skews rare-heavy -> higher OOV
        p_rare = 0.6 if src == "s2" else 0.1
        n = rng.integers(5, 30)
        toks = [
            (rng.choice(rare) if rng.random() < p_rare else rng.choice(common))
            for _ in range(n)
        ]
        texts.append(" ".join(toks))
        srcs.append(src)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(400, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )
    k = 100
    out = (
        oov_rate_by_source(ray.data.from_arrow(tbl).repartition(5), k=k)
        .to_pandas()
        .set_index("source")
    )
    from collections import Counter

    cnt = Counter(t for txt in texts for t in txt.split(" "))
    vocab = set(
        tok for tok, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    )
    ref = {}
    for src in set(srcs):
        toks = [
            t
            for txt, s in zip(texts, srcs)
            if s == src
            for t in txt.split(" ")
        ]
        oov = sum(t not in vocab for t in toks)
        ref[src] = (len(toks), oov)
    assert len(out) == len(ref)
    for src, (n, o) in ref.items():
        row = out.loc[src]
        assert (row["n_tokens"], row["n_oov"]) == (n, o)
        assert row["oov_rate"] == np.float64(o) / np.float64(n)
    assert out.loc["s2", "oov_rate"] > out.loc["s0", "oov_rate"]


def test_spike_episodes_vs_brute(ev_tbl, ray_session):
    from workbook_exporter_fe_ray.stages.window import spike_episodes

    thr = 6000
    out = spike_episodes(_ds(ev_tbl), threshold_cents=thr).to_pandas()
    df = ev_tbl.to_pandas()
    c = _cents(df["value"].to_numpy())
    tsv = ev_tbl["ts"].cast(pa.int64()).to_numpy()
    day = tsv - tsv % (86_400 * US)
    order = np.lexsort(
        (df["event_id"].to_numpy(), tsv, day, df["event_type"].to_numpy())
    )
    ref = []
    cur = None  # (source, day, start, end, n, mx)
    prev_key, prev_hot = None, False
    for i in order:
        key = (df["event_type"][i], day[i])
        hot = c[i] >= thr
        if key != prev_key:
            prev_hot = False
        if hot and not prev_hot:
            if cur:
                ref.append(cur)
            cur = [key[0], key[1], tsv[i], tsv[i], 1, c[i]]
        elif hot:
            cur[3] = tsv[i]
            cur[4] += 1
            cur[5] = max(cur[5], c[i])
        prev_key, prev_hot = key, hot
    if cur:
        ref.append(cur)
    assert len(out) == len(ref)
    got = {
        (r.source, r.day.value // 1000, r.start_ts.value // 1000): (
            r.end_ts.value // 1000,
            r.n_points,
            r.max_cents,
        )
        for r in out.itertuples()
    }
    multi = 0
    for src, d, s0, e0, n, mx in ref:
        assert got[(src, d, s0)] == (e0, n, mx)
        multi += n > 1
    assert multi > 0  # the fixture must actually exercise multi-point runs
