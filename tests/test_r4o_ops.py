"""Round-4o: skipgram top-k and reactivated-users win-back metric."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.text import skipgram_topk
from workbook_exporter_fe_ray.stages.window import reactivated_users_per_day

US = 1_000_000
DAY = 86_400 * US
HOUR = 3_600 * US


def test_skipgram_topk_vs_brute(ray_session):
    rng = np.random.default_rng(61)
    vocab = [f"w{k}" for k in range(12)]
    texts = [
        " ".join(vocab[k] for k in rng.integers(0, 12, rng.integers(2, 30)))
        for _ in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = skipgram_topk(
        ray.data.from_arrow(tbl).repartition(5), max_dist=3, k=15
    ).to_pandas()
    cnt: dict = {}
    for t in texts:
        w = t.split(" ")
        for i in range(len(w)):
            for d in range(1, 4):
                if i + d < len(w):
                    cnt[(w[i], w[i + d])] = cnt.get((w[i], w[i + d]), 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    exp = ranked[:15]
    got = list(zip(zip(out["w1"], out["w2"]), out["n_pairs"]))
    assert got == exp


def test_reactivated_users_vs_brute(ray_session):
    rng = np.random.default_rng(19)
    n = 3000
    base = 1_700_000_000 * US
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "ts": pa.array(
                (base + rng.integers(0, 10 * DAY, n)).astype(np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    out = (
        reactivated_users_per_day(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
        .set_index("day")["n_reactivated"]
        .sort_index()
    )
    df = tbl.to_pandas()
    df["tsu"] = tbl["ts"].cast(pa.int64()).to_numpy()
    exp: dict = {}
    for uid, g in df.sort_values(["tsu", "event_id"]).groupby("user_id"):
        t = g["tsu"].to_numpy()
        days = set()
        for i in range(1, len(t)):
            if t[i] - t[i - 1] >= 6 * HOUR:
                days.add(int(t[i] // DAY))
        for d in days:
            exp[d] = exp.get(d, 0) + 1
    assert dict(out) == dict(sorted(exp.items()))
