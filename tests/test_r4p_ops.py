"""Round-4p: CSV sink round-trip and boolean AND retrieval."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from workbook_exporter_fe_ray.stages.text import boolean_and_search


def test_boolean_and_search_exact_membership(ray_session):
    texts = [
        "spark vector merge",          # all three
        "spark vector",                # missing merge
        "vectorize spark merge",       # substring trap: no 'vector' token
        "merge spark vector extra",    # all three, different order
        "",                            # empty doc
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s0", "s0", "s1", "s1", "s1"], pa.string()),
        }
    )
    out = (
        boolean_and_search(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out.loc["s0", "n_docs"] == 2 and out.loc["s0", "n_matching"] == 1
    assert out.loc["s1", "n_docs"] == 3 and out.loc["s1", "n_matching"] == 1


def test_csv_sink_roundtrip_lossless(ray_session, tmp_path):
    # the sink itself: ints through write_csv -> read_csv identical
    import pyarrow.compute as pc

    n = 5000
    rng = np.random.default_rng(2)
    tbl = pa.table(
        {
            "source": pa.array(
                [f"s{k}" for k in rng.integers(0, 4, n)], pa.string()
            ),
            "bucket_ts": pa.array(rng.integers(0, 10**15, n).astype(np.int64)),
            "n_points": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
            "sum_cents": pa.array(
                rng.integers(-(10**9), 10**9, n).astype(np.int64)
            ),
        }
    )
    out_dir = str(tmp_path / "sink")
    ray.data.from_arrow(tbl).repartition(6).write_csv(out_dir)
    back = ray.data.read_csv(out_dir).to_pandas()
    orig = tbl.to_pandas()
    key = ["source", "bucket_ts", "n_points", "sum_cents"]
    a = back.sort_values(key).reset_index(drop=True)
    b = orig.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
