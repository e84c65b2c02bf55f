"""Driver-contract smoke: entry() runs, every queries() entry runs at
sf0.001 with a stable schema, oracle_sql keys ⊆ queries keys."""

from __future__ import annotations

import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _to_pandas(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {
        "source", "bucket_ts", "n_points", "sum_cents", "min_cents",
        "max_cents", "mean_cents", "tier",
    }
    assert set(df["tier"]) == {"1m", "5m", "1h", "1d"}


def test_oracle_keys_subset():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(name):
    df = _to_pandas(entrymod.queries()[name](SF))
    # empty results allowed only for pair-mining queries on tiny corpora
    if name not in {"minhash_pairs", "simhash_pairs", "cosine_neardup"}:
        assert len(df) > 0, name
