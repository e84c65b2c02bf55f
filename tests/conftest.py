from __future__ import annotations

import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from workbook_exporter_fe_ray import datagen  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_test_dir(tmp_path_factory) -> str:
    """Deterministic sf_test input table (FIXTURES.md §1): S=8 sources,
    hot source 3×, gaps/dups/spikes per spec."""
    d = tmp_path_factory.mktemp("sf_test")
    datagen.generate(str(d), n_sources=8, base_seqs=600, seed=42, n_shards=4)
    return str(d)


@pytest.fixture(scope="session")
def sf_test_paths(sf_test_dir) -> list[str]:
    return sorted(
        os.path.join(sf_test_dir, f) for f in os.listdir(sf_test_dir) if f.endswith(".parquet")
    )
