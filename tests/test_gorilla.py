"""Codec tests: round-trip property tests + adversarial cases + byte
equality against the independent naive bit-string oracle (SURVEY §5.2 #3)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import oracle
from workbook_exporter_fe_ray.functions import gorilla


def _roundtrip_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    enc = gorilla.encode_dod(ts)
    dec = gorilla.decode_dod(enc, len(ts), int(ts[0]) if len(ts) else 0)
    np.testing.assert_array_equal(dec, ts)
    assert enc == oracle.encode_dod_naive(ts)


def _roundtrip_vals(vals):
    vals = np.asarray(vals, dtype=np.float64)
    enc = gorilla.encode_xor(vals)
    dec = gorilla.decode_xor(enc, len(vals), float(vals[0]) if len(vals) else 0.0)
    np.testing.assert_array_equal(dec.view(np.int64), vals.view(np.int64))
    assert enc == oracle.encode_xor_naive(vals)


def test_dod_regular_minute_series():
    _roundtrip_ts(1_704_067_200_000_000 + np.arange(1440) * 60_000_000)


def test_dod_irregular_gaps():
    steps = np.array([60, 60, 120, 60, 3600, 60, 86400, 61, 59, 60], np.int64)
    _roundtrip_ts(1_704_067_200_000_000 + np.cumsum(steps) * 1_000_000)


def test_dod_tiny():
    _roundtrip_ts([5])
    _roundtrip_ts([5, 70])
    assert gorilla.encode_dod(np.array([], np.int64)) == b""


def test_dod_class_boundaries():
    # hit every dod bucket boundary: 0, ±63/64, ±255/256, ±2047/2048, big
    base = 10**15
    deltas = [1000, 1000, 1064, 1001, 1256, 1000, 3048, 955, 10**9, 5]
    _roundtrip_ts(np.cumsum([base] + deltas))


def test_xor_adversarial():
    _roundtrip_vals([0.0, -0.0, 0.0, -0.0])
    _roundtrip_vals([np.nan, 1.0, np.nan, np.inf, -np.inf, 1.0])
    _roundtrip_vals(np.full(100, 3.14159))
    _roundtrip_vals([1.0])
    assert gorilla.encode_xor(np.array([], np.float64)) == b""


def test_xor_int_valued_series():
    rng = np.random.default_rng(7)
    _roundtrip_vals(rng.integers(1, 16384, 1440).astype(np.float64))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=2, max_size=200
    )
)
def test_dod_property(steps):
    ts = np.cumsum(np.array([10**15] + steps, dtype=np.int64))
    _roundtrip_ts(ts)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=200,
    )
)
def test_xor_property(vals):
    _roundtrip_vals(vals)


def test_compression_ratio_on_spec_series():
    """Regular minute series of int-valued floats must compress well."""
    ts = 1_704_067_200_000_000 + np.arange(1440, dtype=np.int64) * 60_000_000
    enc = gorilla.encode_dod(ts)
    assert len(enc) < 1440 * 8 / 20, "DoD should be ≥20× smaller on a regular grid"


@pytest.mark.parametrize("n", [0, 1, 2, 3])
def test_degenerate_lengths(n):
    ts = (1_704_067_200_000_000 + np.arange(n, dtype=np.int64) * 60_000_000)
    vals = np.arange(n, dtype=np.float64) + 0.5
    if n:
        _roundtrip_ts(ts)
        _roundtrip_vals(vals)
