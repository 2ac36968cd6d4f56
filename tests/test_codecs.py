"""Round-trip + compression-ratio tests for the Gorilla XOR and
delta-of-delta codecs (FIXTURES.md §3 golden: decode(blob) == original)."""

from __future__ import annotations

import numpy as np
import pytest

from rasusa_spark.codecs.gorilla import dod_decode, dod_encode, xor_decode, xor_encode


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [3.25],
        [1.0, 1.0, 1.0, 1.0],
        [12.0, 24.0, 15.0, 12.0, 35.0],
        [0.0, -0.0, float("inf"), -float("inf")],
        list(np.linspace(-1e9, 1e9, 500)),
    ],
)
def test_xor_roundtrip(vals):
    arr = np.array(vals, dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(arr.view(np.uint64), out.view(np.uint64))


def test_xor_roundtrip_nan():
    arr = np.array([1.5, np.nan, np.nan, 2.5], dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(np.isnan(arr), np.isnan(out))
    assert np.array_equal(arr[~np.isnan(arr)], out[~np.isnan(out)])


def test_xor_roundtrip_random():
    rng = np.random.default_rng(42)
    arr = rng.normal(1000, 50, 5000)
    assert np.array_equal(xor_decode(xor_encode(arr)), arr)


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [7],
        [7, 7],
        [0, 60, 120, 180, 240],            # constant delta → dod all zero
        [0, 60, 121, 185, 240, 100000],
        [2**62, 2**62 + 1, -(2**62), 0],   # 64-bit escapes
        list(range(0, 100000, 3600)),
    ],
)
def test_dod_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


def test_dod_roundtrip_random():
    rng = np.random.default_rng(7)
    arr = np.cumsum(rng.integers(-5000, 5000, 5000)).astype(np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


def test_dod_compresses_regular_timestamps():
    # hourly buckets: constant delta ⇒ ~1 bit per point after the header
    ts = np.arange(0, 3600 * 10000, 3600, dtype=np.int64)
    blob = dod_encode(ts)
    assert len(blob) < len(ts) * 8 / 40  # ≥40× smaller than raw int64
