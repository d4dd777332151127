"""M4 — Gorilla XOR / delta-of-delta codec round-trip properties
(FIXTURES.md §F2: decode(encode(v)) == v exactly, float64 bitwise)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_muse_spark.functions.codecs import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)


def roundtrip_f(v):
    v = np.asarray(v, dtype=np.float64)
    out = decode_floats(encode_floats(v), v.size)
    assert out.size == v.size
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64)), (v, out)


def roundtrip_t(v):
    v = np.asarray(v, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(v), v.size)
    assert np.array_equal(v, out), (v, out)


def test_float_roundtrip_basic():
    roundtrip_f([])
    roundtrip_f([0.0])
    roundtrip_f([1.5, 1.5, 1.5, 1.5])
    roundtrip_f([0.0, -0.0, np.inf, -np.inf, 1e-300, -1e300])
    roundtrip_f(np.arange(1000, dtype=np.float64))
    rng = np.random.default_rng(42)
    roundtrip_f(rng.normal(size=4096))
    roundtrip_f(rng.integers(0, 50, 4096).astype(np.float64))  # count-like


def test_float_roundtrip_nan():
    v = np.array([1.0, np.nan, 2.0])
    out = decode_floats(encode_floats(v), 3)
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64))


def test_float_sign_bit_flip():
    # sign-only change: lz=0, meaningful may be 1..64 — exercises the
    # 6-bit (meaningful-1) encoding at its edge
    roundtrip_f([1.0, -1.0, 1.0, -1.0])
    roundtrip_f([5e-324, -5e-324])  # denormals


def test_ts_roundtrip_basic():
    roundtrip_t([])
    roundtrip_t([0])
    base = 1_735_689_600_000_000  # 2025-01-01 in us
    roundtrip_t(base + np.arange(5000) * 60_000_000)  # perfect 1m buckets
    roundtrip_t([base, base + 1, base + 3, base + 100, base + 100_000_000])
    roundtrip_t([base, base - 60_000_000, base])  # non-monotone still exact
    roundtrip_t([-(1 << 62), 1 << 62])  # huge dod -> 64-bit escape


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=300))
def test_float_roundtrip_property(xs):
    roundtrip_f(xs)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300))
def test_ts_roundtrip_property(xs):
    roundtrip_t(xs)


def test_compression_ratio_on_regular_series():
    # the engine's actual workload: dense regular buckets, smooth counts
    base = 1_735_689_600_000_000
    ts = base + np.arange(4096) * 60_000_000
    enc = encode_timestamps(ts)
    assert len(enc) < 4096 * 8 / 16, len(enc)  # >16x on regular timestamps
    rng = np.random.default_rng(7)
    counts = np.maximum(0, rng.poisson(6, 4096)).astype(np.float64)
    encv = encode_floats(counts)
    assert len(encv) < 4096 * 8 / 2, len(encv)  # >2x on count-like floats
