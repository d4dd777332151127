"""M0 kernel parity tests against the reference's golden vectors.

Goldens transcribed in FIXTURES.md §F3 from reference tests
xcorr_test.go:204-254, muse_test.go:41-73, muse_batch_test.go:9-82.
"""

import numpy as np
import pytest

from go_muse_spark import kernels as K

# ---------------------------------------------------------------- nextPow2


@pytest.mark.parametrize(
    "val,expect",
    [(-1, 0), (0, 0), (1, 1), (2, 2), (3, 4), (4, 4), (5, 8), (12, 16),
     (16, 16), (16385, 32768), (480, 512)],
)
def test_next_pow_2(val, expect):
    assert K.next_pow_2(val) == expect


# ------------------------------------------------------------- zNormalize


def test_z_normalize_sum_sq():
    # xcorr_test.go:40-61 checks sum(z^2) == n-1 (sample stddev)
    rng = np.random.default_rng(42)
    x = rng.normal(3.0, 2.0, size=512)
    z, ok = K.z_normalize(x)
    assert ok
    assert np.isclose((z**2).sum(), len(x) - 1)
    # never mutates input (SURVEY.md §2c gotcha 4)
    assert x[0] != z[0]


def test_z_normalize_sigma_zero():
    z, ok = K.z_normalize(np.full(12, 3.0))
    assert not ok and z is None


# ---------------------------------------------------------------- zeroPad


def test_front_zero_pad():
    out = K.front_zero_pad(np.array([1.0, 2.0]), 5)
    assert list(out) == [0.0, 0.0, 0.0, 1.0, 2.0]
    same = K.front_zero_pad(np.array([1.0, 2.0]), 2)
    assert list(same) == [1.0, 2.0]


# ------------------------------------------------------------ maxAbsIndex


@pytest.mark.parametrize(
    "x,expect",
    [([0.0, 0.0, 0.0], 0), ([1.0, -2.0, 2.0], 1), ([-1.0, 0.5], 0),
     ([0.1, 0.2, -0.3], 2)],
)
def test_max_abs_index(x, expect):
    assert K.max_abs_index(np.array(x)) == expect


# -------------------------------------------------- xCorr raw kernel goldens
# xcorr_test.go:204-254 via FIXTURES.md §F3: n=5, exact cc arrays.

X5 = np.array([0.0, 0.0, 2.0, 0.0, 0.0])


def test_xcorr_same_position():
    cc, lag, val = K.xcorr(X5, np.array([0.0, 0.0, 5.0, 0.0, 0.0]), 5)
    assert np.allclose(cc, [1.0, -0.25, -0.25, -0.25, -0.25], atol=1e-8)
    assert lag == 0 and np.isclose(val, 1.0)


def test_xcorr_shifted():
    cc, lag, val = K.xcorr(X5, np.array([0.0, 0.0, 0.0, 0.0, 5.0]), 5)
    assert np.allclose(cc, [-0.25, -0.25, -0.25, 1.0, -0.25], atol=1e-8)
    assert lag == -2 and np.isclose(val, 1.0)


def test_xcorr_sigma_zero():
    cc, lag, val = K.xcorr(X5, np.full(5, 7.0), 5)
    assert cc is None and lag == 0 and val == 0.0


# ----------------------------------------------- Muse goldens (signed score)
# muse_test.go:41-73 via FIXTURES.md §F3: ref [0,0,0,0,1,2,3,3,2,1,0,0],
# score tolerance 1e-3, lag exact.

REF = np.array([0, 0, 0, 0, 1, 2, 3, 3, 2, 1, 0, 0], dtype=np.float64)

MUSE_GOLDENS = [
    ([0, 0, 0, 0, 2, 4, 6, 6, 4, 2, 0, 0], 0, 1.000),
    ([0, 0, 0, 0, 2, 4, 6, 4, 2, 0, 0, 0], 0, 0.929),
    ([0, 0, 0, 0, 0, 0, 0, 0, -2, -3, -2, 0], -3, -0.754),
    ([0, 0, 0, 2, 4, 2, 0, 0, 0, 0, 0, 0], 2, 0.733),
    ([3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3], 0, 0.000),
]


def test_prepare_ref_shape():
    spec = K.prepare_ref(REF)
    assert spec.n == 16 and spec.ref_n == 12
    assert spec.x_spec.shape == (9,)


@pytest.mark.parametrize("y,lag,score", MUSE_GOLDENS)
def test_xcorr_with_x_goldens(y, lag, score):
    spec = K.prepare_ref(REF)
    _, got_lag, got = K.xcorr_with_x(spec, np.array(y, dtype=np.float64))
    got = float(np.clip(got, -1.0, 1.0))  # Muse.Run clamp, muse.go:73-76
    assert got_lag == lag
    assert abs(got - score) < 1e-3


def test_batch_xcorr_matches_singles():
    spec = K.prepare_ref(REF)
    y = np.array([g[0] for g in MUSE_GOLDENS], dtype=np.float64)
    lags, scores = K.batch_xcorr(spec, y)
    signed = K.clamp_signed(scores)
    for i, (_, lag, score) in enumerate(MUSE_GOLDENS):
        assert lags[i] == lag
        assert abs(signed[i] - score) < 1e-3
    # Batch semantics (abs): muse_batch_test.go:23-29 — same but |score|
    unsigned = K.clamp_abs(scores)
    assert abs(unsigned[2] - 0.754) < 1e-3


def test_batch_xcorr_bitwise_equals_single():
    # batching must not change float64 results vs the single-series path
    spec = K.prepare_ref(REF)
    rng = np.random.default_rng(7)
    y = rng.normal(size=(20, 12))
    lags, scores = K.batch_xcorr(spec, y)
    for i in range(20):
        _, lag_i, val_i = K.xcorr_with_x(spec, y[i])
        assert lags[i] == lag_i
        assert scores[i] == val_i  # exact float64 equality


def test_batch_xcorr_length_mismatch():
    spec = K.prepare_ref(REF)
    with pytest.raises(ValueError):
        K.batch_xcorr(spec, np.zeros((2, 5)))


# --------------------------------------- multi-dim grouping kernel golden
# muse_batch_test.go:46-82 via FIXTURES.md §F3: ref [0,0,0,0,.1,.2,.3,.4]


def test_batch_group_goldens():
    ref = np.array([0, 0, 0, 0, 0.1, 0.2, 0.3, 0.4])
    spec = K.prepare_ref(ref)
    # exact candidate vectors from muse_batch_test.go:52-59; expected
    # per-group best (groupBy graph) from muse_batch_test.go:63-69
    cases = {
        "graph1": ([0.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3, 0.4], 0, 1.000),
        "graph2": ([0.0, 0.0, 0.0, 0.0, 0.2, 0.4, 0.4, 0.8], 0, 0.976),
        "graph3": ([0.2, 0.1, 0.2, 0.1, 0.2, 0.1, 0.22, 0.1], 1, 0.248),
        "graph4": ([0.0, 0.0, 0.0, 0.0, -0.2, -0.4, 0.0, -0.8], 0, 0.759),
        "graph5": ([0.0, 0.0, 0.0, -0.2, -0.4, -0.6, 1.0, 0.0], 2, 0.719),
    }
    for name, (y, lag, score) in cases.items():
        _, got_lag, got = K.xcorr_with_x(spec, np.array(y, dtype=np.float64))
        got = min(abs(got), 1.0)  # Batch abs semantics
        assert got_lag == lag, name
        assert abs(got - score) < 1e-3, name
