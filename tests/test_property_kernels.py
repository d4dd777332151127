"""Hypothesis property tests for the xcorr kernel core: the algebraic
invariants every normalized cross-correlation must satisfy, checked on
randomized inputs (the golden-vector suite pins specific values; these
pin the LAWS — batch/single bit-equality, affine invariance, circular
shift recovery, clamp bounds)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_muse_spark import kernels

# bounded, non-degenerate float arrays (pow-2 lengths keep the FFT
# domain unpadded so circularity is exact where a property needs it)
_vals = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _series(n):
    return st.lists(_vals, min_size=n, max_size=n).filter(
        lambda xs: np.std(xs) > 1e-9
    )


@settings(max_examples=25, deadline=None)
@given(st.data(), st.sampled_from([8, 16, 32]))
def test_batch_equals_singles_bitwise(data, n):
    ref = np.asarray(data.draw(_series(n)), dtype=np.float64)
    k = data.draw(st.integers(min_value=1, max_value=4))
    Y = np.vstack(
        [
            np.asarray(data.draw(_series(n)), dtype=np.float64)
            for _ in range(k)
        ]
    )
    spec = kernels.prepare_ref(ref)
    lags_b, scores_b = kernels.batch_xcorr(spec, Y)
    for i in range(k):
        lags_s, scores_s = kernels.batch_xcorr(spec, Y[i : i + 1])
        assert scores_b[i] == scores_s[0]  # bitwise, not allclose
        assert lags_b[i] == lags_s[0]


@settings(max_examples=25, deadline=None)
@given(st.data(), st.sampled_from([8, 16, 32]))
def test_affine_invariance(data, n):
    # z-normalization erases y -> a*y + b (a > 0) exactly up to float
    # rounding in the normalization itself
    ref = np.asarray(data.draw(_series(n)), dtype=np.float64)
    y = np.asarray(data.draw(_series(n)), dtype=np.float64)
    a = data.draw(st.floats(min_value=0.1, max_value=100.0))
    b = data.draw(st.floats(min_value=-100.0, max_value=100.0))
    spec = kernels.prepare_ref(ref)
    l1, s1 = kernels.batch_xcorr(spec, y[None, :])
    l2, s2 = kernels.batch_xcorr(spec, (a * y + b)[None, :])
    assert abs(s1[0] - s2[0]) < 1e-9
    assert l1[0] == l2[0]


@settings(max_examples=25, deadline=None)
@given(st.data(), st.sampled_from([8, 16, 32]))
def test_circular_shift_recovery(data, n):
    # pow-2 length -> no front pad -> the FFT correlation is exactly
    # circular: a rolled copy scores 1.0 at the lag that undoes the roll
    x = np.asarray(data.draw(_series(n)), dtype=np.float64)
    k = data.draw(st.integers(min_value=0, max_value=n - 1))
    spec = kernels.prepare_ref(x)
    lags, scores = kernels.batch_xcorr(spec, np.roll(x, k)[None, :])
    # ties between equal-scoring lags possible on structured inputs —
    # including a SIGN tie: an antiperiodic series (e.g. the square
    # wave 0,0,0,0,1,1,1,1) correlates exactly -1 at the antiphase
    # lag, and the reference's maxAbsIndex first-max scan may return
    # the -1 before the +1 (hypothesis found exactly this). The law
    # that always holds is |score| == 1; the lag check applies only
    # when the max is unique (all-distinct values, positive score).
    assert abs(scores[0]) > 1.0 - 1e-9
    cc_equal_one = scores[0] >= 1.0 - 1e-12
    if cc_equal_one and np.unique(np.round(x, 12)).size == n:
        assert (int(lags[0]) - (-k)) % n == 0


@settings(max_examples=25, deadline=None)
@given(st.data(), st.sampled_from([8, 16, 32, 48]))
def test_scores_clamped_to_unit_interval(data, n):
    # batch_xcorr is documented UNCLAMPED (the reference clamps in
    # Muse.Run, muse.go:72-76, not in xcorr.go): a near-identical pair
    # can read 1 + 2 ulp raw. Assert the raw score is only ever
    # ulp-out, and that the Muse.Run-layer clamp (kernels.clamp_signed,
    # applied by operators/search.py) lands it exactly in [-1, 1].
    ref = np.asarray(data.draw(_series(n)), dtype=np.float64)
    y = np.asarray(data.draw(_series(n)), dtype=np.float64)
    spec = kernels.prepare_ref(ref)
    lags, scores = kernels.batch_xcorr(spec, y[None, :])
    assert -1.0 - 1e-12 <= scores[0] <= 1.0 + 1e-12
    clamped = kernels.clamp_signed(scores.copy())
    assert -1.0 <= clamped[0] <= 1.0
    nfft = kernels.next_pow_2(n) if hasattr(kernels, "next_pow_2") else None
    if nfft:
        assert -nfft // 2 <= int(lags[0]) <= nfft
