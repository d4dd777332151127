"""Pure-numpy muse kernels — bit-parity with the reference's xcorr path.

Implements the verified numeric spec from SURVEY.md §2c (reproduced from
reference files xcorr.go:19-197, muse.go:23-92, muse_batch.go:56-93).
No Spark imports here: these run inside Arrow-batched pandas UDFs on
executors and in unit tests against the reference's golden vectors.

Semantic gotchas preserved deliberately (do NOT "fix"):
  * maxLag is a post-filter, not a search window (results.go:46-52).
  * sigma=0 series -> (lag=0, score=0), still a result row (xcorr.go:164-171).
  * argmax ties: first max wins (xcorr.go:39-50; np.argmax matches).
  * front zero-padding, sample (ddof=1) stddev (xcorr.go:70-95).
  * Muse.Run keeps the SIGNED score; Batch keeps |score| (muse.go:86-88 vs
    muse_batch.go:74-77).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = [
    "next_pow_2",
    "z_normalize",
    "front_zero_pad",
    "max_abs_index",
    "xcorr",
    "prepare_ref",
    "xcorr_with_x",
    "batch_xcorr",
    "RefSpectrum",
]


def next_pow_2(val: float) -> int:
    """Next power of 2 >= val; exact powers map to themselves; <=0 -> 0.

    Reference: xcorr.go:19-24.
    """
    if val <= 0:
        return 0
    n = int(np.ceil(val))
    return 1 << (n - 1).bit_length()


def z_normalize(x: np.ndarray) -> tuple[np.ndarray | None, bool]:
    """(x - mean) / sample-stddev (ddof=1). Returns (None, False) on sigma=0.

    Reference: xcorr.go:84-95 (gonum stat.StdDev uses the n-1 denominator).
    Unlike the reference this never mutates its input (SURVEY.md §2c gotcha 4).
    """
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        return None, False
    sigma = x.std(ddof=1)
    if sigma == 0.0 or not np.isfinite(sigma):
        return None, False
    return (x - x.mean()) / sigma, True


def front_zero_pad(x: np.ndarray, n: int) -> np.ndarray:
    """Pad with LEADING zeros to length n; no-op if n <= len(x).

    Reference: xcorr.go:70-80. The front (not back) convention is what keeps
    lag parity with the reference's cc vectors.
    """
    x = np.asarray(x, dtype=np.float64)
    if n <= x.size:
        return x
    return np.concatenate([np.zeros(n - x.size, dtype=np.float64), x])


def max_abs_index(x: np.ndarray) -> int:
    """argmax of |value|, first strictly-greater wins (xcorr.go:39-50)."""
    return int(np.argmax(np.abs(np.asarray(x))))


def _wrap_lag(i: int, n: int) -> int:
    """Circular index -> signed lag: i - n if i > n/2 else i (xcorr.go:192-194)."""
    return i - n if i > n // 2 else i


def xcorr(
    x: np.ndarray, y: np.ndarray, n: int, normalize: bool = True
) -> tuple[np.ndarray | None, int, float]:
    """Full two-series circular cross-correlation (reference xcorr.go:102-153).

    Returns (cc, lag, max_val). normalize=True z-norms both sides and scales
    the circular dot products by 1/(n-1) (Pearson-style, in [-1, 1]);
    normalize=False correlates raw values unscaled. sigma=0 under normalize
    -> (None, 0, 0.0).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if normalize:
        x, okx = z_normalize(x)
        y, oky = z_normalize(y)
        if not (okx and oky):
            return None, 0, 0.0
    xp = front_zero_pad(x, n)
    yp = front_zero_pad(y, n)
    # Cross-correlation theorem: IDFT(X . conj(Y))[k] = sum_j x[j] y[(j-k) % n].
    # numpy's 1/n-in-inverse convention makes irfft return the raw circular
    # sums directly (the reference divides gonum's n-scaled sequence by n:
    # xcorr.go:141-147 — numerically identical).
    cc = np.fft.irfft(np.fft.rfft(xp) * np.conj(np.fft.rfft(yp)), n)
    if normalize:
        cc = cc / (n - 1)
    i = max_abs_index(cc)
    return cc, _wrap_lag(i, n), float(cc[i])


class RefSpectrum(NamedTuple):
    """Prepared reference query plan (reference muse.go:14-19).

    X is the FFT of the z-normalized, 1/(refN-1)-scaled, front-padded
    reference. Broadcast this to executors once per query.
    """

    x_spec: np.ndarray  # complex128, rfft of prepared ref, length n//2+1
    n: int  # FFT length (next pow 2 >= ref_n)
    ref_n: int  # original reference length


def prepare_ref(ref: np.ndarray) -> RefSpectrum:
    """Prepare a reference series for repeated scoring (muse.go:23-42).

    z-norm, scale by 1/(refN-1) (muse.go:33), front-pad to next pow2, FFT
    once. Raises ValueError on len<1 or sigma=0 (the reference returns an
    error from New in those cases).
    """
    ref = np.asarray(ref, dtype=np.float64)
    if ref.size < 1:
        raise ValueError("reference series must have length >= 1")
    ref_n = int(ref.size)
    n = next_pow_2(ref_n)
    z, ok = z_normalize(ref)
    if not ok:
        raise ValueError("reference series has zero variance")
    z = z / (ref_n - 1)
    x_spec = np.fft.rfft(front_zero_pad(z, n))
    return RefSpectrum(x_spec, n, ref_n)


def xcorr_with_x(
    spec: RefSpectrum, y: np.ndarray
) -> tuple[np.ndarray | None, int, float]:
    """Score one candidate against a prepared reference (xcorr.go:160-197)."""
    z, ok = z_normalize(np.asarray(y, dtype=np.float64))
    if not ok:
        return None, 0, 0.0
    yp = front_zero_pad(z, spec.n)
    cc = np.fft.irfft(np.conj(np.fft.rfft(yp)) * spec.x_spec, spec.n)
    i = max_abs_index(cc)
    return cc, _wrap_lag(i, spec.n), float(cc[i])


def batch_xcorr(
    spec: RefSpectrum, y_matrix: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized scoring of m candidates in one 2-D rfft (SURVEY.md §4).

    y_matrix: (m, L) float64 with L == spec.ref_n. Returns (lags int64[m],
    scores float64[m]) with the reference's per-candidate semantics:
    sigma=0 rows -> (0, 0.0); argmax first-max-wins; circular lag wrap.
    Scores are raw cc-at-best-lag (signed, unclamped) — callers apply the
    Muse.Run clamp / Batch abs per SURVEY.md §2c.

    This one-rfft-per-Arrow-batch shape is the vectorization the reference
    lacks (it FFTs per candidate with scratch reuse, muse_batch.go:62-64).
    """
    y_spec, ok = batch_y_spec(y_matrix, spec.n, spec.ref_n)
    return xcorr_from_spec(spec.x_spec, y_spec, ok, spec.n)


def batch_y_spec(
    y_matrix: np.ndarray, fft_n: int, ref_n: int
) -> tuple[np.ndarray, np.ndarray]:
    """The candidate half of batch_xcorr, factored out so MULTIPLE
    prepared references can score the same candidates from ONE rfft —
    the reuse the single-ref API cannot express (a k-reference search
    re-FFTs every candidate k times through batch_xcorr).

    Returns (y_spec complex128 (m, fft_n//2+1), ok bool[m]) where ok
    marks rows with nonzero finite sample sigma (sigma=0 rows z-norm
    against 1.0 and are masked to (0, 0.0) downstream, matching the
    reference's per-candidate semantics).
    """
    y = np.asarray(y_matrix, dtype=np.float64)
    if y.ndim != 2:
        raise ValueError("y_matrix must be 2-D (m, L)")
    m, length = y.shape
    if length != ref_n:
        raise ValueError(
            f"candidate length {length} != reference length {ref_n} "
            "(reference group.go:45-51 equal-length invariant)"
        )
    mean = y.mean(axis=1, keepdims=True)
    sigma = y.std(axis=1, ddof=1, keepdims=True)
    ok = (sigma[:, 0] != 0.0) & np.isfinite(sigma[:, 0])
    safe_sigma = np.where(sigma == 0.0, 1.0, sigma)
    z = (y - mean) / safe_sigma
    # front zero-pad the whole matrix at once
    zp = np.zeros((m, fft_n), dtype=np.float64)
    zp[:, fft_n - length :] = z
    return np.fft.rfft(zp, axis=1), ok


def xcorr_from_spec(
    x_spec: np.ndarray, y_spec: np.ndarray, ok: np.ndarray, fft_n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Finish a batched xcorr from precomputed spectra: multiply, one
    inverse FFT, first-max-wins argmax, circular lag wrap, sigma=0 mask.
    Identical arithmetic to the fused batch_xcorr (which now delegates
    here), so golden-parity tests cover both entry points."""
    n = fft_n
    cc = np.fft.irfft(np.conj(y_spec) * x_spec[None, :], n, axis=1)
    idx = np.argmax(np.abs(cc), axis=1)  # first max wins, matches maxAbsIndex
    lags = np.where(idx > n // 2, idx - n, idx).astype(np.int64)
    scores = cc[np.arange(idx.size), idx]
    lags = np.where(ok, lags, 0)
    scores = np.where(ok, scores, 0.0)
    return lags, scores


def clamp_signed(scores: np.ndarray) -> np.ndarray:
    """Muse.Run semantics: clamp to [-1, 1], keep sign (muse.go:73-76)."""
    return np.clip(scores, -1.0, 1.0)


def clamp_abs(scores: np.ndarray) -> np.ndarray:
    """Batch.scoreSingle semantics: |score| clamped <= 1 (muse_batch.go:74-77)."""
    return np.minimum(np.abs(scores), 1.0)
