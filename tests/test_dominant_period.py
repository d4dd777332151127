"""dominant_period: exact integer autocovariance argmax."""

import datetime as dt

import pytest

from go_muse_spark.operators.arfit import dominant_period


def _df(spark, vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (conv, t0 + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def _ck(vals, k):
    """Reference formula: C_k = n^2*S_k - n*Sx*(A_k+B_k) + (n-k)*Sx^2."""
    n = len(vals)
    sx = sum(vals)
    sk = sum(vals[i] * vals[i - k] for i in range(k, n))
    ak = sum(vals[: n - k])  # lagged partner sums
    bk = sum(vals[k:])
    return n * n * sk - n * sx * (ak + bk) + (n - k) * sx * sx


def test_finds_planted_period(spark):
    pat = [0, 5, 1, 0, 9, 2]  # period 6
    vals = pat * 10
    out = dominant_period(
        _df(spark, vals), "v", 2, 12
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["best_lag"] == 6 and r["n"] == 60
    # planted period: near-perfect autocorrelation
    assert r["rho_u"] >= 900_000
    # matches the exact reference formula's argmax
    ref = max(range(2, 13), key=lambda k: (_ck(vals, k), -k))
    assert r["best_lag"] == ref


def test_tie_breaks_to_smallest_lag(spark):
    vals = [1, 0] * 15  # period 2: lags 2 and 4 both aligned
    out = dominant_period(_df(spark, vals), "v", 2, 6).collect()[0]
    ref = max(range(2, 7), key=lambda k: (_ck(vals, k), -k))
    assert out["best_lag"] == ref
    # lag 2 must beat (or tie-win against) its harmonics
    assert out["best_lag"] == 2


def test_min_lag_skips_persistence(spark):
    # smooth ramp up/down, period 20: with min_lag 2 the best lag
    # inside [2, 8] is the exact-formula argmax (short lags dominate
    # a smooth series; the guard is the caller's min_lag choice)
    pat = list(range(10)) + list(range(10, 0, -1))
    vals = pat * 4
    out = dominant_period(_df(spark, vals), "v", 2, 8).collect()[0]
    ref = max(range(2, 9), key=lambda k: (_ck(vals, k), -k))
    assert out["best_lag"] == ref


def test_short_and_flat_series_dropped(spark):
    # 8 points with max_lag 6 -> below min_points (10) -> dropped
    short = _df(spark, [1, 2, 3, 4, 3, 2, 1, 2], conv="s")
    assert dominant_period(short, "v", 2, 6).count() == 0
    flat = _df(spark, [5] * 30, conv="f")  # c_0 == 0 -> dropped
    assert dominant_period(flat, "v", 2, 6).count() == 0


def test_rejects_bad_lag_range(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        dominant_period(df, "v", 0, 6)
    with pytest.raises(ValueError):
        dominant_period(df, "v", 6, 2)
