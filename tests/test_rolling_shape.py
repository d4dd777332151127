"""rolling_shape: reference-formula parity, tail detection, guards."""

import datetime as dt

import pytest

from go_muse_spark.operators.stats import rolling_shape


def _df(spark, vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (conv, t0 + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def _ref(window):
    n = len(window)
    s1 = sum(window)
    s2 = sum(v * v for v in window)
    s3 = sum(v**3 for v in window)
    s4 = sum(v**4 for v in window)
    a2 = n * s2 - s1 * s1
    a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    a4 = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
    import math

    skew = a3 / (a2 * math.sqrt(a2))
    kurt = n * a4 / (a2 * a2) - 3.0
    return skew, kurt


def test_matches_reference_trailing_window(spark):
    vals = [5, 7, 6, 5, 50, 6, 5, 7, 6, 5, 6, 7]
    out = (
        rolling_shape(_df(spark, vals), "v", 8 * 3600, min_points=8)
        .orderBy("bucket_ts")
        .collect()
    )
    # row i has trailing window vals[max(0, i-7)..i]
    for i, r in enumerate(out):
        win = vals[max(0, i - 7) : i + 1]
        if len(win) < 8:
            assert r["skew"] is None
            continue
        skew, kurt = _ref(win)
        assert r["n_win"] == len(win)
        assert r["skew"] == pytest.approx(skew, rel=1e-12)
        assert r["kurt"] == pytest.approx(kurt, rel=1e-12)


def test_spike_raises_skew_and_kurt(spark):
    flat = [6] * 4 + [5, 7] * 2
    spike = flat + [60] + [6] * 3
    out = rolling_shape(
        _df(spark, spike), "v", 12 * 3600, min_points=8
    ).orderBy("bucket_ts").collect()
    last = out[-1]
    assert last["skew"] > 2 and last["kurt"] > 4


def test_zero_variance_window_null(spark):
    out = rolling_shape(
        _df(spark, [5] * 12), "v", 8 * 3600, min_points=8
    ).collect()
    assert all(r["skew"] is None and r["kurt"] is None for r in out)
