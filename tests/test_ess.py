"""effective_sample_size: iid ~ n, sticky << n, floor at tau=1."""

import datetime as dt

import pytest

from go_muse_spark.operators.arfit import (
    effective_sample_size,
    ess_tau_sql,
)


def _df(spark, vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (conv, t0 + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def _ref_tau(vals, K):
    n = len(vals)
    sx = sum(vals)
    c0 = n * n * sum(v * v for v in vals) - n * sx * (sx + sx) + n * sx * sx
    tau = 1.0
    acc = None
    for k in range(1, K + 1):
        sk = sum(vals[i] * vals[i - k] for i in range(k, n))
        ak = sum(vals[: n - k])
        bk = sum(vals[k:])
        ck = n * n * sk - n * sx * (ak + bk) + (n - k) * sx * sx
        r = ck / c0
        acc = r if acc is None else acc + r
    return max(1.0, 1.0 + 2.0 * acc)


def test_sticky_series_small_ess(spark):
    # long runs -> strong positive autocorrelation -> ess << n
    vals = [0] * 20 + [10] * 20 + [0] * 20 + [10] * 20
    out = effective_sample_size(_df(spark, vals), "v", 8).collect()[0]
    tau = _ref_tau(vals, 8)
    assert out["tau_u"] == round(tau * 1e6)
    assert out["ess_u"] == round(len(vals) / tau * 1e6)
    assert out["ess_u"] < 20_000_000  # far fewer than 80 effective

def test_alternating_series_floors_at_n(spark):
    # perfect anticorrelation drives the raw tau negative; floor at 1
    vals = [0, 10] * 30
    out = effective_sample_size(_df(spark, vals), "v", 4).collect()[0]
    assert out["tau_u"] == 1_000_000
    assert out["ess_u"] == len(vals) * 1_000_000


def test_tau_sql_is_left_associated():
    sql = ess_tau_sql(3)
    assert "((rho_1 + rho_2) + rho_3)" in sql


def test_validation(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        effective_sample_size(df, "v", 0)
