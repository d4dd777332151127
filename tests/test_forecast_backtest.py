"""forecast_backtest: hand-computed error sums and MASE ratio."""

import datetime as dt

import pytest

from go_muse_spark.operators.stats import forecast_backtest


def _df(spark, vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (conv, t0 + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def test_seasonal_series_beats_persistence(spark):
    pat = [0, 10, 0, 10]  # period 4 plant; persistence always off by 10
    vals = pat * 6
    out = forecast_backtest(_df(spark, vals), "v", 4).collect()[0]
    # common support: t >= 4 -> 20 eval rows
    assert out["n_eval"] == 20
    assert out["sae_seasonal"] == 0  # perfect seasonal naive
    assert out["sae_naive"] == sum(
        abs(vals[t] - vals[t - 1]) for t in range(4, 24)
    )
    assert out["mase_u"] == 0


def test_trend_series_prefers_persistence(spark):
    vals = list(range(0, 60, 2))  # pure trend: persistence err 2/row
    out = forecast_backtest(_df(spark, vals), "v", 6).collect()[0]
    assert out["sae_naive"] == 2 * out["n_eval"]
    assert out["sae_seasonal"] == 12 * out["n_eval"]
    assert out["mase_u"] == 6_000_000  # seasonal 6x worse


def test_constant_series_null_ratio(spark):
    out = forecast_backtest(_df(spark, [7] * 20), "v", 4).collect()[0]
    assert out["sae_naive"] == 0 and out["mase_u"] is None


def test_short_series_absent(spark):
    # series shorter than season_lag+1 has no eval rows at all
    assert forecast_backtest(_df(spark, [1, 2, 3]), "v", 4).count() == 0


def test_rejects_bad_lag(spark):
    with pytest.raises(ValueError):
        forecast_backtest(_df(spark, [1, 2, 3]), "v", 1)
