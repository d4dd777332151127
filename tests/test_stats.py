"""rolling_zscore / series_corr: semantics vs numpy, guards, plan."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.stats import rolling_zscore, series_corr

T0 = dt.datetime(2026, 1, 1)


def _tier(spark, rows, cols=("conv_id", "bucket_ts", "turn_cnt")):
    return spark.createDataFrame(
        pd.DataFrame(
            [(c, T0 + dt.timedelta(hours=h), *rest) for c, h, *rest in rows],
            columns=list(cols),
        )
    )


def test_zscore_matches_numpy(spark):
    import random

    rng = random.Random(11)
    hours = sorted(rng.sample(range(72), 48))
    vals = {h: rng.randrange(1, 40) for h in hours}
    rows = [("a", h, v) for h, v in vals.items()]
    out = {
        r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1): r
        for r in rolling_zscore(
            _tier(spark, rows), "turn_cnt", 24 * 3600, 3600, min_points=8
        ).collect()
    }
    assert len(out) == len(rows)
    for h, v in vals.items():
        hist = [vals[k] for k in vals if h - 24 <= k <= h - 1]
        r = out[h]
        assert r["n_hist"] == len(hist)
        if len(hist) < 8 or np.std(hist, ddof=1) == 0:
            assert r["z"] is None
            assert r["is_anom"] is False
        else:
            want = (v - np.mean(hist)) / np.std(hist, ddof=1)
            assert r["z"] == pytest.approx(want, abs=1e-9)


def test_zscore_excludes_current_and_flags(spark):
    # 10 flat history points then a spike: history sd>0 needed, so make
    # history alternate 4/6 (mean 5, sd ~1.054); spike of 50 -> |z| >> 3
    rows = [("a", h, 4 if h % 2 else 6) for h in range(10)] + [("a", 10, 50)]
    out = {
        r["bucket_ts"].hour: r
        for r in rolling_zscore(
            _tier(spark, rows), "turn_cnt", 24 * 3600, 3600, min_points=8
        ).collect()
    }
    assert out[10]["is_anom"] is True
    assert out[10]["n_hist"] == 10
    # constant history -> zero variance -> NULL z, no flag
    rows2 = [("b", h, 5) for h in range(12)]
    out2 = rolling_zscore(
        _tier(spark, rows2), "turn_cnt", 24 * 3600, 3600, min_points=8
    ).collect()
    assert all(r["z"] is None and r["is_anom"] is False for r in out2)


def test_corr_matches_numpy(spark):
    import random

    rng = random.Random(3)
    rows = []
    truth = {}
    for c in "abc":
        xs = [rng.randrange(1, 30) for _ in range(20)]
        ys = [2.5 * x + rng.uniform(-5, 5) for x in xs]
        truth[c] = np.corrcoef(xs, ys)[0, 1]
        rows += [(c, h, x, y) for h, (x, y) in enumerate(zip(xs, ys))]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "x", "y"))
    out = {r["conv_id"]: r for r in series_corr(df, "x", "y").collect()}
    for c in "abc":
        assert out[c]["n_points"] == 20
        assert out[c]["corr"] == pytest.approx(truth[c], abs=1e-9)


def test_corr_guards(spark):
    rows = [
        ("short", 0, 1, 1.0),
        ("short", 1, 2, 2.0),  # n=2 < min_points
        ("flatx", 0, 5, 1.0),
        ("flatx", 1, 5, 2.0),
        ("flatx", 2, 5, 3.0),  # zero x variance
    ]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "x", "y"))
    out = {r["conv_id"]: r["corr"] for r in series_corr(df, "x", "y").collect()}
    assert out == {"short": None, "flatx": None}


def test_corr_single_aggregate_plan(spark):
    df = _tier(spark, [("a", 0, 1, 1.0)], cols=("conv_id", "bucket_ts", "x", "y"))
    plan = (
        series_corr(df, "x", "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_period_delta_exact_offset_only(spark):
    import datetime as dt
    import pandas as pd
    from go_muse_spark.operators.stats import period_delta

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # h24 pairs with h0, h25 with h1, h49 with h25;
        # h50 has no bucket at h26 -> NULL
        ("a", 0, 10.0), ("a", 1, 11.0), ("a", 24, 15.0),
        ("a", 25, 13.0), ("a", 49, 20.0), ("a", 50, 7.0),
        ("b", 24, 5.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            [(c, t0 + dt.timedelta(hours=h), v) for c, h, v in rows],
            columns=["conv_id", "bucket_ts", "turn_cnt"],
        )
    )
    out = {
        (r["conv_id"], r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1)):
            (r["prev_value"], r["delta"])
        for r in period_delta(df, "turn_cnt", 86400).collect()
    }
    assert out[("a", 0)] == (None, None)
    assert out[("a", 24)] == (10.0, 5.0)
    assert out[("a", 25)] == (11.0, 2.0)
    assert out[("a", 49)] == (13.0, 7.0)
    assert out[("a", 50)] == (None, None)  # no bucket at h26
    assert out[("b", 24)] == (None, None)  # other series can't leak in
