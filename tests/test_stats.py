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


def test_cusum_finds_step_change(spark):
    from go_muse_spark.operators.stats import cusum_changepoint

    # level shift at hour 6: [5]*6 then [20]*6 -> CUSUM peaks at the
    # last pre-shift bucket (hour 5)
    rows = [("a", h, 5) for h in range(6)] + [("a", h, 20) for h in range(6, 12)]
    out = cusum_changepoint(_tier(spark, rows), "turn_cnt").collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_bucket"].hour == 5
    assert r["n_points"] == 12
    # T_k at k=6: n*prefix - k*total = 12*30 - 6*150 = -540
    assert r["tstat"] == 540


def test_cusum_tie_breaks_earliest_and_min_points(spark):
    from go_muse_spark.operators.stats import cusum_changepoint

    # constant series: every T_k == 0, argmax ties -> earliest bucket
    rows = [("a", h, 7) for h in range(5)]
    r = cusum_changepoint(_tier(spark, rows), "turn_cnt").collect()[0]
    assert r["cp_bucket"].hour == 0 and r["tstat"] == 0
    # 3-point series dropped entirely
    short = [("b", h, h) for h in range(3)]
    assert cusum_changepoint(_tier(spark, short), "turn_cnt").count() == 0


def test_cusum_matches_numpy(spark):
    import random

    from go_muse_spark.operators.stats import cusum_changepoint

    rng = random.Random(7)
    hours = sorted(rng.sample(range(200), 60))
    vals = [rng.randrange(0, 50) for _ in hours]
    rows = [("a", h, v) for h, v in zip(hours, vals)]
    r = cusum_changepoint(_tier(spark, rows), "turn_cnt").collect()[0]
    x = np.array(vals, dtype=np.int64)
    n = len(x)
    t = n * np.cumsum(x) - np.arange(1, n + 1) * x.sum()
    k = int(np.argmax(np.abs(t)))
    assert r["tstat"] == abs(t[k])
    got_h = r["cp_bucket"].hour + 24 * (r["cp_bucket"].day - 1)
    assert got_h == hours[k]


def test_acf_lag1_of_linear_series_is_one(spark):
    from go_muse_spark.operators.stats import autocorr_lags

    rows = [("a", h, 10 + 3 * h) for h in range(12)]
    out = {
        r["lag_s"]: r
        for r in autocorr_lags(
            _tier(spark, rows), "turn_cnt", (3600,)
        ).collect()
    }
    r = out[3600]
    assert r["n_pairs"] == 11
    assert abs(r["acf"] - 1.0) < 1e-12


def test_acf_matches_numpy_with_gaps(spark):
    import random

    from go_muse_spark.operators.stats import autocorr_lags

    rng = random.Random(23)
    hours = sorted(rng.sample(range(120), 70))
    vals = {h: rng.randrange(0, 30) for h in hours}
    rows = [("a", h, v) for h, v in vals.items()]
    out = {
        r["lag_s"]: r
        for r in autocorr_lags(
            _tier(spark, rows), "turn_cnt", (3600, 24 * 3600)
        ).collect()
    }
    for lag_h in (1, 24):
        pairs = [(vals[h], vals[h - lag_h]) for h in vals if h - lag_h in vals]
        r = out[lag_h * 3600]
        assert r["n_pairs"] == len(pairs)
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        expect = np.corrcoef(x, y)[0, 1]
        assert abs(r["acf"] - expect) < 1e-9


def test_acf_zero_variance_is_null(spark):
    from go_muse_spark.operators.stats import autocorr_lags

    rows = [("a", h, 4) for h in range(8)]
    r = autocorr_lags(_tier(spark, rows), "turn_cnt", (3600,)).collect()[0]
    assert r["n_pairs"] == 7 and r["acf"] is None


def test_seasonal_profile_buckets_and_means(spark):
    from go_muse_spark.operators.stats import seasonal_profile

    # 1970-01-01 was a Thursday -> dow (0=Mon) == 3
    rows = [
        ("a", dt.datetime(1970, 1, 1, 5, 0), 10.0),
        ("a", dt.datetime(1970, 1, 1, 5, 59, 59, 900000), 20.0),
        # Monday 1970-01-05 -> dow 0
        ("a", dt.datetime(1970, 1, 5, 5, 30), 7.0),
        ("b", dt.datetime(1970, 1, 1, 5, 15), 1.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    )
    out = {
        (r["event_type"], r["dow"], r["hod"]): r
        for r in seasonal_profile(df, "value", by=("event_type",)).collect()
    }
    a = out[("a", 3, 5)]
    assert a["n"] == 2 and a["vsum_mu"] == 30000 and a["mean_mu"] == 15000
    assert out[("a", 0, 5)]["n"] == 1
    assert out[("b", 3, 5)]["vsum_mu"] == 1000


def test_mad_outliers_hand_fixture(spark):
    from go_muse_spark.operators.stats import mad_outliers

    rows = [("u", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "value"]))
    r = mad_outliers(df, "value", by=("user_id",), k=3).collect()[0]
    # sorted [1,2,3,4,100]: low median rank 3 -> 3; devs sorted
    # [0,1,1,2,97] -> MAD 1; only 97 > 3*1 -> one outlier
    assert r["n"] == 5
    assert r["med_mu"] == 3000 and r["mad_mu"] == 1000
    assert r["n_outliers"] == 1


def test_mad_outliers_even_n_low_median(spark):
    from go_muse_spark.operators.stats import mad_outliers

    rows = [("u", v) for v in (10.0, 20.0, 30.0, 40.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "value"]))
    r = mad_outliers(df, "value", by=("user_id",)).collect()[0]
    # even n: LOW median = rank (4+1) div 2 = 2 -> 20
    assert r["med_mu"] == 20000
    # devs |10-20|,|0|,|10|,|20| sorted [0,10,10,20] -> low med rank 2 -> 10
    assert r["mad_mu"] == 10000


def test_inter_arrival_stats_deltas_and_ties(spark):
    from go_muse_spark.operators.stats import inter_arrival_stats

    # user 1: events at t=0s, 10s, 40s (deltas 10s, 30s); the 40s event
    # is a different type. user 2: two events at the SAME timestamp —
    # tiebreak on event_id pairs them deterministically (delta 0).
    rows = [
        (1, 1, "1970-01-01 00:00:00", "click"),
        (2, 1, "1970-01-01 00:00:10", "click"),
        (3, 1, "1970-01-01 00:00:40", "view"),
        (4, 2, "1970-01-01 00:01:00", "click"),
        (5, 2, "1970-01-01 00:01:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["bucket_epoch"], r["event_type"]): r
        for r in inter_arrival_stats(ev, 86400, pcts=(0.5,)).collect()
    }
    click = out[(0, "click")]
    assert click["n"] == 2  # user1's 10s delta + user2's 0s tie delta
    assert click["mean_us"] == 5_000_000.0
    assert click["p_50_us"] == 5_000_000.0
    view = out[(0, "view")]
    assert view["n"] == 1 and view["p_50_us"] == 30_000_000.0
    # first events never contribute
    assert sum(r["n"] for r in out.values()) == 3
    with pytest.raises(ValueError):
        inter_arrival_stats(ev, 86400, pcts=())
    with pytest.raises(ValueError):
        inter_arrival_stats(ev, 86400, pcts=(1.5,))


def test_seasonal_anomaly_flags_only_outliers(spark):
    from go_muse_spark.operators.stats import seasonal_anomaly

    # (dow=3, hod=0) baseline: many 10.0 values + one wild 100.0 at the
    # same slot; a second slot (hod=1) is constant -> zero variance,
    # never flags.
    rows = [
        (i, 1, f"1970-01-01 00:{m:02d}:00", 10.0) for i, m in enumerate(range(20))
    ]
    rows.append((99, 1, "1970-01-01 00:30:00", 100.0))
    rows += [(200 + m, 1, f"1970-01-01 01:{m:02d}:00", 5.0) for m in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = seasonal_anomaly(ev, "value", k=3.0).collect()
    assert [r["event_id"] for r in got] == [99]
    r = got[0]
    assert (r["dow"], r["hod"]) == (3, 0)  # 1970-01-01 was a Thursday
    assert r["vmu"] == 100_000
    # baseline mean = (20*10 + 100)/21 ~ 14.29 -> mean_mu_r 14286
    assert r["mean_mu_r"] == 14286
    assert r["z_u"] > 3_000_000  # z > 3 by construction


def test_moving_quantile_exact_frames(spark):
    from go_muse_spark.operators.rollup import moving_quantile

    rows = [
        (1, f"1970-01-01 {h:02d}:00:00", float(v))
        for h, v in enumerate([1, 9, 5, 3, 7])
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, bucket_ts string, v double"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    out = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in moving_quantile(
            df, "v", 3 * 3600, pcts=(0.5,), by=("conv_id",)
        ).collect()
    }
    # trailing 3h inclusive frames: [1] [1,9] [1,9,5] [9,5,3] [5,3,7]
    assert out[0]["p_50"] == 1.0
    assert out[1]["p_50"] == 5.0
    assert out[2]["p_50"] == 5.0
    assert out[3]["p_50"] == 5.0
    assert out[4]["p_50"] == 5.0
    assert out[4]["win_n"] == 3
    with pytest.raises(ValueError):
        moving_quantile(df, "v", 3600, pcts=())


def test_linear_fit_recovers_ramp_and_guards(spark):
    from go_muse_spark.operators.stats import linear_fit

    # perfect ramp: slope 2 per hour = 2/3600 per second; predict at
    # +1h continues the ramp exactly
    rows = [(1, f"1970-01-01 {h:02d}:00:00", 2 * h + 5) for h in range(10)]
    # a flat series keeps slope exactly 0; a 2-point series -> NULL
    rows += [(2, f"1970-01-01 {h:02d}:00:00", 7) for h in range(6)]
    rows += [(3, f"1970-01-01 {h:02d}:00:00", h) for h in range(2)]
    df = spark.createDataFrame(
        rows, "conv_id long, bucket_ts string, v long"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    got = {
        (r["conv_id"], int(r["bucket_ts"].timestamp() // 3600)): r
        for r in linear_fit(
            df, "v", window_secs=6 * 3600, bucket_secs=3600,
            horizon_secs=3600,
        ).collect()
    }
    for h in range(2, 10):
        r = got[(1, h)]
        assert abs(r["slope_per_s"] - 2.0 / 3600) < 1e-15
        assert abs(r["predict"] - (2 * (h + 1) + 5)) < 1e-9
        assert r["n_win"] == min(h + 1, 6)
    assert got[(2, 5)]["slope_per_s"] == 0.0
    assert abs(got[(2, 5)]["predict"] - 7.0) < 1e-12
    assert got[(3, 1)]["slope_per_s"] is None  # < min_points
    with pytest.raises(ValueError):
        linear_fit(df, "v", window_secs=5000, bucket_secs=3600)


def test_change_stats_counts_transitions(spark):
    from go_muse_spark.operators.stats import change_stats

    vals = [5, 5, 7, 3, 3, 9]  # changes at h2,h3,h5; reset at h3
    rows = [(1, f"1970-01-01 {h:02d}:00:00", v) for h, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id long, bucket_ts string, v long"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    got = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in change_stats(df, "v", 3 * 3600).collect()
    }
    # trailing 3h inclusive: flags per hour = [0,0,1,1,0,1], resets [0,0,0,1,0,0]
    expect_chg = {0: 0, 1: 0, 2: 1, 3: 2, 4: 2, 5: 2}
    expect_rst = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    for h in range(6):
        assert got[h]["n_changes"] == expect_chg[h], h
        assert got[h]["n_resets"] == expect_rst[h], h


def test_windowed_ops_randomized_numpy_parity(spark):
    """Brute-force replay of linear_fit / change_stats / moving_quantile
    on a randomized-but-seeded gappy series: every frame recomputed
    independently in numpy must match Spark's sliding evaluation."""
    import numpy as np

    from go_muse_spark.operators.rollup import moving_quantile
    from go_muse_spark.operators.stats import change_stats, linear_fit

    rng = np.random.default_rng(1234)
    hours = np.sort(
        rng.choice(np.arange(120), size=70, replace=False)
    )  # gappy
    vals = rng.integers(0, 50, size=70)
    rows = [
        (1, int(h) * 3600, int(v)) for h, v in zip(hours, vals)
    ]
    df = (
        spark.createDataFrame(rows, "conv_id long, es long, v long")
        .withColumn("bucket_ts", F.col("es").cast("timestamp"))
        .drop("es")
    )
    W = 12  # 12h trailing
    lf = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in linear_fit(
            df, "v", W * 3600, 3600, horizon_secs=7200, min_points=3
        ).collect()
    }
    cs = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in change_stats(df, "v", W * 3600).collect()
    }
    mq = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in moving_quantile(df, "v", W * 3600, pcts=(0.5,)).collect()
    }
    for i, (h, v) in enumerate(zip(hours, vals)):
        in_w = [
            j for j in range(i + 1) if hours[j] > h - W and hours[j] <= h
        ]
        t = hours[in_w].astype(np.float64)
        y = vals[in_w].astype(np.float64)
        n = len(in_w)
        # linear_fit
        r = lf[int(h)]
        assert r["n_win"] == n
        denom = n * (t * t).sum() - t.sum() ** 2
        if n >= 3 and denom > 0:
            slope = (n * (t * y).sum() - t.sum() * y.sum()) / denom
            pred = y.mean() + slope * (h + 2 - t.mean())
            assert abs(r["slope_per_s"] - slope / 3600) < 1e-12
            assert abs(r["predict"] - pred) < 1e-9
        else:
            assert r["slope_per_s"] is None
        # change_stats: flags over TRANSITIONS inside the frame
        chg = rst = 0
        for j in in_w:
            if j == 0:
                continue
            if vals[j] != vals[j - 1]:
                chg += 1
            if vals[j] < vals[j - 1]:
                rst += 1
        assert cs[int(h)]["n_changes"] == chg
        assert cs[int(h)]["n_resets"] == rst
        # moving_quantile: exact interpolated median of the frame
        assert abs(mq[int(h)]["p_50"] - np.quantile(y, 0.5)) < 1e-9


# ---------------------------------------------------------------- corr_pairs


def test_corr_pairs_semantics(spark):
    from go_muse_spark.operators.stats import corr_pairs

    # a and b perfectly correlated, c anti-correlated with a, d constant,
    # e overlaps a on too few buckets
    rows = []
    for h in range(12):
        rows.append(("a", h, float(h + 1)))
        rows.append(("b", h, float(2 * (h + 1) + 3)))   # corr(a,b) = +1
        rows.append(("c", h, float(-3 * (h + 1))))      # corr(a,c) = -1
        rows.append(("d", h, 7.0))                      # zero variance
    rows += [("e", h, float(h * h)) for h in range(5)]  # overlap 5 < 10
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    out = {
        (r["key_a"], r["key_b"]): r
        for r in corr_pairs(df, "v", min_overlap=10, min_abs_corr=0.5).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")]["corr"] == pytest.approx(1.0, abs=1e-12)
    assert out[("a", "c")]["corr"] == pytest.approx(-1.0, abs=1e-12)
    assert out[("a", "b")]["n_overlap"] == 12


def test_corr_pairs_overlap_only_and_threshold(spark):
    from go_muse_spark.operators.stats import corr_pairs

    import random

    rng = random.Random(7)
    # two noisy series sharing only hours 4..19; numpy truth on overlap
    xs = {h: rng.randrange(1, 50) for h in range(0, 20)}
    ys = {h: xs.get(h, 25) + rng.randrange(-30, 30) for h in range(4, 24)}
    rows = [("x", h, float(v)) for h, v in xs.items()]
    rows += [("y", h, float(v)) for h, v in ys.items()]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    ov = sorted(set(xs) & set(ys))
    truth = np.corrcoef([xs[h] for h in ov], [ys[h] for h in ov])[0, 1]
    got = corr_pairs(df, "v", min_overlap=10, min_abs_corr=0.0).collect()
    assert len(got) == 1
    assert got[0]["n_overlap"] == len(ov) == 16
    assert got[0]["corr"] == pytest.approx(truth, abs=1e-9)
    # threshold above |truth| removes the pair
    assert (
        corr_pairs(df, "v", min_overlap=10, min_abs_corr=abs(truth) + 0.01)
        .count() == 0
    )


def test_corr_pairs_top_series_restriction(spark):
    from go_muse_spark.operators.stats import corr_pairs

    # 3 correlated series; k has the fewest points so top_series=2 drops
    # every pair touching it
    rows = []
    for h in range(12):
        rows.append(("a", h, float(h)))
        rows.append(("b", h, float(3 * h + 1)))
    rows += [("k", h, float(h)) for h in range(10)]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    full = corr_pairs(df, "v", min_overlap=10, min_abs_corr=0.9)
    assert {(r["key_a"], r["key_b"]) for r in full.collect()} == {
        ("a", "b"), ("a", "k"), ("b", "k")
    }
    top2 = corr_pairs(df, "v", min_overlap=10, min_abs_corr=0.9, top_series=2)
    assert {(r["key_a"], r["key_b"]) for r in top2.collect()} == {("a", "b")}


# ------------------------------------------------------------ corr_pairs_lsh


def test_corr_pairs_lsh_recalls_identical_shape(spark):
    from go_muse_spark.operators.stats import corr_pairs_lsh

    # a and b share the exact shape (b = 2a) -> identical z-vectors ->
    # identical signatures -> guaranteed candidate; c is constant on the
    # full spine (zero variance) and must be excluded, not crash
    rows = []
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    for h, v in enumerate(vals):
        rows.append(("a", h, v))
        rows.append(("b", h, 2 * v))
        rows.append(("c", h, 5))
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    out = corr_pairs_lsh(
        df, "v", bucket_secs=3600, planes=8, band_bits=4, min_abs_corr=0.9
    ).collect()
    assert [(r["key_a"], r["key_b"]) for r in out] == [("a", "b")]
    assert out[0]["corr"] == pytest.approx(1.0, abs=1e-12)


def test_corr_pairs_lsh_zero_fill_spine(spark):
    from go_muse_spark.operators.stats import corr_pairs_lsh

    # both series present only on even buckets with equal values; the
    # zero-filled spine makes them identical length-12 vectors -> corr 1
    rows = []
    for h in range(0, 12, 2):
        rows.append(("x", h, h + 3))
        rows.append(("y", h, h + 3))
    # odd-bucket-only series with a different shape anchors the spine
    rows += [("z", h, 7 - h % 5) for h in range(1, 12, 2)]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    out = {
        (r["key_a"], r["key_b"]): r["corr"]
        for r in corr_pairs_lsh(
            df, "v", bucket_secs=3600, planes=8, band_bits=4,
            min_abs_corr=0.95,
        ).collect()
    }
    assert ("x", "y") in out
    assert out[("x", "y")] == pytest.approx(1.0, abs=1e-12)


def test_corr_pairs_lsh_exact_verify_matches_numpy(spark):
    from go_muse_spark.operators.stats import corr_pairs_lsh

    import random

    rng = random.Random(17)
    n_spine = 24
    series = {}
    for k in ("p", "q", "r", "s"):
        series[k] = {
            h: rng.randrange(1, 20)
            for h in range(n_spine)
            if rng.random() < 0.8
        }
    # ensure the spine endpoints exist so every engine sees n_spine=24
    series["p"][0] = 5
    series["q"][n_spine - 1] = 5
    rows = [(k, h, v) for k, d in series.items() for h, v in d.items()]
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    out = corr_pairs_lsh(
        df, "v", bucket_secs=3600, planes=4, band_bits=2, min_abs_corr=0.0
    ).collect()
    assert out, "planes=4/band_bits=2 should always yield some candidate"
    dense = {
        k: np.array([d.get(h, 0) for h in range(n_spine)], dtype=float)
        for k, d in series.items()
    }
    for r in out:
        truth = np.corrcoef(dense[r["key_a"]], dense[r["key_b"]])[0, 1]
        assert r["corr"] == pytest.approx(truth, abs=1e-9), (
            r["key_a"], r["key_b"])


def test_corr_pairs_lsh_anti_arm(spark):
    from go_muse_spark.operators.stats import corr_pairs_lsh

    # b = 30 - a on a full spine -> corr exactly -1 -> complement
    # signature; only the anti arm can surface the pair
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    rows = []
    for h, v in enumerate(vals):
        rows.append(("a", h, v))
        rows.append(("b", h, 30 - v))
    df = _tier(spark, rows, cols=("conv_id", "bucket_ts", "v"))
    hit = corr_pairs_lsh(
        df, "v", bucket_secs=3600, planes=8, band_bits=4, min_abs_corr=0.9
    ).collect()
    assert [(r["key_a"], r["key_b"]) for r in hit] == [("a", "b")]
    assert hit[0]["corr"] == pytest.approx(-1.0, abs=1e-12)
    miss = corr_pairs_lsh(
        df, "v", bucket_secs=3600, planes=8, band_bits=4, min_abs_corr=0.9,
        anti=False,
    ).collect()
    assert miss == []
