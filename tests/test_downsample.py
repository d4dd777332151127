"""m4_downsample / ewma / top_series_per_bucket: semantics vs a plain
pandas reimplementation, tie rules, gap-awareness, plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.downsample import (
    ewma,
    m4_downsample,
    top_series_per_bucket,
)

T0 = dt.datetime(2026, 1, 1)


def _tier(spark, rows):
    """rows: (conv, hour_offset, value) -> 1h-tier DataFrame."""
    return spark.createDataFrame(
        pd.DataFrame(
            [
                (c, T0 + dt.timedelta(hours=h), v)
                for c, h, v in rows
            ],
            columns=["conv_id", "bucket_ts", "turn_cnt"],
        )
    )


def test_m4_picks_four_extrema(spark):
    # one conv, one day pixel: first at h0, last at h23, min at h5, max at h7
    rows = [("a", 0, 10), ("a", 5, 1), ("a", 7, 99), ("a", 23, 50)]
    out = m4_downsample(_tier(spark, rows), "turn_cnt", 86400).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 4
    assert (r["first_ts"].hour, r["first_v"]) == (0, 10)
    assert (r["last_ts"].hour, r["last_v"]) == (23, 50)
    assert (r["min_ts"].hour, r["min_v"]) == (5, 1)
    assert (r["max_ts"].hour, r["max_v"]) == (7, 99)


def test_m4_tie_rules(spark):
    # duplicate min value at h2 and h9 -> earliest wins;
    # duplicate max value at h3 and h11 -> latest wins
    rows = [("a", 2, 1), ("a", 9, 1), ("a", 3, 8), ("a", 11, 8)]
    r = m4_downsample(_tier(spark, rows), "turn_cnt", 86400).collect()[0]
    assert r["min_ts"].hour == 2
    assert r["max_ts"].hour == 11


def test_m4_splits_pixels_and_series(spark):
    rows = [("a", 0, 1), ("a", 25, 2), ("b", 0, 3)]
    out = m4_downsample(_tier(spark, rows), "turn_cnt", 86400)
    got = {(r["conv_id"], r["px_ts"].day) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 1)}


def test_m4_single_aggregate_plan(spark):
    plan = m4_downsample(
        _tier(spark, [("a", 0, 1)]), "turn_cnt", 86400
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # partial agg before the shuffle
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_ewma_exact_values(spark):
    # conv a: buckets h0..h2 with a gap at h1 -> at h2 the window sees
    # h2 (w=1) and h0 (w=1/4): ewma = (v2 + v0/4) / (1 + 1/4)
    rows = [("a", 0, 8), ("a", 2, 2)]
    out = {
        r["bucket_ts"].hour: r
        for r in ewma(
            _tier(spark, rows), "turn_cnt", 3600, window_buckets=4
        ).collect()
    }
    assert set(out) == {0, 2}  # phantom h1/h3 targets dropped
    assert out[0]["ewma"] == pytest.approx(8.0)
    assert out[0]["w_norm"] == 1.0
    assert out[2]["ewma"] == pytest.approx((2 + 8 * 0.25) / 1.25)
    assert out[2]["w_norm"] == 1.25


def test_ewma_truncates_at_window(spark):
    # window 2: at h5 only h5/h4 can contribute; h0 is out of range
    rows = [("a", 0, 100), ("a", 4, 4), ("a", 5, 2)]
    out = {
        r["bucket_ts"].hour: r["ewma"]
        for r in ewma(
            _tier(spark, rows), "turn_cnt", 3600, window_buckets=2
        ).collect()
    }
    assert out[5] == pytest.approx((2 + 4 * 0.5) / 1.5)


def test_ewma_matches_pandas_reference(spark):
    import random

    rng = random.Random(7)
    rows = [
        (c, h, rng.randrange(1, 50))
        for c in "ab"
        for h in sorted(rng.sample(range(48), 30))
    ]
    got = {
        (r["conv_id"], r["bucket_ts"]): r["ewma"]
        for r in ewma(
            _tier(spark, rows), "turn_cnt", 3600, window_buckets=8
        ).collect()
    }
    by_conv: dict = {}
    for c, h, v in rows:
        by_conv.setdefault(c, {})[h] = v
    assert len(got) == len(rows)
    for c, series in by_conv.items():
        for h, v in series.items():
            num = den = 0.0
            for k in range(8):
                if h - k in series:
                    num += series[h - k] * 2.0**-k
                    den += 2.0**-k
            key = (c, T0 + dt.timedelta(hours=h))
            assert got[key] == pytest.approx(num / den, abs=1e-12)


def test_ewma_no_sort_in_plan(spark):
    plan = ewma(
        _tier(spark, [("a", 0, 1)]), "turn_cnt", 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan  # explode+hash-agg, not a window sort
    assert plan.count("Exchange") == 1


def test_top_series_per_bucket(spark):
    rows = [("a", 0, 5), ("b", 0, 9), ("c", 0, 9), ("d", 0, 1), ("a", 24, 2)]
    out = top_series_per_bucket(_tier(spark, rows), "turn_cnt", 2).collect()
    day1 = sorted(
        (r["rnk"], r["conv_id"]) for r in out if r["bucket_ts"].day == 1
    )
    # tie on 9 -> series key ascending: b before c; top-2 excludes a, d
    assert day1 == [(1, "b"), (2, "c")]
    day2 = [(r["rnk"], r["conv_id"]) for r in out if r["bucket_ts"].day == 2]
    assert day2 == [(1, "a")]


# ----------------------------------------------------------------- lttb


def _lttb_sim(rows, out_secs):
    """Pure-Python replica of the fixed-anchor LTTB contract (IEEE
    doubles, same expression order as the operator)."""
    per = {}
    for c, h, v in rows:
        t = int((T0 + dt.timedelta(hours=h) - dt.datetime(1970, 1, 1)).total_seconds())
        per.setdefault(c, []).append((t, round(v * 1000)))
    sel = {}
    for c, pts in per.items():
        pts.sort()
        bk = {}
        for t, vmu in pts:
            bk.setdefault(t // out_secs, []).append((t, vmu))
        pxs = sorted(bk)
        for i, px in enumerate(pxs):
            mem = bk[px]
            if i == 0:
                best = min(mem)
            elif i == len(pxs) - 1:
                best = max(mem)
            else:
                pp, np_ = pxs[i - 1], pxs[i + 1]
                pn, nn = len(bk[pp]), len(bk[np_])
                x_l = sum(t - pp * out_secs for t, _ in bk[pp]) / pn + float(pp - px) * float(out_secs)
                y_l = sum(v for _, v in bk[pp]) / pn
                x_r = sum(t - np_ * out_secs for t, _ in bk[np_]) / nn + float(np_ - px) * float(out_secs)
                y_r = sum(v for _, v in bk[np_]) / nn
                best, bkey = None, None
                for t, vmu in mem:
                    x = float(t - px * out_secs)
                    y = float(vmu)
                    a2 = abs((x_l - x_r) * (y - y_l) - (x_l - x) * (y_r - y_l))
                    key = (a2, -t)
                    if bkey is None or key > bkey:
                        best, bkey = (t, vmu), key
            sel[(c, px * out_secs)] = (best[0], best[1], len(mem))
    return sel


def test_lttb_endpoints_and_membership(spark):
    from go_muse_spark.operators.downsample import lttb_downsample

    rows = [("a", h, (h * 37) % 11 - 5) for h in range(0, 72, 2)]
    out = lttb_downsample(_tier(spark, rows), "turn_cnt", 86400).collect()
    assert len(out) == 3  # three day pixels
    by_px = {r["px_epoch"]: r for r in out}
    first_px = min(by_px)
    last_px = max(by_px)
    # endpoint rule
    assert by_px[first_px]["t_epoch"] % 86400 == 0  # h0 point
    assert by_px[last_px]["t_epoch"] % 86400 == 70 * 3600 % 86400
    # membership: each selected point lies inside its pixel
    for px, r in by_px.items():
        assert px <= r["t_epoch"] < px + 86400


def test_lttb_matches_simulator(spark):
    from go_muse_spark.operators.downsample import lttb_downsample
    import random

    rng = random.Random(13)
    rows = []
    for c in ["a", "b", "c"]:
        for h in range(0, 24 * 7):
            if rng.random() < 0.6:
                rows.append((c, h, rng.randrange(-500, 500)))
    want = _lttb_sim(rows, 86400)
    got = {
        (r["conv_id"], r["px_epoch"]): (r["t_epoch"], r["vmu"], r["n_points"])
        for r in lttb_downsample(_tier(spark, rows), "turn_cnt", 86400).collect()
    }
    assert got == want


def test_brown_trend_numpy_replay_and_ramp(spark):
    import numpy as np

    from go_muse_spark.operators.downsample import brown_trend

    # dense ramp series: v(t) = t, 20 hourly buckets
    N, W = 20, 8
    rows = [(1, f"1970-01-01 {h:02d}:00:00", float(h)) for h in range(N)]
    df = spark.createDataFrame(
        rows, "conv_id long, bucket_ts string, v double"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    got = {
        int(r["bucket_ts"].timestamp() // 3600): r
        for r in brown_trend(df, "v", 3600, window_buckets=W).collect()
    }
    v = np.arange(N, dtype=np.float64)
    wts = 2.0 ** -np.arange(W)

    def smooth(x):
        out = np.empty_like(x)
        for t in range(len(x)):
            k = np.arange(min(t + 1, W))
            out[t] = (x[t - k] * wts[k]).sum() / wts[k].sum()
        return out

    s1, s2 = smooth(v), smooth(smooth(v))
    for t in range(N):
        r = got[t]
        assert abs(r["s1"] - s1[t]) < 1e-12
        assert abs(r["s2"] - s2[t]) < 1e-12
        assert abs(r["forecast"] - (3 * s1[t] - 2 * s2[t])) < 1e-12
        # saturated window on a ramp: level reconstructs the ramp value
        if t >= 2 * W:
            assert abs(r["level"] - v[t]) < 1e-9


def test_sax_words_binning_and_zero_variance(spark):
    from go_muse_spark.operators.downsample import sax_words

    rows = (
        # conv 1, one word window: spike at hour 4 among zeros
        [(1, f"1970-01-01 {h:02d}:00:00", 0.0) for h in (0, 1, 2, 3, 5)]
        + [(1, "1970-01-01 04:00:00", 10.0)]
        # conv 2: constant (zero variance) -> all letters at the z=0 bin
        + [(2, f"1970-01-01 {h:02d}:00:00", 7.0) for h in (0, 1, 2)]
    )
    df = spark.createDataFrame(
        rows, "conv_id long, bucket_ts string, v double"
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    got = {
        (r["conv_id"], r["word_epoch"]): r
        for r in sax_words(df, "v", 86400, alphabet=4).collect()
    }
    # conv1: mean=10/6, std=sqrt((100-100/6)/5)=sqrt(50/3)~4.082;
    # zeros z~-0.408 -> 'b'; spike z~2.04 -> 'd'
    assert got[(1, 0)]["word"] == "bbbbdb"
    assert got[(1, 0)]["n"] == 6
    assert got[(2, 0)]["word"] == "ccc"
    with pytest.raises(ValueError):
        sax_words(df, "v", 86400, alphabet=9)
