"""Unit tests for the Count-Min sketch ladder, priority sampling, and
classical seasonal-trend decomposition."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_muse_spark.functions.text import P, minhash_coeffs
from go_muse_spark.operators.freqsketch import (
    cm_estimate,
    cm_sketch_reagg,
    cm_sketch_rollup,
)
from go_muse_spark.operators.sampling import priority_sample
from go_muse_spark.operators.stats import classical_decompose

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n_users=40, per_user=None):
    rows = []
    for u in range(n_users):
        k = per_user(u) if per_user else (u % 7 + 1)
        for i in range(k):
            rows.append((T0 + dt.timedelta(hours=(u * 3 + i) % 30), u))
    return spark.createDataFrame(rows, "ts timestamp, user_id long")


def test_cm_estimate_never_undercounts(spark):
    ev = _events(spark)
    sk = cm_sketch_rollup(ev, "user_id % 1000000007", 86400, d=3, w=8)
    exact = ev.groupBy(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 86400).alias(
            "bucket_epoch"
        ),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    est = cm_estimate(
        sk, exact, "user_id % 1000000007", d=3, w=8
    ).collect()
    assert len(est) > 0
    # one-sided error: the sketch can only OVERcount, and with 40 users
    # in 8 cells it must actually collide somewhere
    assert all(r["cm_est"] >= r["n_exact"] for r in est)
    assert any(r["cm_est"] > r["n_exact"] for r in est)


def test_cm_exact_when_no_collisions(spark):
    # w >> items: every user owns its cells in every row -> est == exact
    ev = _events(spark, n_users=10)
    sk = cm_sketch_rollup(ev, "user_id % 1000000007", 86400, d=4, w=4096)
    exact = ev.groupBy(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 86400).alias(
            "bucket_epoch"
        ),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    est = cm_estimate(
        sk, exact, "user_id % 1000000007", d=4, w=4096
    ).collect()
    assert all(r["cm_est"] == r["n_exact"] for r in est)


def test_cm_estimate_whole_span_premerges_buckets(spark):
    # items WITHOUT bucket_epoch + a multi-bucket sketch: the estimate
    # must be the whole-span count (buckets sum-merged before probing),
    # never min-over-buckets. w >> items -> collision-free -> exact.
    ev = _events(spark, n_users=10)
    sk = cm_sketch_rollup(ev, "user_id % 1000000007", 86400, d=4, w=4096)
    assert sk.select("bucket_epoch").distinct().count() > 1
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cm_estimate(
        sk, exact, "user_id % 1000000007", d=4, w=4096
    ).collect()
    assert len(est) == 10
    assert all(r["cm_est"] == r["n_exact"] for r in est)


def test_cm_ladder_merge_equals_direct_build(spark):
    # linearity: sum-merging hourly sketches to a day == building the
    # day sketch from raw events
    ev = _events(spark)
    ladder = cm_sketch_reagg(
        cm_sketch_rollup(ev, "user_id % 1000000007", 3600, d=3, w=16),
        86400,
    )
    direct = cm_sketch_rollup(ev, "user_id % 1000000007", 86400, d=3, w=16)
    a = {(r[0], r[1], r[2]): r[3] for r in ladder.collect()}
    b = {(r[0], r[1], r[2]): r[3] for r in direct.collect()}
    assert a == b


def test_cm_cells_match_python_reference(spark):
    # the sketch's cell arithmetic is the shared mod-P hash family
    ev = spark.createDataFrame([(T0, 12345)], "ts timestamp, user_id long")
    sk = cm_sketch_rollup(ev, "user_id % 1000000007", 86400, d=3, w=64)
    got = {(r["j"], r["cell"]) for r in sk.collect()}
    want = {
        (j, ((a * 12345 + b) % P) % 64)
        for j, (a, b) in enumerate(minhash_coeffs(3))
    }
    assert got == want


def _docs(spark, n=60):
    rows = [
        (i, f"doc number {i} " + "pad " * (i % 9), "en" if i % 2 else "fr",
         10 + (i * 37) % 400)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def test_priority_sample_grouped_k_and_determinism(spark):
    docs = _docs(spark)
    out = priority_sample(
        docs, "cast(n_chars AS double)", 5, by=("lang",)
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "fr"}
    for rs in by_lang.values():
        assert sorted(r["rk"] for r in rs) == [1, 2, 3, 4, 5]
        # ranked by priority descending
        ordered = sorted(rs, key=lambda r: r["rk"])
        ps = [r["priority"] for r in ordered]
        assert ps == sorted(ps, reverse=True)
    # partitioning-independent: same selection after a repartition
    again = priority_sample(
        docs.repartition(7), "cast(n_chars AS double)", 5, by=("lang",)
    ).collect()
    assert {(r["lang"], r["doc_id"], r["rk"]) for r in again} == {
        (r["lang"], r["doc_id"], r["rk"]) for r in out
    }


def test_priority_sample_global_topk_and_weight_scaling(spark):
    docs = _docs(spark)
    out = priority_sample(docs, "cast(n_chars AS double)", 8).collect()
    assert len(out) == 8 and sorted(r["rk"] for r in out) == list(range(1, 9))
    # priorities are linear in the weight -> scaling all weights by a
    # constant preserves the selected set and order exactly
    scaled = priority_sample(
        docs, "cast(n_chars AS double) * 1000.0", 8
    ).collect()
    assert [r["doc_id"] for r in sorted(scaled, key=lambda r: r["rk"])] == [
        r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])
    ]
    with pytest.raises(ValueError):
        priority_sample(docs, "1.0", 0)


def test_priority_sample_favors_heavy_weights(spark):
    # two identical text-populations, one with 100x the weight: the
    # heavy stratum must dominate the global top-k
    rows = [(i, f"unique text {i}", 1.0 if i < 500 else 100.0)
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, w double")
    out = priority_sample(docs, "w", 50, order_col="doc_id").collect()
    heavy = sum(1 for r in out if r["doc_id"] >= 500)
    assert heavy > 40


def _dense_hourly(spark, n_hours=24 * 14):
    # trend + strong 24h seasonality, integer-valued
    rows = []
    for h in range(n_hours):
        y = int(50 + h // 12 + 30 * np.sin(2 * np.pi * (h % 24) / 24))
        rows.append(("u1", T0 + dt.timedelta(hours=h), y))
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, turn_cnt long"
    )


def test_classical_decompose_identity_and_centering(spark):
    dense = _dense_hourly(spark)
    out = classical_decompose(dense, "turn_cnt", 24, 3600).collect()
    inner = [r for r in out if r["trend_mu"] is not None]
    assert len(inner) == len(out) - 24  # 12 edge rows each end
    # exact additive identity in micro-units
    for r in inner:
        assert (
            r["y"] * 1_000_000
            == r["trend_mu"] + r["seasonal_mu"] + r["resid_mu"]
        )
    # seasonal component centered: sums to ~0 over one period
    # (<= 1 micro-unit rounding per phase)
    phases = {}
    for r in inner:
        phases.setdefault(r["bucket_ts"].hour, r["seasonal_mu"])
    assert len(phases) == 24
    assert abs(sum(phases.values())) <= 24


def test_classical_decompose_recovers_components(spark):
    dense = _dense_hourly(spark)
    out = classical_decompose(dense, "turn_cnt", 24, 3600).collect()
    inner = [r for r in out if r["trend_mu"] is not None]
    # the 25h moving average of trend+seasonal leaves trend (seasonal
    # averages out over a full period); check slope ~ 1/12 per hour
    ts = sorted(inner, key=lambda r: r["bucket_ts"])
    t0, t1 = ts[0]["trend_mu"], ts[-1]["trend_mu"]
    hours = (ts[-1]["bucket_ts"] - ts[0]["bucket_ts"]).total_seconds() / 3600
    slope = (t1 - t0) / 1e6 / hours
    assert 0.04 < slope < 0.13
    # seasonal amplitude close to the injected 30 (quantized sine)
    smax = max(r["seasonal_mu"] for r in inner) / 1e6
    smin = min(r["seasonal_mu"] for r in inner) / 1e6
    assert 25 < smax < 33 and -33 < smin < -25
    # residuals small: everything is explained by trend+seasonal
    assert max(abs(r["resid_mu"]) for r in inner) / 1e6 < 6


def test_classical_decompose_validates_period(spark):
    dense = _dense_hourly(spark, n_hours=30)
    with pytest.raises(ValueError):
        classical_decompose(dense, "turn_cnt", 1, 3600)


def test_seasonal_forecast_recovers_planted_pattern(spark):
    """A pure trend+seasonal integer series forecasts its exact future:
    slope recovered, per-phase shape repeated, h=period wraps to the
    same phase as h=0."""
    import datetime as dt
    from go_muse_spark.operators.stats import seasonal_forecast

    t0 = dt.datetime(2024, 1, 1)
    period, days = 24, 6
    season = [(ph % 12) * 3 for ph in range(period)]  # integer shape
    rows = [
        (
            "c1",
            t0 + dt.timedelta(hours=i),
            float(100 + 2 * i + season[i % period]),
        )
        for i in range(days * period)
    ]
    dense = spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, turn_cnt double"
    )
    out = (
        seasonal_forecast(dense, "turn_cnt", period, 3600, horizons=48)
        .orderBy("h")
        .collect()
    )
    assert len(out) == 48
    n = days * period
    for r in out:
        h = r["h"]
        i_future = n - 1 + h
        expected = 100 + 2 * i_future + season[i_future % period]
        got = r["forecast_mu"] / 1e6
        # classical decomposition on a pure trend+seasonal series is
        # exact up to the micro-unit roundings it carries
        assert abs(got - expected) < 1e-3, (h, got, expected)
        assert r["bucket_ts"] == t0 + dt.timedelta(hours=i_future)


def test_seasonal_forecast_validates_horizons(spark):
    import datetime as dt
    from go_muse_spark.operators.stats import seasonal_forecast

    dense = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "conv_id string, bucket_ts timestamp, turn_cnt double",
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        seasonal_forecast(dense, "turn_cnt", 24, 3600, horizons=0)
