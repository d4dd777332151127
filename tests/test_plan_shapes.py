"""Plan-shape pins: the shuffle counts PLANS.md claims are tested
facts, not prose. An operator that silently grows an exchange (or a
second scan) at 100 TB is a perf regression even while every value
stays correct — explain() is the cheapest place to catch it.

Counts use the ANALYZED physical plan text of explain(mode=
"formatted") BEFORE adaptive re-planning collapses anything, so the
pin is deterministic (no job runs)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _plan(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _count_op(df, op):
    import re

    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", _plan(df)))


def _hourly(spark, n=60):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("c1", t0 + dt.timedelta(hours=i), (i * 7) % 13) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def test_hampel_single_window_exchange(spark):
    from go_muse_spark.operators.stats import hampel

    out = hampel(_hourly(spark), "v", 25, quant=1)
    assert _count_op(out, "Exchange") == 1  # series-key window only


def test_cov_family_one_exchange(spark):
    from go_muse_spark.operators.arfit import (
        dominant_period,
        effective_sample_size,
    )

    dp = dominant_period(_hourly(spark), "v", 2, 12)
    ess = effective_sample_size(_hourly(spark), "v", 8)
    # window + final per-series aggregate share the series-key
    # partitioning: exactly one exchange each
    assert _count_op(dp, "Exchange") == 1
    assert _count_op(ess, "Exchange") == 1


def test_forecast_backtest_one_exchange(spark):
    from go_muse_spark.operators.stats import forecast_backtest

    out = forecast_backtest(_hourly(spark), "v", 6)
    assert _count_op(out, "Exchange") == 1


def test_rolling_shape_one_exchange(spark):
    from go_muse_spark.operators.stats import rolling_shape

    out = rolling_shape(_hourly(spark), "v", 6 * 3600)
    assert _count_op(out, "Exchange") == 1


def test_layout_audit_single_scan(spark):
    from go_muse_spark.operators.layout import layout_audit

    df = spark.range(100).select(
        (F.col("id") % 10).cast("int").alias("a"),
        (F.col("id") % 7).cast("int").alias("b"),
    )
    out = layout_audit(df, "a", "b", (1, 3, 1, 3), bits=4, n_files=8)
    # both layouts from ONE pass over the input: one exchange (the
    # file-id aggregate), and the input subtree appears once
    assert _count_op(out, "Exchange") == 1
    assert _plan(out).count("(1) Range") == 1


def test_bloom_probe_side_never_shuffles(spark):
    from go_muse_spark.functions.bloom import bloom_build, bloom_semi_filter

    build = spark.createDataFrame([("a",), ("b",)], "k string")
    probe = spark.createDataFrame([("a",), ("z",)], "k string")
    bm = bloom_build(build, "k", k=3, m_bits=128)
    out = bloom_semi_filter(probe, bm, "k", 3, 128)
    plan = _plan(out)
    # the bitmap reaches the probe via broadcast; any Exchange in the
    # plan belongs to the tiny build-side aggregate, and the join
    # itself is a broadcast nested loop
    assert "BroadcastExchange" in plan
    assert _count_op(out, "BroadcastNestedLoopJoin") == 1


def test_snapshot_diff_two_exchanges_full_outer(spark):
    from go_muse_spark.sources.store import snapshot_diff

    old = spark.createDataFrame([("a", 1, 1.0)], "k string, b int, v double")
    new = spark.createDataFrame([("a", 1, 2.0)], "k string, b int, v double")
    out = snapshot_diff(old, new, ("k", "b"), ("v",))
    assert _count_op(out, "SortMergeJoin") == 1
    assert _count_op(out, "Exchange") == 2  # one per side, key-aligned
