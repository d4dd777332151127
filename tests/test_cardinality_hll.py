"""Stored-sketch distinct ladder: union losslessness within HLL error
bounds at cardinalities where sparse mode can't mask mistakes, ladder
vs direct consistency, and the algebraic-partial-aggregate plan."""

import math

import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.cardinality import (
    hll_sketch_reagg,
    hll_sketch_rollup,
)

LGK = 12
RSD = 1.04 / math.sqrt(2**LGK)  # published HLL relative std dev


@pytest.fixture(scope="module")
def big(spark):
    # 200k events over 2 hours, ~60k distinct keys per hour with
    # overlap — dense-mode HLL territory
    df = spark.range(200_000).select(
        (F.col("id") % 2 * 3600).cast("long").alias("off"),
        ((F.col("id") * 2654435761) % 90_001).alias("user_id"),
    )
    return df.select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("off")).alias("ts"),
        "user_id",
        F.lit("e").alias("event_type"),
    ).cache()


def test_hourly_sketches_within_bound(spark, big):
    got = {
        r["bucket_epoch"]: r
        for r in hll_sketch_rollup(big, "user_id", 3600)
        .select(
            "bucket_epoch",
            "n_events",
            F.hll_sketch_estimate("sketch").alias("est"),
        )
        .collect()
    }
    exact = {
        r["bucket_epoch"]: r["n"]
        for r in big.groupBy(
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias(
                "bucket_epoch"
            )
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert len(got) == 2
    for b, r in got.items():
        assert abs(r["est"] - exact[b]) <= 4 * RSD * exact[b]


def test_ladder_matches_direct_within_bound(spark, big):
    hourly = hll_sketch_rollup(big, "user_id", 3600)
    ladder = hll_sketch_reagg(hourly, 86400).collect()[0]
    exact = big.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(ladder["n_approx"] - exact) <= 4 * RSD * exact
    assert ladder["n_events"] == 200_000
    direct = (
        hll_sketch_rollup(big, "user_id", 86400)
        .select(F.hll_sketch_estimate("sketch").alias("est"))
        .collect()[0]["est"]
    )
    # ladder and direct may differ (sparse->dense promotion) but both
    # sit inside the bound, so they sit within 8*rsd of each other
    assert abs(ladder["n_approx"] - direct) <= 8 * RSD * exact


def test_ladder_keeps_climbing(spark, big):
    # 1m -> 1h -> 1d unions equal the 1m -> 1d single union exactly:
    # union is associative on the SAME blobs (unlike re-sketching)
    minutely = hll_sketch_rollup(big, "user_id", 60)
    via_hour = hll_sketch_reagg(
        hll_sketch_reagg(minutely, 3600), 86400
    ).collect()[0]["n_approx"]
    direct_day = hll_sketch_reagg(minutely, 86400).collect()[0]["n_approx"]
    assert via_hour == direct_day


def test_sketch_rollup_is_partial_aggregate(spark, big):
    plan = hll_sketch_rollup(big, "user_id", 3600)._jdf.queryExecution().executedPlan().toString()
    # two HashAggregate levels around one exchange: map-side partial
    # sketch merge, not a raw-row shuffle
    assert plan.count("HashAggregate") >= 2
