"""Round-5 sketch ladders: KMV distinct/Jaccard, DDSketch-style
log-bucketed quantiles, and OHLC bars.

The load-bearing properties each test pins:
  - KMV merge is LOSSLESS: k-min of unions == k-min over raw, so a
    1m->1h->1d ladder never rescans raw and never drifts.
  - KMV is EXACT below k and within the published error above it.
  - KMV Jaccard estimates set overlap (the thing HLL cannot do).
  - log-hist quantiles honor the relative-error bound 2^-(mb+1) over
    a range no fixed-width histogram could cover, and SUM-merge
    losslessly.
  - OHLC first/last use the (t_us, order_cols) tie rule exactly.
"""

import math

import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.cardinality import (
    KMV_P,
    kmv_estimate,
    kmv_jaccard,
    kmv_reagg,
    kmv_sketch_rollup,
)
from go_muse_spark.operators.olap import ohlc_bars
from go_muse_spark.operators.quantsketch import (
    log_hist_reagg,
    log_hist_rollup,
    log_hist_quantile,
)

T0 = 1704067200  # 2024-01-01 00:00:00 UTC


@pytest.fixture(scope="module")
def keyed(spark):
    # 30k events over 6 hours; ~8k distinct keys per hour via a
    # multiplicative scramble, heavy cross-hour overlap
    return (
        spark.range(30_000)
        .select(
            F.timestamp_seconds(
                F.lit(T0) + (F.col("id") % 6) * 3600 + F.col("id") % 60
            ).alias("ts"),
            ((F.col("id") * 2654435761) % 10_007).alias("user_id"),
        )
        .cache()
    )


def test_kmv_merge_lossless(spark, keyed):
    """k-min of the union of hourly k-min sets == k-min built from a
    single 6h bucket directly over raw — min is associative."""
    fine = kmv_sketch_rollup(keyed, "user_id", 3600, k=128)
    merged = kmv_reagg(fine, 6 * 3600, k=128).collect()[0]["kmv"]
    direct = kmv_sketch_rollup(keyed, "user_id", 6 * 3600, k=128)
    assert merged == direct.collect()[0]["kmv"]


def test_kmv_exact_below_k_and_bounded_above(spark, keyed):
    # below k: the sketch IS the distinct hash set -> exact count
    small = keyed.limit(40)
    est = kmv_estimate(
        kmv_sketch_rollup(small, "user_id", 6 * 3600, k=128), k=128
    ).collect()[0]
    truth = small.select("user_id").distinct().count()
    assert est["n_est"] == truth == est["n_distinct"]
    # above k: published KMV relative std err ~ 1/sqrt(k-2)
    big = kmv_estimate(
        kmv_sketch_rollup(keyed, "user_id", 6 * 3600, k=256), k=256
    ).collect()[0]
    rse = 1.0 / math.sqrt(256 - 2)
    assert abs(big["n_est"] - big["n_distinct"]) < 5 * rse * big["n_distinct"]


def test_kmv_hash_range(spark, keyed):
    hs = kmv_sketch_rollup(keyed, "user_id", 6 * 3600, k=64).collect()[0][
        "kmv"
    ]
    assert all(0 <= h < KMV_P for h in hs)
    assert hs == sorted(hs) and len(hs) == 64


def test_kmv_jaccard_known_overlap(spark):
    # A = {0..999}, B = {500..1499}: true Jaccard = 500/1500 = 1/3
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0)).alias("ts"),
        F.col("id").alias("user_id"),
    )
    k = 256
    a = kmv_sketch_rollup(mk(0, 1000), "user_id", 3600, k=k)
    b = kmv_sketch_rollup(mk(500, 1500), "user_id", 3600, k=k)
    row = kmv_jaccard(
        a.select("bucket_epoch", "kmv"),
        b.select("bucket_epoch", "kmv"),
        on=["bucket_epoch"],
        k=k,
    ).collect()[0]
    assert row["denom"] == k
    assert abs(row["jaccard"] - 1 / 3) < 4 / math.sqrt(k)


def test_ohlc_first_last_tie_rule(spark):
    # two rows share the opening timestamp; order_cols=(seq,) must pick
    # seq=0 for open and the later-but-equal-ts seq=3 for close
    rows = [
        (T0, 0, 50),
        (T0, 1, 10),  # same ts as open; loses on seq
        (T0 + 30, 2, 99),
        (T0 + 59, 3, 7),
        (T0 + 59, 4, 70),  # same ts as close; WINS on seq... no: max_by
    ]
    df = spark.createDataFrame(rows, "t long, seq long, v long").select(
        F.timestamp_seconds("t").alias("ts"), "seq", "v"
    )
    got = ohlc_bars(df, "v", 60, order_cols=("seq",)).collect()[0]
    assert got["o"] == 50.0  # (T0, seq0) < (T0, seq1)
    assert got["c"] == 70.0  # (T0+59, seq4) > (T0+59, seq3)
    assert got["h"] == 99.0 and got["l"] == 7.0 and got["n"] == 5
    assert got["vsum"] == 50 + 10 + 99 + 7 + 70


def test_ohlc_bucketing_and_dims(spark):
    df = spark.createDataFrame(
        [(T0 + i * 45, "g" if i % 2 else "h", float(i)) for i in range(8)],
        "t long, g string, v double",
    ).select(F.timestamp_seconds("t").alias("ts"), "g", "v")
    out = {
        (r["bucket_epoch"], r["g"]): r
        for r in ohlc_bars(df, "v", 120, dims=("g",)).collect()
    }
    # i=0,1,2 fall in [T0, T0+120): h-bucket holds i=0,2; g holds i=1
    r = out[(T0, "h")]
    assert (r["o"], r["c"], r["n"]) == (0.0, 2.0, 2)


def test_log_hist_relative_error_bound(spark):
    # heavy-tailed values spanning 1e-3 .. ~3e3 (six decades)
    mb = 3
    df = spark.range(20_000).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") % 3600).alias("ts"),
        (F.exp((F.col("id") % 1500).cast("double") / 100.0) / 1000.0).alias(
            "v"
        ),
    )
    qs = (0.5, 0.95, 0.99)
    got = {
        r["q"]: r["qvalue_u"] / 1e6
        for r in log_hist_quantile(
            log_hist_rollup(df, "v", 3600, mantissa_bits=mb), qs
        ).collect()
    }
    exact = df.select(
        F.expr(f"percentile(v, array{qs})").alias("p")
    ).collect()[0]["p"]
    for q, ex in zip(qs, exact):
        # bucket-midpoint answer: relative error <= 2^-(mb+1) vs the
        # true sample quantile (plus micro-unit rounding slack)
        assert abs(got[q] - ex) / ex <= 2 ** -(mb + 1) + 1e-6, (q, got[q], ex)


def test_log_hist_merge_lossless(spark):
    df = spark.range(5_000).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") % 7200).alias("ts"),
        ((F.col("id") * 37) % 1000 + 1).cast("double").alias("v"),
    )
    fine = log_hist_rollup(df, "v", 3600)
    merged = {
        (r["bin_lo"], r["shift"]): r["n"]
        for r in log_hist_reagg(fine, 86400).collect()
    }
    direct = {
        (r["bin_lo"], r["shift"]): r["n"]
        for r in log_hist_rollup(df, "v", 86400).collect()
    }
    assert merged == direct
