"""L2 — dense bucket spine + gap fill (zero / forward-fill / linear).

The reference assumes dense, aligned, equal-length series (group.go:45-51);
real transcript rollups are sparse (silent minutes produce no bucket). We
densify with a relational spine — per-conv or globally-aligned
`sequence(min_bucket, max_bucket, interval)` + explode + left join — then
fill by one of:

  * "zero"   — missing bucket means 0 turns: `coalesce(v, 0)`. Pure
               relational, the semantically-correct fill for counts.
  * "ffill"  — `last(v, ignorenulls)` over an unbounded-preceding window.
               Pure relational (one shuffle on conv_id, sorted by bucket).
  * "linear" — linear interpolation between the nearest non-null
               neighbors, with edge ffill/bfill. Implemented BOTH ways:
               relationally (two windows + lerp — the default, scales as
               plain shuffles) and as a vectorized pandas grouped-map UDF
               (`pandas.Series.interpolate`) for parity with the
               north_rule's pandas/Arrow-UDF path. Both are tested equal.

The spine join is an equi-join on (conv_id, bucket_ts) against data
aggregated on the same keys, so AQE plans it without skew trouble; spine
size is O(convs x buckets), never O(turns).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from go_muse_spark.operators.rollup import TIERS

__all__ = ["bucket_spine", "gap_fill", "gap_fill_pandas", "aligned_vectors"]


def _interval(tier: str) -> str:
    unit, _, _ = TIERS[tier]
    return f"interval 1 {unit}"


def bucket_spine(
    rollup: DataFrame, tier: str, align: str = "conv"
) -> DataFrame:
    """Dense (conv_id, bucket_ts) spine.

    align="conv":   each conv spans its own [min, max] bucket range.
    align="global": every conv spans the global [min, max] — this is what
    enforces the reference's equal-length invariant for search.
    """
    iv = _interval(tier)
    if align == "global":
        bounds = rollup.agg(
            F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
        )
        convs = rollup.select("conv_id").distinct()
        # 1-row bounds: broadcast cross join, then one sequence per conv
        spine = convs.join(F.broadcast(bounds)).select(
            "conv_id",
            F.explode(F.sequence("lo", "hi", F.expr(iv))).alias("bucket_ts"),
        )
        return spine
    per_conv = rollup.groupBy("conv_id").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    return per_conv.select(
        "conv_id",
        F.explode(F.sequence("lo", "hi", F.expr(iv))).alias("bucket_ts"),
    )


def gap_fill(
    rollup: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = ("turn_cnt", "turns_per_sec"),
    mode: str = "zero",
    align: str = "conv",
) -> DataFrame:
    """Densify + fill. Adds boolean `filled` (true where the bucket was
    absent). Output keeps conv_id, bucket_ts, value_cols, filled."""
    spine = bucket_spine(rollup, tier, align=align)
    joined = spine.join(
        rollup.select("conv_id", "bucket_ts", *value_cols),
        ["conv_id", "bucket_ts"],
        "left",
    ).withColumn("filled", F.col(value_cols[0]).isNull())

    if mode == "zero":
        filled = joined.select(
            "conv_id",
            "bucket_ts",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in value_cols],
            "filled",
        )
        return filled

    w_past = (
        Window.partitionBy("conv_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if mode == "ffill":
        return joined.select(
            "conv_id",
            "bucket_ts",
            *[
                F.last(F.col(c), ignorenulls=True).over(w_past).alias(c)
                for c in value_cols
            ],
            "filled",
        )

    if mode == "linear":
        # "nearest following" via a REVERSED running frame: frames ending
        # at UNBOUNDED FOLLOWING make Spark rescan current..end per row
        # (O(n^2) per partition — measured 33s vs 2s at sf0.1); a running
        # [unboundedPreceding, current] frame over the DESC ordering is
        # the same value computed in O(n).
        w_fut_rev = (
            Window.partitionBy("conv_id")
            .orderBy(F.col("bucket_ts").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out_cols = ["conv_id", "bucket_ts"]
        df = joined
        pos = F.col("bucket_ts").cast("double")  # seconds since epoch
        for c in value_cols:
            prev_v = F.last(F.col(c), ignorenulls=True).over(w_past)
            next_v = F.last(F.col(c), ignorenulls=True).over(w_fut_rev)
            prev_t = F.last(
                F.when(F.col(c).isNotNull(), pos), ignorenulls=True
            ).over(w_past)
            next_t = F.last(
                F.when(F.col(c).isNotNull(), pos), ignorenulls=True
            ).over(w_fut_rev)
            lerp = prev_v + (next_v - prev_v) * (pos - prev_t) / (next_t - prev_t)
            df = df.withColumn(
                c + "__f",
                F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
                .when(prev_v.isNull(), next_v.cast("double"))  # leading edge: bfill
                .when(next_v.isNull(), prev_v.cast("double"))  # trailing edge: ffill
                .otherwise(lerp),
            )
            out_cols.append(c + "__f")
        return df.select(
            "conv_id",
            "bucket_ts",
            *[F.col(c + "__f").alias(c) for c in value_cols],
            "filled",
        )

    raise ValueError(f"unknown gap-fill mode {mode!r}")


def gap_fill_pandas(
    rollup: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = ("turn_cnt", "turns_per_sec"),
    mode: str = "linear",
    align: str = "conv",
) -> DataFrame:
    """Gap fill as a vectorized pandas grouped-map UDF (north_rule path).

    Same output contract as gap_fill(); per-group `DataFrame.reindex` over
    the dense bucket index + `interpolate`/`ffill`. One Arrow batch per
    conversation — no per-row Python.
    """
    unit, secs, _ = TIERS[tier]
    freq = pd.Timedelta(seconds=secs)

    bounds = None
    if align == "global":
        row = rollup.agg(
            F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
        ).collect()[0]
        bounds = (row["lo"], row["hi"])

    schema = (
        "conv_id string, bucket_ts timestamp, "
        + ", ".join(f"{c} double" for c in value_cols)
        + ", filled boolean"
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        pdf = pdf.sort_values("bucket_ts").set_index("bucket_ts")
        lo, hi = (bounds if bounds else (pdf.index.min(), pdf.index.max()))
        idx = pd.date_range(lo, hi, freq=freq)
        out = pdf[list(value_cols)].reindex(idx)
        was_missing = out[value_cols[0]].isna()
        if mode == "zero":
            out = out.fillna(0.0)
        elif mode == "ffill":
            out = out.ffill()
        elif mode == "linear":
            out = out.interpolate(method="linear", limit_direction="both")
        else:
            raise ValueError(f"unknown gap-fill mode {mode!r}")
        out = out.astype("float64").reset_index(names="bucket_ts")
        out.insert(0, "conv_id", conv)
        out["filled"] = was_missing.to_numpy()
        return out

    return rollup.select("conv_id", "bucket_ts", *value_cols).groupBy(
        "conv_id"
    ).applyInPandas(fill, schema)


def aligned_vectors(
    filled: DataFrame, value_col: str = "turn_cnt"
) -> DataFrame:
    """Dense per-conv rows -> (conv_id, start_ts, values array<double>).

    collect_list is unordered under shuffle, so we sort (bucket_ts, value)
    structs — array_sort on structs orders by the first field. One row per
    conversation; row size is bounded by the tier's bucket count, which is
    what makes this safe at scale (a year of 1m buckets ~ 525k doubles max;
    tier choice controls it).
    """
    return (
        filled.groupBy("conv_id")
        .agg(
            F.min("bucket_ts").alias("start_ts"),
            F.array_sort(
                F.collect_list(F.struct("bucket_ts", value_col))
            ).alias("pairs"),
        )
        .select(
            "conv_id",
            "start_ts",
            F.transform(
                "pairs", lambda p: p[value_col].cast("double")
            ).alias("values"),
        )
    )
