"""Multi-dimensional label aggregation (SQL ROLLUP / CUBE).

The reference groups by one label subset at a time (indexLabelValues,
group.go:76-104); a dashboard over the same data wants every prefix of
the label hierarchy at once — per (type, day), per type, and the grand
total — without three scans. GROUPING SETS computes all of them in one
pass: Catalyst expands the sets, the partial aggregate combines
map-side, and one exchange produces every grouping level. grouping_id
disambiguates "NULL because rolled up" from "NULL in the data", which
is what makes the result joinable/oracle-checkable.

Scale shape: one scan + one shuffle regardless of how many levels the
hierarchy has (vs one scan per level done naively); output is the union
of the per-level cardinalities. Spark's Expand adds one row per
grouping set per input row pre-aggregation — for deep hierarchies
prefer rollup (d+1 sets) over cube (2^d).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dimensional_rollup",
    "value_histogram",
    "histogram_quantile",
    "ohlc_bars",
    "trimmed_mean",
    "winsorized_mean",
]


def dimensional_rollup(
    df: DataFrame,
    dims: tuple[str, ...],
    aggs: dict[str, Column],
    cube: bool = False,
) -> DataFrame:
    """Aggregate at every level of the dim hierarchy (ROLLUP: prefixes
    left-to-right) or every dim subset (CUBE). Output = dims...,
    grp (grouping_id bit vector, leftmost dim = MSB — the standard SQL
    convention both Spark and DuckDB implement), then one column per
    aggs entry. Rolled-up levels carry NULL in the suppressed dims."""
    g = df.cube(*dims) if cube else df.rollup(*dims)
    return g.agg(
        F.grouping_id().cast("long").alias("grp"),
        *[c.alias(name) for name, c in aggs.items()],
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
    dims: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-width histogram of `value_col` per dims...: bin_idx =
    floor((v - lo) / width) clamped to [0, n_bins-1] (under/overflow
    land in the edge bins, so every NULL-free finite row is counted
    exactly once; NULL and NaN rows are excluded up front — NULL would
    otherwise be silently clamped into bin 0 by greatest()'s
    NULL-skipping, and NaN bins diverge across engines). One hash
    aggregate with map-side partials — shuffle O(dims x bins).
    The bin function is a single float divide + floor on identical
    operands, so bin assignment is engine-independent except exactly ON
    a boundary; choose lo/width representable in binary (0.5, 0.25, …)
    when oracle-matching matters.

    Returns (dims..., bin_idx, bin_lo, n)."""
    if n_bins < 1 or width <= 0:
        raise ValueError("need n_bins >= 1 and width > 0")
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(width)))
    idx = F.least(
        F.greatest(raw, F.lit(0)), F.lit(int(n_bins) - 1)
    ).cast("int")
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*dims, idx.alias("bin_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "bin_lo",
            F.lit(float(lo)) + F.col("bin_idx").cast("double") * F.lit(float(width)),
        )
        .select(*dims, "bin_idx", "bin_lo", "n")
    )


def histogram_quantile(
    hist: DataFrame,
    qs: tuple[float, ...],
    lo: float,
    width: float,
    dims: tuple[str, ...],
    count_col: str = "n",
    bin_col: str = "bin_idx",
) -> DataFrame:
    """Prometheus-style `histogram_quantile`: estimate quantiles from a
    pre-aggregated fixed-width histogram (the output of
    value_histogram) by linear interpolation inside the target bin —
    the only way to get a percentile when all that survived the rollup
    is bucket counts.

    For quantile q: target = q * total; the target bin is the unique
    row with cum_before < target <= cum (cum strictly increases across
    present bins since n >= 1), and

        value = bin_lo + width * (target - cum_before) / n_bin

    Determinism: total/cum/n are exact int64; q and width are literals;
    the one formula above is evaluated on identical operands in any
    IEEE engine (an oracle must spell it with the same association:
    bin_lo + width * (target - prev) / n).

    Scale shape: the histogram is already tiny (O(dims x bins)), so
    this is one exchange on dims + a cumulative window + a broadcastable
    explode of the quantile literals — negligible next to the scan that
    built the histogram. Returns (dims..., q, qvalue).
    """
    if not qs:
        raise ValueError("need at least one quantile")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1]: {qs}")
    w_cum = (
        Window.partitionBy(*dims)
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*dims)
    base = hist.select(
        *dims,
        bin_col,
        F.col(count_col).alias("__n"),
        F.sum(count_col).over(w_cum).alias("__cum"),
        F.sum(count_col).over(w_all).alias("__tot"),
    )
    e = base.select(
        "*",
        F.explode(
            F.array(*[F.lit(float(q)) for q in qs])
        ).alias("q"),
    )
    target = F.col("q") * F.col("__tot")
    prev = F.col("__cum") - F.col("__n")
    qvalue = (
        F.lit(float(lo))
        + F.col(bin_col).cast("double") * F.lit(float(width))
        + F.lit(float(width)) * (target - prev) / F.col("__n")
    )
    return e.filter((F.col("__cum") >= target) & (prev < target)).select(
        *dims, "q", qvalue.alias("qvalue")
    )


def ohlc_bars(
    events: DataFrame,
    value_col: str,
    bucket_secs: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Open/High/Low/Close candlestick bars per (bucket, dims...) —
    the downsample a monitoring or market dashboard draws when the
    1m tier is still too dense: first/last value by time plus the
    bucket extremes, in ONE aggregate.

    The reference keeps only raw series (muse.go works on full
    vectors); bars are the classic OLAP downsample the rollup tiers
    enable. first/last are expressed as min_by/max_by over the
    (epoch_us, order_cols...) struct — an ALGEBRAIC aggregate (partial
    merge keeps the arg-min pair), so the plan is scan -> partial agg
    -> ONE exchange on (bucket, dims) -> final agg: no window sort, no
    second shuffle, same shape as every other tier rollup here. Ties
    at the same timestamp are broken by order_cols (deterministic
    cross-engine; DuckDB oracle uses arg_min/arg_max over the same
    key list).

    Returns (bucket_epoch, dims..., o, h, l, c, n, vsum) with values
    as-is (callers round to micro-units for oracle hashing).
    """
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    key = F.struct(
        t_us.alias("t_us"), *[F.col(c) for c in order_cols]
    )
    v = F.col(value_col).cast("double")
    bucket = (
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        - F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        % F.lit(int(bucket_secs))
    ).alias("bucket_epoch")
    return events.groupBy(bucket, *dims).agg(
        F.min_by(v, key).alias("o"),
        F.max(v).alias("h"),
        F.min(v).alias("l"),
        F.max_by(v, key).alias("c"),
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("vsum"),
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    dims: tuple[str, ...],
    trim_frac: float = 0.1,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Robust per-group mean with the top and bottom `trim_frac` of
    rows removed — the "ignore the outliers" aggregate dashboards want
    when one runaway conversation would otherwise drag the hourly mean
    (cf. a 10% trimmed mean / winsorized latency panel).

    Semantics: within each dims group, k = floor(n · trim_frac) rows
    are dropped from EACH end under the total order (value,
    order_cols...) — the tie-break makes the kept multiset, and
    therefore the sums, deterministic on both engines. The mean is one
    double division over the integer-exact kept sum, so an oracle
    spelling the same two row_number passes agrees bit-for-bit.

    Scale shape: ONE exchange on dims; the ascending and descending
    row_numbers and the group count all share that single partitioning
    (three window functions, one sort each way), then a
    map-side-combined aggregate on the same key — no second shuffle.
    Skewed hot groups split under AQE like any windowed key.

    trim_frac must sit in [0, 0.5): floor(n·f) < n/2 then guarantees
    every group keeps at least one row — at 0.5+ whole groups would
    silently vanish from the output.

    Returns (dims..., n, n_trim, n_kept, kept_sum, trimmed_mean).
    """
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(
            f"trim_frac must be in [0, 0.5), got {trim_frac}"
        )
    v = F.col(value_col)
    tie = [F.col(c) for c in order_cols]
    wa = Window.partitionBy(*dims).orderBy(v.asc(), *tie)
    wd = Window.partitionBy(*dims).orderBy(
        v.desc(), *[c.desc() for c in tie]
    )
    wn = Window.partitionBy(*dims)
    r = df.select(
        *dims,
        v.alias("__v"),
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    ).withColumn(
        "__k", F.floor(F.col("__n") * F.lit(float(trim_frac))).cast("long")
    )
    kept = r.where((F.col("__ra") > F.col("__k")) & (F.col("__rd") > F.col("__k")))
    agg = kept.groupBy(*dims).agg(
        F.max("__n").alias("n"),
        F.max("__k").alias("n_trim"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("__v").alias("kept_sum"),
    )
    return agg.select(
        *dims,
        "n",
        "n_trim",
        "n_kept",
        "kept_sum",
        (F.col("kept_sum").cast("double") / F.col("n_kept").cast("double")).alias(
            "trimmed_mean"
        ),
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    dims: tuple[str, ...],
    wins_frac: float = 0.1,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Winsorized per-group mean: the robust sibling of trimmed_mean
    that CLAMPS instead of drops — the k = floor(n · wins_frac)
    smallest rows are replaced by the (k+1)-th smallest value and the
    k largest by the (k+1)-th largest, keeping n constant (the form
    most latency SLO panels actually specify, because the sample size
    in the denominator stays the reported event count).

    Same determinism contract as trimmed_mean: the total order is
    (value, order_cols...), all counts and the clamped sum are exact
    integers — winsorized_sum = kept_sum + k·lo_cap + k·hi_cap where
    lo_cap/hi_cap are the boundary order statistics — and the mean is
    one double division, so an oracle spelling the same two
    row_number passes agrees bit-for-bit.

    Scale shape: identical to trimmed_mean — ONE exchange on dims
    shared by both row_number windows and the count, then a map-side
    combined aggregate on the same key. wins_frac in [0, 0.5) so the
    boundary statistics always exist (k+1 <= n - k).

    Returns (dims..., n, n_wins, lo_cap, hi_cap, wins_sum, wins_mean).
    """
    if not 0.0 <= wins_frac < 0.5:
        raise ValueError(f"wins_frac must be in [0, 0.5), got {wins_frac}")
    v = F.col(value_col)
    tie = [F.col(c) for c in order_cols]
    wa = Window.partitionBy(*dims).orderBy(v.asc(), *tie)
    wd = Window.partitionBy(*dims).orderBy(
        v.desc(), *[c.desc() for c in tie]
    )
    wn = Window.partitionBy(*dims)
    r = df.select(
        *dims,
        v.alias("__v"),
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    ).withColumn(
        "__k", F.floor(F.col("__n") * F.lit(float(wins_frac))).cast("long")
    )
    agg = r.groupBy(*dims).agg(
        F.max("__n").alias("n"),
        F.max("__k").alias("n_wins"),
        F.max(
            F.when(F.col("__ra") == F.col("__k") + 1, F.col("__v"))
        ).alias("lo_cap"),
        F.max(
            F.when(F.col("__rd") == F.col("__k") + 1, F.col("__v"))
        ).alias("hi_cap"),
        F.sum(
            F.when(
                (F.col("__ra") > F.col("__k")) & (F.col("__rd") > F.col("__k")),
                F.col("__v"),
            ).otherwise(F.lit(0))
        ).alias("__kept_sum"),
    )
    wins_sum = (
        F.col("__kept_sum")
        + F.col("n_wins") * F.col("lo_cap")
        + F.col("n_wins") * F.col("hi_cap")
    )
    return agg.select(
        *dims,
        "n",
        "n_wins",
        "lo_cap",
        "hi_cap",
        wins_sum.alias("wins_sum"),
        (wins_sum.cast("double") / F.col("n").cast("double")).alias(
            "wins_mean"
        ),
    )
