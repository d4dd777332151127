"""Statistical monitors over the retention tiers.

rolling_zscore flags points that deviate from their own trailing
history — the standard threshold-alert / anomaly-detection primitive a
monitoring stack runs over every series (Prometheus recording rule,
Datadog anomaly monitor). The trailing window EXCLUDES the current
bucket so the point under test never contaminates its own baseline.

series_corr computes the per-series Pearson correlation between two
metric columns over aligned buckets — "does latency move with traffic
for this user?" — via the textbook sums decomposition.

Numerical contract (what makes these DuckDB-oracle-checkable): both
operators aggregate raw sums (n, Σx, Σx², Σxy, …) and apply ONE closed
formula at the end. For integral inputs the sums are exact in double at
any aggregation order, so mean/variance/z/corr are bit-identical in any
IEEE-754 engine evaluating the same expression; for double inputs the
sums agree to an ulp and the contract queries round at 1e-6. The
pooled-sums shape (never per-engine stddev/corr built-ins, whose
internal algorithms differ — Welford vs sums — across engines) is the
same trick the xcorr oracle uses.

Scale shape: rolling_zscore is one exchange on the series key + one
window sort with an O(1)-update RANGE frame (sum/count are subtractable
aggregates — Spark slides them incrementally). series_corr is a single
all-algebraic hash aggregate: partial map-side sums, shuffle
O(series), not O(points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_zscore", "series_corr", "period_delta"]


def rolling_zscore(
    rolled: DataFrame,
    value_col: str,
    window_secs: int,
    bucket_secs: int,
    min_points: int = 8,
    threshold: float = 3.0,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Trailing z-score per point: how many sample standard deviations
    the current bucket's value sits from the mean of the PRECEDING
    `window_secs` of history (current bucket excluded; gaps are absent,
    not zero). Rows with fewer than `min_points` history buckets or
    zero history variance emit NULL z / false flag rather than a
    division artifact.

    Returns (by..., bucket_col, value, n_hist, z, is_anom).
    """
    w = (
        Window.partitionBy(*by)
        .orderBy(F.unix_timestamp(bucket_col))
        .rangeBetween(-window_secs, -bucket_secs)
    )
    v = F.col(value_col).cast("double")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v).over(w)
    ssq = F.sum(v * v).over(w)
    mean = s / n
    # sample variance from pooled sums; guard the n=1 and negative-
    # rounding-residue cases before sqrt
    var = (ssq - s * s / n) / (n - 1)
    sd = F.sqrt(F.when(var > 0, var))
    z = (v - mean) / sd
    return (
        rolled.select(
            *by,
            bucket_col,
            v.alias("value"),
            n.alias("n_hist"),
            z.alias("z"),
        )
        .withColumn("z", F.when(F.col("n_hist") >= min_points, F.col("z")))
        .withColumn(
            "is_anom", F.coalesce(F.abs(F.col("z")) >= threshold, F.lit(False))
        )
    )


def period_delta(
    rolled: DataFrame,
    value_col: str,
    period_secs: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Period-over-period comparison (PromQL's `offset`, the dashboard
    "vs same hour yesterday"): for each tier bucket, the value exactly
    `period_secs` earlier in the same series, via a degenerate RANGE
    frame [-period, -period] — the frame matches at most the single
    bucket at that exact offset (tier buckets are unique per series),
    so max() is just "the" value and NULL means no bucket existed there
    (a gap stays a gap; no implicit fill).

    One exchange on the series key + one window sort; the frame is O(1)
    per row (both bounds move in lockstep). Returns (by..., bucket_col,
    value, prev_value, delta) with delta NULL when there is no
    comparison bucket.
    """
    w = (
        Window.partitionBy(*by)
        .orderBy(F.unix_timestamp(bucket_col))
        .rangeBetween(-int(period_secs), -int(period_secs))
    )
    v = F.col(value_col)
    prev = F.max(v).over(w)
    return rolled.select(
        *by,
        bucket_col,
        v.alias("value"),
        prev.alias("prev_value"),
        (v - prev).alias("delta"),
    )


def series_corr(
    rolled: DataFrame,
    x_col: str,
    y_col: str,
    by: tuple[str, ...] = ("conv_id",),
    min_points: int = 3,
) -> DataFrame:
    """Per-series Pearson correlation of two metrics over their aligned
    buckets, from pooled sums:

        corr = (n*Σxy - Σx*Σy) / sqrt(n*Σxx - Σx²) / sqrt(n*Σyy - Σy²)

    Series with < min_points buckets or zero variance in either metric
    emit NULL (undefined, not 0). Returns (by..., n_points, corr).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = rolled.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n_points")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    corr = F.when(
        (n >= min_points) & (vx > 0) & (vy > 0),
        cov / F.sqrt(vx) / F.sqrt(vy),
    )
    return agg.select(*by, "n_points", corr.alias("corr"))
