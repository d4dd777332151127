"""Visualization / sketch downsampling over the retention tiers.

m4_downsample implements the M4 aggregation (Jugel, Jerzak, Hackenbroich,
Markl: "M4: A Visualization-Oriented Time Series Data Aggregation",
VLDB 2014): for each series and each coarse output bucket ("pixel
column"), keep exactly the four extremum tuples — first, last, min and
max of (ts, value) — which is sufficient for error-free line rendering
at that horizontal resolution. This is the standard render-path
downsample in time-series stores (Grafana/Influx/Timescale all ship a
variant); the reference engine has no render path, so this extends the
tier model the way a dashboard in front of it would need.

ewma is the trailing exponentially-weighted moving average over a tier,
the sliding complement to moving_aggregate's uniform window: each
existing bucket k steps back weighs 2^-k (dyadic decay => every weight,
product and partial sum is exact in IEEE double for integer inputs, so
the result is bit-reproducible across engines), truncated at
window_buckets. Gap-aware like a stream processor: absent buckets
contribute nothing and the normalizer only counts buckets present.

top_series_per_bucket keeps the N heaviest series per time bucket
(heavy hitters per window) — one ranked window, deterministic tiebreak.

All three are single-exchange relational plans:
- m4_downsample: one hash aggregate on (series, out_bucket); all
  aggregates are algebraic min/max over structs, so Catalyst emits a
  map-side partial aggregate and shuffle volume is O(series x pixels),
  not O(points). At 100 TB the input tier is already partitioned by
  series key; AQE coalesces the tiny output.
- ewma: a W-way map-side explode (W = window_buckets, small constant)
  followed by one hash aggregate on (series, target_bucket) — shuffle
  O(W x points) with partial aggregation, no window sort at all, and
  the existence filter (bool_or of the k=0 term) drops phantom targets
  without a join back to the input.
- top_series_per_bucket: one exchange on the bucket, one sort, rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "m4_downsample",
    "ewma",
    "lttb_downsample",
    "top_series_per_bucket",
    "brown_trend",
    "sax_words",
]


def m4_downsample(
    rolled: DataFrame,
    value_col: str,
    out_secs: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """M4 aggregation: per (series, out_secs pixel bucket), the (ts, v)
    tuples of the first, last, minimum and maximum points.

    Tie rules (the part an oracle must replay exactly): value ties on
    the minimum resolve to the EARLIEST ts, value ties on the maximum
    to the LATEST ts — both fall out of lexicographic struct ordering,
    so all four argmin/argmax aggregates stay algebraic (min/max over
    struct), keeping the map-side partial aggregate. first/last need no
    tiebreak: (series, bucket_ts) is unique in a tier table.

    Returns (by..., px_ts, n_points, first_ts, first_v, last_ts,
    last_v, min_ts, min_v, max_ts, max_v).
    """
    ts = F.unix_timestamp(F.col(bucket_col))
    px = F.timestamp_seconds(ts - ts % F.lit(out_secs))
    v = F.col(value_col)
    t = F.col(bucket_col)
    return (
        rolled.groupBy(*by, px.alias("px_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(F.struct(t.alias("t"), v.alias("v"))).alias("__first"),
            F.max(F.struct(t.alias("t"), v.alias("v"))).alias("__last"),
            F.min(F.struct(v.alias("v"), t.alias("t"))).alias("__min"),
            F.max(F.struct(v.alias("v"), t.alias("t"))).alias("__max"),
        )
        .select(
            *by,
            "px_ts",
            "n_points",
            F.col("__first.t").alias("first_ts"),
            F.col("__first.v").alias("first_v"),
            F.col("__last.t").alias("last_ts"),
            F.col("__last.v").alias("last_v"),
            F.col("__min.t").alias("min_ts"),
            F.col("__min.v").alias("min_v"),
            F.col("__max.t").alias("max_ts"),
            F.col("__max.v").alias("max_v"),
        )
    )


def ewma(
    rolled: DataFrame,
    value_col: str,
    bucket_secs: int,
    window_buckets: int = 8,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Trailing EWMA with dyadic decay over a tier.

    For each existing bucket t:
        ewma(t) = sum_{k=0..W-1, bucket t-k exists} v(t-k) * 2^-k
                / sum_{k=0..W-1, bucket t-k exists}          2^-k

    Instead of a per-series window sort + per-frame rescan (O(n W log n)
    with an exchange + sort), each input row is exploded into the W
    target buckets it contributes to (map-side, no shuffle) and ONE hash
    aggregate on (series, target) sums contributions — partial aggregation
    applies, there is no sort anywhere, and the plan is a pure
    scan -> explode -> partial agg -> exchange -> final agg pipeline.
    A target bucket that has no point of its own gets no k=0 term; the
    bool_or(k=0) filter drops those phantom targets, which is what makes
    the operator gap-aware without joining back against the input.

    2^-k weights are exact dyadic doubles and the inputs are integral, so
    both sums are exact regardless of addition order — the division is
    the only rounding step and IEEE-identical in any engine.

    Returns (by..., bucket_col, value, ewma, w_norm).
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    k = F.explode(F.sequence(F.lit(0), F.lit(window_buckets - 1))).alias("k")
    src = rolled.select(
        *by,
        F.unix_timestamp(F.col(bucket_col)).alias("__t"),
        F.col(value_col).alias("__v"),
        k,
    )
    w = F.pow(F.lit(2.0), -F.col("k"))
    tgt = F.col("__t") + F.col("k") * F.lit(bucket_secs)
    return (
        src.groupBy(*by, tgt.alias("__tgt"))
        .agg(
            F.sum(F.col("__v") * w).alias("__num"),
            F.sum(w).alias("w_norm"),
            F.max(F.when(F.col("k") == 0, F.col("__v"))).alias("value"),
            F.max((F.col("k") == 0).cast("int")).alias("__own"),
        )
        .filter(F.col("__own") == 1)
        .select(
            *by,
            F.timestamp_seconds(F.col("__tgt")).alias(bucket_col),
            "value",
            (F.col("__num") / F.col("w_norm")).alias("ewma"),
            "w_norm",
        )
    )


def lttb_downsample(
    rolled: DataFrame,
    value_col: str,
    out_secs: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsample, parallel fixed-anchor
    variant: per (series, out_secs pixel bucket) keep the ONE point
    maximizing the triangle area against the PREVIOUS bucket's average
    point and the NEXT bucket's average point. Canonical LTTB anchors on
    the previously SELECTED point, a sequential dependency; anchoring on
    the previous bucket's average instead (the RIGHT anchor is already a
    bucket average in Steinarsson's original formulation) makes every
    bucket independent —
    embarrassingly parallel, and expressible as two relational passes.
    The first bucket of a series keeps its first point, the last bucket
    its last point, matching canonical LTTB's endpoint rule.

    Numerical contract: x coordinates are integer seconds relative to
    the pixel start (plus exact out_secs multiples for cross-bucket
    offsets), y values are quantized to 1e-3 (vmu int64). The anchor
    averages are single divisions of exact integer sums, so every
    engine computes bit-identical doubles and the area argmax is
    engine-independent; ties break to the earliest point.

    Scale shape: one hash aggregate for the per-bucket sums (map-side
    partial, O(series x pixels) shuffle), one tiny window lag/lead over
    the aggregate, one co-partitioned join back to the points on
    (series, pixel), and an argmax aggregate that reuses the join's
    partitioning — no second wide shuffle of the points beyond the join.

    Returns (by..., px_epoch, t_epoch, vmu, n_points).
    """
    ts = F.unix_timestamp(F.col(bucket_col))
    px = F.expr(
        f"unix_timestamp({bucket_col}) div {int(out_secs)}"
    )
    vmu = F.round(F.col(value_col) * 1000).cast("long")
    pts = rolled.select(
        *by,
        px.alias("__px"),
        ts.alias("__t"),
        vmu.alias("__vmu"),
    ).withColumn("__x", F.col("__t") - F.col("__px") * F.lit(int(out_secs)))

    agg = pts.groupBy(*by, "__px").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__vmu").alias("__sv"),
    )
    w = Window.partitionBy(*by).orderBy("__px")
    info = agg.select(
        *by,
        "__px",
        F.col("__n").alias("n_points"),
        F.lag("__px").over(w).alias("__ppx"),
        F.lag("__sx").over(w).alias("__psx"),
        F.lag("__sv").over(w).alias("__psv"),
        F.lag("__n").over(w).alias("__pn"),
        F.lead("__px").over(w).alias("__npx"),
        F.lead("__sx").over(w).alias("__nsx"),
        F.lead("__sv").over(w).alias("__nsv"),
        F.lead("__n").over(w).alias("__nn"),
    )
    j = pts.join(info, on=[*by, "__px"])

    out = F.lit(float(out_secs))
    x_l = F.col("__psx") / F.col("__pn") + (
        F.col("__ppx") - F.col("__px")
    ).cast("double") * out
    y_l = F.col("__psv") / F.col("__pn")
    x_r = F.col("__nsx") / F.col("__nn") + (
        F.col("__npx") - F.col("__px")
    ).cast("double") * out
    y_r = F.col("__nsv") / F.col("__nn")
    x = F.col("__x").cast("double")
    y = F.col("__vmu").cast("double")
    area2 = F.abs((x_l - x_r) * (y - y_l) - (x_l - x) * (y_r - y_l))
    # selection key: first bucket -> earliest point, last bucket ->
    # latest point, interior -> max area; ties to the earliest point
    key1 = (
        F.when(F.col("__ppx").isNull(), -x)
        .when(F.col("__npx").isNull(), x)
        .otherwise(area2)
    )
    sel = j.groupBy(*by, "__px", "n_points").agg(
        F.max(
            F.struct(
                key1.alias("k1"),
                (-F.col("__t")).alias("k2"),
                F.col("__t").alias("t"),
                F.col("__vmu").alias("v"),
            )
        ).alias("__s")
    )
    return sel.select(
        *by,
        (F.col("__px") * F.lit(int(out_secs))).alias("px_epoch"),
        F.col("__s.t").alias("t_epoch"),
        F.col("__s.v").alias("vmu"),
        "n_points",
    )


def top_series_per_bucket(
    rolled: DataFrame,
    value_col: str,
    n: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Heavy hitters: the n series with the largest value in each time
    bucket (rank with ties broken by series key ascending, so the result
    is deterministic and oracle-replayable). One exchange on the bucket;
    at scale the per-bucket group is bounded by series cardinality and
    AQE's skew handling splits a hot bucket."""
    w = Window.partitionBy(bucket_col).orderBy(
        F.col(value_col).desc(), *[F.col(c).asc() for c in by]
    )
    return (
        rolled.select(
            *by, bucket_col, F.col(value_col).alias("value"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= n)
    )


def brown_trend(
    rolled: DataFrame,
    value_col: str,
    bucket_secs: int,
    window_buckets: int = 8,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Brown double exponential smoothing (dyadic variant): the level /
    trend / one-step-forecast decomposition a capacity planner runs
    over every tier series. Classic Brown is s' = EWMA(x),
    s'' = EWMA(s'), level = 2s' - s'', trend = a/(1-a)(s' - s''); with
    this module's normalized dyadic window the a/(1-a) factor is not a
    constant, so the reported trend is the raw (s' - s'') spread and
    the forecast is level + trend = 3s' - 2s''. On a linear ramp the
    spread is proportional to the slope and the forecast stays on the
    ramp once the window is saturated, which is the property the
    monitor cares about.

    Plan: ewma() composed with itself — two explode->hash-aggregate
    passes, two exchanges total, no window sorts, no joins (the second
    pass's input IS the first pass's output, value column `ewma`).
    Numerics: s' is a ratio of exact dyadic sums (bit-identical in any
    engine for integral inputs); the second pass multiplies those
    doubles by exact powers of two, so only the final 8-term additions
    round — contract queries quantize at 1e-6.

    Returns (by..., bucket_col, s1, s2, level, trend, forecast) — the
    raw value column does not survive the second pass (join-free by
    design); re-join against the tier if both are needed.
    """
    s1 = ewma(
        rolled, value_col, bucket_secs, window_buckets, by, bucket_col
    ).select(*by, bucket_col, F.col("value"), F.col("ewma").alias("__s1"))
    s2 = ewma(
        s1, "__s1", bucket_secs, window_buckets, by, bucket_col
    ).select(
        *by,
        bucket_col,
        F.col("value").alias("s1"),
        F.col("ewma").alias("s2"),
    )
    level = F.lit(2.0) * F.col("s1") - F.col("s2")
    trend = F.col("s1") - F.col("s2")
    return s2.select(
        *by,
        bucket_col,
        "s1",
        "s2",
        level.alias("level"),
        trend.alias("trend"),
        (F.lit(3.0) * F.col("s1") - F.lit(2.0) * F.col("s2")).alias(
            "forecast"
        ),
    )


_SAX_BREAKPOINTS = {
    3: (-0.4307272992954576, 0.4307272992954576),
    4: (-0.6744897501960817, 0.0, 0.6744897501960817),
    5: (-0.8416212335729143, -0.2533471031357997, 0.2533471031357997,
        0.8416212335729143),
}


def sax_words(
    rolled: DataFrame,
    value_col: str,
    word_secs: int,
    alphabet: int = 4,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """SAX symbolization (Lin, Keogh, Lonardi, Chiu 2003): per series
    and word window (e.g. one day over the 1h tier), z-normalize the
    window's bucket values and bin each into a Gaussian-equiprobable
    alphabet, emitting one word string per (series, window) — the
    classic symbolic index for motif discovery and cheap similarity
    pre-filtering. The input tier IS the PAA step (piecewise aggregate
    means), so this composes with any rollup granularity; run it over a
    gap-filled tier when fixed-length words are required (absent
    buckets are simply absent letters here).

    Determinism across engines: mean and variance come from pooled
    integer-exact sums (n, Σv, Σv²), never a built-in stddev whose
    internal algorithm differs per engine; a zero-variance or
    single-point window maps every letter to the z=0 bin. Breakpoint
    comparisons see bit-identical doubles on both sides, so the binning
    cannot straddle engines.

    Plan: ONE exchange — the (series, window) window functions compute
    the pooled sums, and the follow-up groupBy on the same keys reuses
    the partitioning; the word is an ordered array_join (letters sorted
    by bucket), shuffle O(series x windows) after the window pass.

    Returns (by..., word_epoch, n, word).
    """
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be one of {sorted(_SAX_BREAKPOINTS)}"
        )
    t = F.unix_timestamp(F.col(bucket_col))
    base = rolled.select(
        *by,
        (t - (t % F.lit(int(word_secs)))).alias("__word"),
        t.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    )
    v = F.col("__v")
    w = Window.partitionBy(*by, "__word")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1))
    z = F.when(
        (n == 1) | (var <= 0.0), F.lit(0.0)
    ).otherwise((v - mean) / F.sqrt(var))
    bps = _SAX_BREAKPOINTS[alphabet]
    sym = F.when(z < bps[0], F.lit("a"))
    for i, b in enumerate(bps[1:], start=1):
        sym = sym.when(z < b, F.lit(chr(ord("a") + i)))
    sym = sym.otherwise(F.lit(chr(ord("a") + len(bps))))
    lettered = base.select(*by, "__word", "__t", sym.alias("__sym"))
    piece = F.struct(F.col("__t").alias("t"), F.col("__sym").alias("s"))
    return lettered.groupBy(*by, F.col("__word").alias("word_epoch")).agg(
        F.count(F.lit(1)).alias("n"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(piece)), lambda p: p["s"]
            ),
            "",
        ).alias("word"),
    )
