"""Distinct-cardinality rollups over the event stream.

"Unique users per hour" is the other half of every traffic dashboard
(count rollups are already tiers). Two paths:

- distinct_rollup: EXACT count distinct per (bucket, dims...). Spark
  plans count(DISTINCT k) as the two-phase Expand trick: partial
  dedup on (bucket, dims, k) map-side, shuffle the deduped pairs, then
  count — shuffle volume is O(distinct pairs), not O(events). This is
  the oracle-checkable contract query.
- approx_distinct_rollup: HyperLogLog++ via approx_count_distinct —
  the 100 TB path. The sketch is an algebraic aggregate (partial
  map-side merge, O(buckets x 2^p) shuffle bytes INDEPENDENT of
  cardinality), which is why at scale you trade the exact Expand
  shuffle for it; rsd=0.05 -> ~1.5 KB per group. Not SQL-oracle-able
  (sketch internals are engine-specific); tested against the exact
  path within 4*rsd on the driver fixtures instead.

At 10^12 turns the exact path's dedup shuffle is O(user x hour) pairs
— still big; the HLL path's shuffle is O(hours) sketch blobs. The
engine exposes both because training-data audits need exact counts
(dedup accounting) while dashboards want the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "distinct_rollup",
    "approx_distinct_rollup",
    "hll_sketch_rollup",
    "hll_sketch_reagg",
    "approx_quantile_rollup",
    "approx_top_items",
    "rolling_distinct",
    "kmv_hash",
    "kmv_hash_sql",
    "kmv_sketch_rollup",
    "kmv_reagg",
    "kmv_estimate",
    "kmv_jaccard",
    "kmv_rolling_union",
]


def _bucket(bucket_secs: int, ts_col: str):
    return (
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        - F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        % F.lit(int(bucket_secs))
    ).alias("bucket_epoch")


def distinct_rollup(
    events: DataFrame,
    key_col: str,
    bucket_secs: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Exact distinct `key_col` count per (bucket, dims...), plus the
    raw event count for context. Returns (bucket_epoch, dims...,
    n_events, n_distinct)."""
    return (
        events.groupBy(_bucket(bucket_secs, ts_col), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(key_col).alias("n_distinct"),
        )
    )


def approx_distinct_rollup(
    events: DataFrame,
    key_col: str,
    bucket_secs: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct estimate per (bucket, dims...): the
    constant-shuffle-bytes scale path. Returns (bucket_epoch, dims...,
    n_events, n_approx)."""
    return (
        events.groupBy(_bucket(bucket_secs, ts_col), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(key_col, rsd).alias("n_approx"),
        )
    )


def approx_quantile_rollup(
    events: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...],
    bucket_secs: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based percentile rollup: approx_percentile (Spark's
    Greenwald-Khanna summary) per (bucket, dims...) — the scale twin of
    the exact percentile() contract query exactly as
    approx_distinct_rollup twins the exact distinct. The summary is an
    algebraic aggregate: partial sketches merge map-side and the
    shuffle carries O(groups x accuracy) sketch entries INDEPENDENT of
    row count, vs exact percentile's per-group sort over every value.
    Error bound: rank error <= n / accuracy per group.

    Not SQL-oracle-able (summary internals are engine-specific); the
    pytest tolerance check pins it against the exact path on the
    driver fixtures. Returns (bucket_epoch, dims..., n, q_<i>...)
    with one column per requested quantile (value units).
    """
    if not quantiles:
        raise ValueError("need at least one quantile")
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    bucket = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {int(bucket_secs) * 1_000_000}"
    ) * F.lit(int(bucket_secs))
    # ONE summary per group queried at every requested quantile (the
    # array form) — a per-quantile approx_percentile would build and
    # shuffle-merge k independent sketches, multiplying the exact cost
    # this operator exists to bound
    arr = ", ".join(str(float(q)) for q in quantiles)
    qs = F.expr(
        f"approx_percentile({value_col}, array({arr}), {int(accuracy)})"
    ).alias("__qs")
    out = events.groupBy(bucket.alias("bucket_epoch"), *dims).agg(
        F.count(F.lit(1)).alias("n"), qs
    )
    cols = ["bucket_epoch", *dims, "n"]
    for i in range(len(quantiles)):
        cols.append(F.element_at("__qs", i + 1).alias(f"q_{i}"))
    return out.select(*cols)


def approx_top_items(
    df: DataFrame,
    key_col: str,
    m: int = 64,
    out_k: int = 10,
) -> DataFrame:
    """Misra-Gries heavy hitters: the bounded-memory top-items sketch
    that completes this module's family (HLL for distinct, Greenwald-
    Khanna for quantiles, MG for frequency). Each task keeps at most
    `m` counters regardless of key cardinality — the property exact
    top-N (top_series_per_bucket) gives up when the key space stops
    fitting in a hash aggregate.

    Distributed shape: mapInPandas runs one MG summary per task
    (vectorized — each Arrow batch is pre-aggregated with value_counts,
    then MERGED into the summary with the standard subtract-the-
    (m+1)th-count rule, so Python never loops per row); the partials
    (O(tasks x m) rows) shuffle into one hash aggregate, and the final
    top-k is a TakeOrderedAndProject. Per-task decrement totals ride
    along on a sentinel row and sum into the global error bound.

    Guarantees (classic MG merge bounds): for every returned item,
        est <= true_count <= est + err_ub,
    and any key with true_count > err_ub is guaranteed PRESENT in the
    merged summary (err_ub <= N / (m+1) with equality only in
    adversarial streams). The estimates are deterministic for a fixed
    input partitioning; membership of sub-threshold stragglers is not —
    callers filter on est or err_ub, exactly as with any sketch.

    Returns (key, est, err_ub) — top out_k by est desc, key asc.
    """
    import pandas as pd

    if m < 1 or out_k < 1:
        raise ValueError("m and out_k must be >= 1")

    def mg(batches):
        counts: "pd.Series | None" = None
        dec = 0
        for pdf in batches:
            # NULL keys are not items (match the aggregate family's NULL
            # handling); astype first would alias them to the string
            # 'None'/'nan' and merge them with genuine such keys
            b = pdf[key_col].dropna().astype(str).value_counts()
            counts = b if counts is None else counts.add(b, fill_value=0)
            if len(counts) > m:
                t = int(counts.nlargest(m + 1).iloc[-1])
                counts = counts - t
                counts = counts[counts > 0]
                dec += t
        out = pd.DataFrame(
            {
                "key": (counts.index if counts is not None else []),
                "cnt": (
                    counts.to_numpy("int64")
                    if counts is not None
                    else []
                ),
            }
        )
        sentinel = pd.DataFrame({"key": [None], "cnt": [dec]})
        yield pd.concat([out, sentinel], ignore_index=True)

    partials = df.select(F.col(key_col)).mapInPandas(
        mg, "key string, cnt long"
    )
    agg = partials.groupBy(
        F.col("key").isNull().alias("__is_err"), "key"
    ).agg(F.sum("cnt").alias("est"))
    err = agg.filter(F.col("__is_err")).select(
        F.coalesce(F.sum("est"), F.lit(0)).alias("err_ub")
    )
    return (
        agg.filter(~F.col("__is_err"))
        .crossJoin(F.broadcast(err))
        .select("key", "est", "err_ub")
        .orderBy(F.col("est").desc(), F.col("key").asc())
        .limit(out_k)
    )


def rolling_distinct(
    events: DataFrame,
    key_col: str,
    window_buckets: int,
    bucket_secs: int = 86400,
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling distinct count — the DAU/WAU/MAU family ("distinct users
    in the 7 days ending at each day"). Distinct is not a subtractable
    aggregate, so no window frame can slide it; the standard relational
    shape is OFFSET-EXPLODE: each (bucket, key) observation is first
    deduplicated per bucket, then projected onto the W anchor buckets
    whose trailing window contains it, and one exact count-distinct per
    anchor finishes.

    Cost model (why this scales): dedup-per-bucket FIRST means the
    explode multiplies only O(active keys per bucket) rows by W, never
    raw events; the final distinct is Spark's two-phase Expand over
    O(W x daily actives). For sliding windows too wide/hot for exact
    (W=90 MAU over 10^9 DAU) swap the final distinct for
    approx_count_distinct exactly as approx_distinct_rollup does — the
    explode shape is unchanged.

    Anchors with no observations are absent (a day nobody was active
    reports no row, matching the rollup family's gap semantics).
    Returns (bucket_epoch, n_keys) where bucket_epoch is the anchor
    (window END, inclusive) bucket.
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    bucket = F.expr(
        f"unix_micros(cast({ts_col} as timestamp))"
        f" div {int(bucket_secs) * 1_000_000}"
    )
    per_bucket = events.select(
        bucket.alias("__b"), F.col(key_col).alias("__k")
    ).distinct()
    k = F.explode(
        F.sequence(F.lit(0), F.lit(int(window_buckets) - 1))
    ).alias("__o")
    projected = per_bucket.select("__b", "__k", k).select(
        ((F.col("__b") + F.col("__o")) * F.lit(int(bucket_secs))).alias(
            "bucket_epoch"
        ),
        "__k",
        F.col("__o"),
    )
    # an observation only feeds anchors that actually exist as buckets
    # with their own activity? No — PromQL-style: every anchor in the
    # observation's forward window counts it, including quiet anchors.
    # But anchors PAST the data's end are phantoms of the explode; the
    # caller's window end is the max observed bucket, so clip there.
    max_b = per_bucket.agg(F.max("__b").alias("__mx"))
    return (
        projected.crossJoin(F.broadcast(max_b))
        .filter(F.col("bucket_epoch") <= F.col("__mx") * F.lit(int(bucket_secs)))
        .groupBy("bucket_epoch")
        .agg(F.count_distinct("__k").alias("n_keys"))
    )


def hll_sketch_rollup(
    events: DataFrame,
    key_col: str,
    bucket_secs: int,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
    lgk: int = 12,
) -> DataFrame:
    """Persisted-sketch distinct rollup: one Datasketches HLL blob per
    (bucket, dims...) — the form a continuous aggregate actually STORES
    (approx_distinct_rollup only returns the number, so a coarser tier
    must rescan raw events; a stored sketch re-aggregates without
    them). Returns (bucket_epoch, dims..., n_events, sketch binary).

    Shuffle bytes are O(groups x 2^lgk), independent of cardinality —
    the same algebraic-partial-aggregate shape as the count tiers, so
    the 1m -> 1h -> 1d sketch ladder costs one exchange per tier at any
    input size."""
    return events.groupBy(_bucket(bucket_secs, ts_col), *dims).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch"),
    )


def hll_sketch_reagg(
    sketches: DataFrame,
    coarse_secs: int,
    dims: tuple[str, ...] = (),
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """Re-aggregate a finer sketch tier to a coarser one WITHOUT the
    raw events: lossless-union the blobs per coarser bucket and
    estimate. Returns (bucket_epoch, dims..., n_events, n_approx,
    sketch) — the sketch rides along so the ladder can keep climbing
    (1m -> 1h -> 1d with one union per level).

    Estimates from a unioned ladder can differ by a few ulps-of-bucket
    from sketching the raw span directly (the sparse->dense promotion
    path differs), but both stay inside the published HLL error bound;
    tests pin that invariant."""
    coarse = (
        F.col(bucket_col) - F.col(bucket_col) % F.lit(int(coarse_secs))
    ).alias(bucket_col)
    merged = sketches.groupBy(coarse, *dims).agg(
        F.sum("n_events").alias("n_events"),
        F.hll_union_agg("sketch").alias("sketch"),
    )
    return merged.select(
        bucket_col,
        *dims,
        "n_events",
        F.hll_sketch_estimate("sketch").alias("n_approx"),
        "sketch",
    )


# ---------------------------------------------------------------- KMV
# k-minimum-values sketch (Bar-Yossef et al. 2002 / Beyer et al.
# SIGMOD'07): keep the k smallest values of a uniform hash of the key;
# the k-th smallest normalized hash estimates distinct count as
# (k-1)/h_(k), and — unlike HLL — two sketches support SET OVERLAP
# estimates (Jaccard via the k-min of the union), which is what dedup
# accounting between corpus slices actually needs. The hash is the
# repo's dual-dialect integer idiom (functions/text.py): pure BIGINT
# arithmetic mod P, identical in Spark and DuckDB, so the stored
# sketch — and therefore every estimate — is oracle-checkable
# bit-for-bit, no engine hash involved.

KMV_P = 1_000_000_007
KMV_A, KMV_B = 722_472_041, 568_995_167  # fixed odd mixers < P


def kmv_hash(key: Column) -> Column:
    """Uniform-ish hash of an integer key into [0, P): ((key mod P) * A
    + B) mod P — products stay < 2^60, exact in int64 in any engine."""
    return (
        (key.cast("long") % KMV_P + KMV_P) % KMV_P * KMV_A + KMV_B
    ) % KMV_P


def kmv_hash_sql(key_sql: str) -> str:
    """The DuckDB spelling of kmv_hash (same integer expression)."""
    return (
        f"((({key_sql} % {KMV_P} + {KMV_P}) % {KMV_P})"
        f" * {KMV_A} + {KMV_B}) % {KMV_P}"
    )


def kmv_sketch_rollup(
    events: DataFrame,
    key_col: str,
    bucket_secs: int,
    k: int = 64,
    dims: tuple[str, ...] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Build the KMV sketch per (bucket, dims...): the k smallest
    distinct key hashes as a sorted array column.

    Plan: map-side partial dedup of (bucket, dims, h) -> one exchange
    of DISTINCT triples (same shuffle volume as exact count-distinct's
    Expand plan — KMV from raw cannot beat that; its win is the STORED
    table, see kmv_reagg) -> per-group sort+slice. Returns
    (bucket_epoch, dims..., n_events?, kmv array<long>, n_distinct).

    n_distinct rides along so tests can pin the estimator's error
    against truth; production ladders drop it.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    trips = events.select(
        _bucket(bucket_secs, ts_col),
        *dims,
        kmv_hash(F.col(key_col)).alias("__h"),
    ).distinct()
    return trips.groupBy("bucket_epoch", *dims).agg(
        F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("kmv"),
        F.count(F.lit(1)).alias("n_distinct"),
    )


def kmv_reagg(
    sketch: DataFrame,
    coarse_secs: int,
    k: int = 64,
    dims: tuple[str, ...] = (),
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """Merge stored fine sketches to coarser buckets WITHOUT raw
    rescan: the k smallest of the union of k-min sets is exactly the
    k-min set of the union of the underlying key sets (min is
    associative), so the merged sketch is IDENTICAL to one built from
    raw — the lossless continuous-aggregate property, on O(groups x k)
    shuffle bytes. The oracle equality in the contract query proves
    exactly this."""
    coarse = (
        F.col(bucket_col) - F.col(bucket_col) % F.lit(int(coarse_secs))
    ).alias(bucket_col)
    return sketch.groupBy(coarse, *dims).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("kmv")))
            ),
            1,
            k,
        ).alias("kmv")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate column from the sketch: exact size when
    the sketch holds fewer than k values (it then IS the distinct hash
    set), else the KMV estimator (k-1) * P / h_(k) — one double divide
    on identical operands, so cross-engine identical."""
    h_k = F.element_at("kmv", k).cast("double")
    est = F.when(
        F.size("kmv") < k, F.size("kmv").cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_P)) / h_k)
    return sketch.withColumn("n_est", est)


def kmv_jaccard(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    k: int = 64,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Jaccard similarity estimate between two keyed sketch tables:
    join on `on`, take the k smallest of the union of both sketches,
    and count how many of those union-minima sit in BOTH sketches —
    |M ∩ A ∩ B| / |M| is the standard unbiased KMV Jaccard estimator.
    Pure array expressions, broadcastable when one side is small.

    Returns on..., kmv_a, kmv_b, inter, denom, jaccard."""
    a, b = f"kmv{suffixes[0]}", f"kmv{suffixes[1]}"
    j = left.select(*on, F.col("kmv").alias(a)).join(
        right.select(*on, F.col("kmv").alias(b)), on=on
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col(a), F.col(b)))),
        1,
        k,
    )
    inter = F.size(
        F.array_intersect(merged, F.array_intersect(F.col(a), F.col(b)))
    )
    return j.select(
        *on,
        F.col(a),
        F.col(b),
        inter.alias("inter"),
        F.size(merged).alias("denom"),
        (
            inter.cast("double") / F.size(merged).cast("double")
        ).alias("jaccard"),
    )


def kmv_rolling_union(
    sketch: DataFrame,
    window_buckets: int,
    bucket_secs: int = 86400,
    k: int = 64,
    dims: tuple[str, ...] = (),
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """Sliding-window distinct from STORED sketches: for each observed
    bucket, union the trailing `window_buckets` KMV sketches and
    estimate — the sketch-path complement of rolling_distinct. That
    operator is exact but fans every active key into W anchors
    (shuffle O(W x daily actives)); this one never revisits keys at
    all: the per-bucket sketch table (O(buckets x k) rows TOTAL) slides
    under a window frame, so a 90-day MAU over 10^9 DAU costs the same
    as over 10^3.

    Correctness lean: min is associative, so the k smallest of the
    union of per-bucket k-min sets IS the k-min set of the union of
    the underlying key sets (kmv_reagg's lossless property) — the
    estimate equals one built from the raw window. The contract
    query's oracle computes the k-min over raw distinct hashes per
    window directly, proving the identity end-to-end.

    Window semantics: one output row per OBSERVED (bucket, dims) row —
    quiet buckets emit nothing (rollup-family gap convention; gap-fill
    first if a dense panel is needed). The frame is a RANGE over the
    epoch column, so missing buckets inside the window simply
    contribute no sketch.

    Scale shape: ONE exchange on dims + one sort of the tiny sketch
    table; per-row state is <= W sketches (W*k longs). With empty dims
    the table collapses to one partition of O(buckets) rows — use dims
    (the panel key) when the anchor grid itself is large.

    Returns (bucket_epoch, dims..., w_buckets, kmv, n_est).
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    span = (int(window_buckets) - 1) * int(bucket_secs)
    w = (
        Window.partitionBy(*[F.col(c) for c in dims])
        .orderBy(F.col(bucket_col).cast("long"))
        .rangeBetween(-span, 0)
    )
    merged = sketch.select(
        bucket_col,
        *dims,
        F.slice(
            F.array_sort(
                F.array_distinct(
                    F.flatten(F.collect_list("kmv").over(w))
                )
            ),
            1,
            k,
        ).alias("kmv"),
    )
    h_k = F.element_at("kmv", k).cast("double")
    est = F.when(
        F.size("kmv") < k, F.size("kmv").cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_P)) / h_k)
    return merged.select(
        bucket_col,
        *dims,
        F.lit(int(window_buckets)).alias("w_buckets"),
        "kmv",
        est.alias("n_est"),
    )
