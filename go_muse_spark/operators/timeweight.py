"""Time-weighted aggregation over irregular event streams.

A plain AVG over a bucket treats a sensor that reported once and one
that reported 1000x the same; a time-series store weighs each observed
value by HOW LONG it held (TimescaleDB `time_weight`, PromQL's
staleness-bounded LOCF semantics). Two operators share one segment
decomposition:

- time_weighted_avg: per (series, tumbling bucket), the LOCF integral
  of the value divided by the covered duration.
- state_durations: per (series, state, tumbling bucket), how many
  microseconds the series spent in that state — the uptime / state-agg
  primitive ("how long was this conversation in 'error'?").

Segment model (the contract an oracle must replay exactly): each event
at time t holds its value/state from t until the NEXT event of the same
series or until t + max_hold_secs, whichever is earlier — a staleness
bound, like Prometheus's 5m lookback, so a series that stops reporting
stops accumulating instead of extrapolating forever. Segments are
therefore disjoint per series, and a bucket's covered duration never
exceeds the bucket length. Timestamps are worked in integer
MICROSECONDS (the parquet resolution) and values are quantized to
1e-3 before weighting, so every contribution value_mu * overlap_us is
an exact int64 product and the per-bucket sums are order-independent —
bit-identical in any engine, the same pooled-integer-sums trick the
xcorr and stats oracles use. The only doubles are the final divisions.

Scale shape: one window lead() per series to find the segment end (one
exchange on the series key — at 100 TB the tier table is already
partitioned by it, so AQE elides the shuffle), then a MAP-SIDE explode
of each segment into the <= max_hold/bucket + 2 tumbling buckets it
overlaps, then ONE hash aggregate on (series, bucket) with map-side
partial aggregation. Shuffle volume is O(segments x hold/bucket), not
O(points x window), and there is no second sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "locf_segments",
    "time_weighted_avg",
    "state_durations",
    "instant_snapshot",
    "state_transitions",
    "markov_entropy",
    "markov_memory",
    "time_above_threshold",
]

_US = 1_000_000


def locf_segments(
    events: DataFrame,
    max_hold_secs: int,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    payload: dict[str, str] | None = None,
) -> DataFrame:
    """Decompose an irregular event stream into disjoint hold segments.

    Returns (by..., __t_us, __e_us, payload...): the half-open interval
    [__t_us, __e_us) during which the event's payload is the series'
    current observation. __e_us = min(next event ts, ts + max_hold).
    Zero-length segments (duplicate timestamps) are dropped — the row
    sorted LAST at that timestamp wins. The window orders by
    (ts, payload exprs) so the winner is a deterministic function of
    the data, not of partitioning (an oracle must replay the same
    secondary sort).
    """
    if max_hold_secs <= 0:
        raise ValueError("max_hold_secs must be positive")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tie = [F.expr(e) for e in (payload or {}).values()]
    w = Window.partitionBy(*by).orderBy(t, *tie)
    hold = F.lit(int(max_hold_secs) * _US)
    end = F.least(F.lead(t).over(w), t + hold)
    cols = [F.col(c) for c in by]
    cols += [t.alias("__t_us"), F.coalesce(end, t + hold).alias("__e_us")]
    for out_name, expr in (payload or {}).items():
        cols.append(F.expr(expr).alias(out_name))
    return events.select(*cols).filter(F.col("__e_us") > F.col("__t_us"))


def _explode_buckets(seg: DataFrame, bucket_secs: int) -> DataFrame:
    """Map-side fan-out of each segment into the tumbling buckets it
    overlaps, with the exact integer overlap in microseconds."""
    bs = int(bucket_secs) * _US
    # integer `div`, not double `/` + cast: at microsecond-epoch
    # magnitudes a double quotient can round UP across a boundary
    k = F.explode(
        F.sequence(
            F.expr(f"__t_us div {bs}"),
            F.expr(f"(__e_us - 1) div {bs}"),
        )
    ).alias("__k")
    out = seg.select("*", k)
    lo = F.greatest(F.col("__t_us"), F.col("__k") * F.lit(bs))
    hi = F.least(F.col("__e_us"), (F.col("__k") + 1) * F.lit(bs))
    return out.withColumn("__overlap_us", hi - lo)


def time_weighted_avg(
    events: DataFrame,
    value_col: str,
    bucket_secs: int,
    max_hold_secs: int,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """LOCF time-weighted average per (series, tumbling bucket).

        twa = sum(value_i * overlap_us_i) / sum(overlap_us_i)

    over the hold segments intersecting the bucket. Values are
    quantized to 1e-3 (value_mu = round(value * 1000) as int64) so the
    numerator is an exact integer sum; covered_us <= bucket_secs * 1e6
    by segment disjointness, which also bounds the int64 numerator at
    max|value_mu| * bucket_us.

    Returns (by..., bucket_epoch, covered_us, twa) — bucket_epoch in
    whole seconds, covered_us the observed (non-gap) share of the
    bucket, twa back in value units (double; the one rounding step).
    """
    vmu = f"cast(round({value_col} * 1000) as bigint)"
    seg = locf_segments(
        events, max_hold_secs, by=by, ts_col=ts_col, payload={"__vmu": vmu}
    )
    ex = _explode_buckets(seg, bucket_secs)
    return (
        ex.groupBy(*by, F.col("__k"))
        .agg(
            F.sum(F.col("__vmu") * F.col("__overlap_us")).alias("__num"),
            F.sum("__overlap_us").alias("covered_us"),
        )
        .select(
            *by,
            (F.col("__k") * F.lit(int(bucket_secs))).alias("bucket_epoch"),
            "covered_us",
            (F.col("__num") / F.col("covered_us") / F.lit(1000.0)).alias(
                "twa"
            ),
        )
    )


def state_durations(
    events: DataFrame,
    state_col: str,
    bucket_secs: int,
    max_hold_secs: int,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Per (series, tumbling bucket, state): microseconds spent in that
    state under the LOCF + staleness-bound segment model. Disjoint
    segments mean the per-bucket durations sum to covered time, never
    more than the bucket. All-integer: order-independent, exact.

    Returns (by..., bucket_epoch, state, dur_us, n_enters) where
    n_enters counts segments of that state STARTING in the bucket
    (transition count, 0 for pure carry-in coverage).
    """
    seg = locf_segments(
        events, max_hold_secs, by=by, ts_col=ts_col, payload={"state": state_col}
    )
    ex = _explode_buckets(seg, bucket_secs)
    bs = int(bucket_secs) * _US
    enters = (F.col("__t_us") >= F.col("__k") * F.lit(bs)).cast("long")
    return (
        ex.groupBy(*by, F.col("__k"), F.col("state"))
        .agg(
            F.sum("__overlap_us").alias("dur_us"),
            F.sum(enters).alias("n_enters"),
        )
        .select(
            *by,
            (F.col("__k") * F.lit(int(bucket_secs))).alias("bucket_epoch"),
            "state",
            "dur_us",
            "n_enters",
        )
    )


def instant_snapshot(
    events: DataFrame,
    at_ts: str,
    lookback_secs: int,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    payload: dict[str, str] | None = None,
) -> DataFrame:
    """PromQL instant-vector evaluation: the most recent observation of
    every series at wall time `at_ts`, looking back at most
    `lookback_secs` (Prometheus's staleness window — a series whose
    last report is older than the lookback is absent from the snapshot,
    not extrapolated).

    Shape: filter to the (at - lookback, at] half-open slice — at 100 TB
    the time predicate partition-prunes the tier table down to the
    lookback's partitions — then ONE aggregate per series taking
    max(struct(t, payload...)) with map-side partials, so the shuffle is
    O(series) regardless of slice size. Plan caveat: struct max is a
    declarative aggregate Tungsten cannot hash, so Spark runs it as a
    SortAggregate — each task sorts ITS OWN slice rows by the group key
    before the partial max (no global sort, no window). If that
    per-task sort ever shows up at scale, pack (t_us, value) into one
    DECIMAL(38) (t_us * 10^19 + shifted value) and max that — scalar
    max hash-aggregates — then unpack with div/mod. The struct compares
    lexicographically, so duplicate-timestamp ties break on the payload
    values — a deterministic function of the data (an oracle replays
    ORDER BY t DESC, payload... DESC LIMIT 1).

    Returns (by..., t_us, payload...).
    """
    if lookback_secs <= 0:
        raise ValueError("lookback_secs must be positive")
    pay = payload or {}
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    at_us = F.unix_micros(F.lit(at_ts).cast("timestamp"))
    lo_us = at_us - F.lit(int(lookback_secs) * _US)
    picked = F.max(
        F.struct(
            t.alias("t_us"),
            *[F.expr(e).alias(k) for k, e in pay.items()],
        )
    ).alias("__top")
    return (
        events.filter((t > lo_us) & (t <= at_us))
        .groupBy(*by)
        .agg(picked)
        .select(*by, "__top.t_us", *[f"__top.{k}" for k in pay])
    )


def state_transitions(
    events: DataFrame,
    state_col: str,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Compact a state stream to its TRANSITIONS: emit a row only where
    the state differs from the series' previous observation (the
    dedup-consecutive-repeats pass every status/heartbeat pipeline runs
    before storing — 10^12 heartbeats, 10^6 actual changes). The first
    observation of a series is a transition from NULL.

    Determinism: the window orders by (ts, state) — the same secondary
    sort as locf_segments — so duplicate timestamps resolve identically
    in any engine; a repeated (ts, state) pair is never a transition.

    Scale shape: one exchange on the series key, one lag window, then a
    filter that drops ~all rows (output-sensitive) and a run counter
    over the survivors sharing the same exchange. Returns (by...,
    t_us, from_state, to_state, trans_idx) with trans_idx the 1-based
    transition number within the series.
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    st = F.col(state_col)
    w = Window.partitionBy(*by).orderBy(t, st)
    prev = F.lag(st).over(w)
    marked = events.select(
        *by,
        t.alias("t_us"),
        prev.alias("from_state"),
        st.alias("to_state"),
        (prev.isNull() | (prev != st)).alias("__is_t"),
    ).filter(F.col("__is_t"))
    w2 = Window.partitionBy(*by).orderBy("t_us", "to_state")
    return marked.select(
        *by,
        "t_us",
        "from_state",
        "to_state",
        F.row_number().over(w2).alias("trans_idx"),
    )


def time_above_threshold(
    events: DataFrame,
    value_col: str,
    threshold: float,
    bucket_secs: int,
    max_gap_secs: int,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """SLO uptime with LINEAR interpolation: per (series, tumbling
    bucket), how many microseconds the piecewise-linear signal through
    the samples sat at or above `threshold` — TimescaleDB's
    `time above threshold` / the burn-budget numerator. The LOCF
    operators above hold the LAST value; this one draws the line
    between consecutive samples and credits the exact sub-segment
    beyond the crossing, so a 10-minute ramp through the threshold
    contributes the interpolated minutes, not 0 or 10.

    Geometry per consecutive pair (t0,v0)->(t1,v1), values quantized to
    milli-units (module convention), h = round(threshold*1000):

      both >= h  -> above on [t0, t1)
      both <  h  -> empty
      rising  (v0 < h <= v1) -> above on [t_x, t1)
      falling (v0 >= h > v1) -> above on [t0, t_x)

    with the crossing t_x = t0 + round(dt_us*(h - v0)/(v1 - v0)) — the
    products are exact int64 (dt <= max_gap, milli values), ONE IEEE
    division, one half-up round to whole microseconds. After that
    rounding, everything is INTEGER interval algebra: the above-part
    and the full segment are exploded into the tumbling buckets they
    overlap and the per-bucket sums are exact int64 — order-
    independent, bit-replayable by an oracle spelling the same tree.

    Pairs further apart than max_gap_secs are stale — no line is drawn
    (the span counts as uncovered, like a LOCF hold expiring); dt <= 0
    pairs (duplicate timestamps) are dropped, with the pairing order
    (ts, value) so the survivor is data-deterministic.

    Scale shape: ONE exchange on the series key (the lead() window),
    then a MAP-SIDE explode into <= gap/bucket + 2 buckets per segment
    and one hash aggregate on (series, bucket) with map-side combine —
    the same shuffle budget as time_weighted_avg.

    Returns (by..., bucket_epoch, covered_us, above_us, above_frac)
    where above_frac = above_us / covered_us (NULL when uncovered).
    """
    if max_gap_secs <= 0:
        raise ValueError("max_gap_secs must be positive")
    if bucket_secs <= 0:
        raise ValueError("bucket_secs must be positive")
    h = int(round(float(threshold) * 1000))
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    vmu = F.expr(f"cast(round({value_col} * 1000) as bigint)")
    w = Window.partitionBy(*by).orderBy(t, vmu)
    s = events.select(
        *by,
        t.alias("__t0"),
        vmu.alias("__v0"),
        F.lead(t).over(w).alias("__t1"),
        F.lead(vmu).over(w).alias("__v1"),
    ).filter(
        F.col("__t1").isNotNull()
        & (F.col("__t1") > F.col("__t0"))
        & (F.col("__t1") - F.col("__t0") <= F.lit(int(max_gap_secs) * _US))
    )
    t0, t1 = F.col("__t0"), F.col("__t1")
    v0, v1 = F.col("__v0"), F.col("__v1")
    dt = t1 - t0
    hh = F.lit(h)
    t_x = t0 + F.round(
        (dt * (hh - v0)).cast("double") / (v1 - v0).cast("double"), 0
    ).cast("long")
    a_lo = (
        F.when((v0 >= hh) & (v1 >= hh), t0)
        .when((v0 < hh) & (v1 >= hh), t_x)
        .when((v0 >= hh) & (v1 < hh), t0)
    )
    a_hi = (
        F.when((v0 >= hh) & (v1 >= hh), t1)
        .when((v0 < hh) & (v1 >= hh), t1)
        .when((v0 >= hh) & (v1 < hh), t_x)
    )
    seg = s.select(
        *by,
        t0.alias("__t_us"),
        t1.alias("__e_us"),
        F.coalesce(a_lo, F.lit(0)).alias("__a_lo"),
        F.coalesce(a_hi, F.lit(0)).alias("__a_hi"),
    )
    ex = _explode_buckets(seg, bucket_secs)
    bs = int(bucket_secs) * _US
    ab = F.greatest(
        F.least(F.col("__a_hi"), (F.col("__k") + 1) * F.lit(bs))
        - F.greatest(F.col("__a_lo"), F.col("__k") * F.lit(bs)),
        F.lit(0),
    )
    agg = ex.groupBy(*by, "__k").agg(
        F.sum("__overlap_us").alias("covered_us"),
        F.sum(ab).alias("above_us"),
    )
    return agg.select(
        *by,
        (F.col("__k") * F.lit(int(bucket_secs))).alias("bucket_epoch"),
        "covered_us",
        "above_us",
        (
            F.col("above_us").cast("double")
            / F.col("covered_us").cast("double")
        ).alias("above_frac"),
    )


def markov_entropy(
    events: DataFrame,
    state_col: str,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Predictability of the behavior stream in one row: the Markov
    conditional entropy H(X_t | X_{t-1}) of the compacted transition
    chain next to the stationary entropy H(X), both in nats, plus the
    information gain H(X) - H(X|prev) — "how much does knowing the
    previous state tell you about the next?" A gain near 0 says the
    first-order model (markov_transitions) adds nothing; a large gain
    justifies sequence-aware features downstream.

    Chain convention: transitions with NULL from_state (series starts)
    are excluded from BOTH entropies, so the two distributions are
    over the identical event set and the gain is >= 0 by Gibbs'
    inequality — exactly the quantity information theory promises,
    not an artifact of mismatched supports.

    Numerics: all probabilities are ratios of exact int64 counts; each
    p*ln(p) term is one shared-text expression, and the two sums FOLD
    IN KEY ORDER (sorted struct arrays / ordered aggregates), so the
    result is bit-identical in any engine — never shuffle-arrival
    float noise.

    Scale shape: state_transitions' one exchange, then a (from, to)
    hash aggregate (state-alphabet-sized, tiny), a to-marginal
    re-aggregate of that table, and two one-row folds. The raw stream
    is scanned once.

    Returns (n_transitions, h_cond_u, h_marg_u, info_gain_u) in
    1e-6 nats.
    """
    from go_muse_spark.operators.dedup import _materialize

    tr = state_transitions(events, state_col, by=by, ts_col=ts_col).where(
        F.col("from_state").isNotNull()
    )
    # the alphabet^2-sized count table feeds THREE consumers (pairs,
    # marginal, total) — materialize once or the full transition scan
    # reruns per branch (the unigram_logprob diamond)
    cnt = _materialize(
        tr.groupBy("from_state", "to_state").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    w_from = Window.partitionBy("from_state")
    pairs = cnt.select(
        "from_state",
        "to_state",
        "n",
        F.sum("n").over(w_from).alias("nf"),
    )
    term_c = (
        "(cast(n as double) / cast(nt as double))"
        " * ln(cast(n as double) / cast(nf as double))"
    )
    tot = pairs.agg(F.sum("n").alias("nt"))
    h_cond = (
        pairs.crossJoin(F.broadcast(tot))
        .withColumn("__t", F.expr(term_c))
        .agg(
            F.max("nt").alias("n_transitions"),
            (
                -F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("from_state").alias("f"),
                                F.col("to_state").alias("t"),
                                F.col("__t").alias("v"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                )
            ).alias("h_cond"),
        )
    )
    marg = cnt.groupBy("to_state").agg(F.sum("n").alias("nm"))
    term_m = (
        "(cast(nm as double) / cast(nt as double))"
        " * ln(cast(nm as double) / cast(nt as double))"
    )
    h_marg = (
        marg.crossJoin(F.broadcast(tot))
        .withColumn("__t", F.expr(term_m))
        .agg(
            (
                -F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("to_state").alias("t"),
                                F.col("__t").alias("v"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                )
            ).alias("h_marg"),
        )
    )
    return h_cond.crossJoin(h_marg).select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.round(F.col("h_cond") * 1e6, 0).cast("long").alias("h_cond_u"),
        F.round(F.col("h_marg") * 1e6, 0).cast("long").alias("h_marg_u"),
        F.round((F.col("h_marg") - F.col("h_cond")) * 1e6, 0)
        .cast("long")
        .alias("info_gain_u"),
    )


def markov_memory(
    events: DataFrame,
    state_col: str,
    by: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Memory-length test for the behavior chain: does knowing TWO
    previous states beat knowing one? Compares H(X | X_prev) against
    H(X | X_prev2, X_prev) over the compacted transition chain — the
    Box-Jenkins order question asked of a categorical stream. Both
    entropies are computed on the SAME event set (transitions with a
    full 2-step context), so gain2 = H1 - H2 >= 0 by Gibbs and a
    near-zero gain certifies the first-order model
    (markov_transitions / markov_entropy) as sufficient.

    Numerics: one alphabet^3-sized count table (materialized once)
    feeds every marginal; both entropy sums fold in key order —
    the markov_entropy discipline, bit-identical across engines.

    Scale shape: state_transitions' exchange, one lag window on the
    SAME series key (reused partitioning), a triple-count aggregate,
    then scalar folds on tiny tables.

    Returns (n_transitions, h1_u, h2_u, gain2_u) in 1e-6 nats.
    """
    from go_muse_spark.operators.dedup import _materialize

    tr = state_transitions(events, state_col, by=by, ts_col=ts_col).where(
        F.col("from_state").isNotNull()
    )
    w = Window.partitionBy(*by).orderBy("trans_idx")
    tri = tr.select(
        F.lag(F.col("from_state")).over(w).alias("f2"),
        F.col("from_state").alias("f1"),
        F.col("to_state").alias("t"),
    ).where(F.col("f2").isNotNull())
    c3 = _materialize(
        tri.groupBy("f2", "f1", "t").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c3.agg(F.sum("n").alias("nt"))
    w_ctx2 = Window.partitionBy("f2", "f1")
    h2_rows = c3.select(
        "f2", "f1", "t", "n", F.sum("n").over(w_ctx2).alias("nf")
    )
    term = (
        "(cast(n as double) / cast(nt as double))"
        " * ln(cast(n as double) / cast(nf as double))"
    )

    def fold_h(rows, keys):
        return (
            rows.crossJoin(F.broadcast(tot))
            .withColumn("__t", F.expr(term))
            .agg(
                F.max("nt").alias("n_transitions"),
                (
                    -F.aggregate(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    *[F.col(k) for k in keys],
                                    F.col("__t").alias("v"),
                                )
                            )
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x["v"],
                    )
                ).alias("h"),
            )
        )

    h2 = fold_h(h2_rows, ["f2", "f1", "t"]).select(
        "n_transitions", F.col("h").alias("h2")
    )
    c2 = c3.groupBy("f1", "t").agg(F.sum("n").alias("n"))
    w_ctx1 = Window.partitionBy("f1")
    h1_rows = c2.select(
        "f1", "t", "n", F.sum("n").over(w_ctx1).alias("nf")
    )
    h1 = fold_h(h1_rows, ["f1", "t"]).select(F.col("h").alias("h1"))
    return h2.crossJoin(h1).select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.round(F.col("h1") * 1e6, 0).cast("long").alias("h1_u"),
        F.round(F.col("h2") * 1e6, 0).cast("long").alias("h2_u"),
        F.round((F.col("h1") - F.col("h2")) * 1e6, 0)
        .cast("long")
        .alias("gain2_u"),
    )
