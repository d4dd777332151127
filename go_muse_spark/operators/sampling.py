"""Deterministic stratified sampling — the corpus down-sampling stage
of a training-data pipeline (e.g. cap head languages, keep all of a
tail language), built so the SAME rows are selected on every run, on
any cluster, at any partitioning.

Spark-first shape: a map-only filter — zero shuffles, no RNG, no
sampleBy (whose Bernoulli draws are partitioning-dependent). Each row's
fate is a pure function of its CONTENT: keep iff
``hash(key) % denom < rate[stratum] * denom``, with the polynomial
mod-P char hash from functions/text.py (dual-dialect, so the DuckDB
oracle replays the selection bit-for-bit). Content-keyed sampling is
also dedup-consistent: byte-identical duplicates land on the same side
of the cut, so sampling and dedup commute.

At 100 TB this is the only sampling shape that survives: per-executor
RNG sampling changes the selected set whenever the file split layout
changes, while hash-mod selection is reproducible from the data alone
and costs one scan with the filter evaluated in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_muse_spark.functions import text as X

__all__ = [
    "stratified_sample",
    "sample_rates_sql",
    "split_assign",
    "split_assign_sql",
    "pack_sequences",
    "mixture_sample",
    "priority_sample",
    "priority_sql",
]


def _keep_cond(
    bucket: Column, strata_col: str, rates: dict[str, float], denom: int
) -> Column:
    cond = F.lit(False)
    for stratum, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0,1]: {rate}")
        thr = int(round(rate * denom))
        cond = cond | ((F.col(strata_col) == stratum) & (bucket < thr))
    return cond


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_sql: str | None = None,
    denom: int = 1000,
) -> DataFrame:
    """Keep each row iff ``hash(key) % denom < round(rate * denom)`` for
    its stratum's rate; strata absent from ``rates`` (or NULL) are
    dropped (rate 0). ``key_sql`` is a Spark SQL expression for the
    sampling key hash domain — default: the dual-dialect polynomial
    char hash of ``text``. Rates are quantized to 1/denom.

    Deterministic, partitioning-independent, map-only (no exchange:
    the filter evaluates inside the scan stage's codegen).
    """
    if key_sql is None:
        key_sql = X.char_hash("spark", "text")
    bucket = F.expr(key_sql) % F.lit(denom)
    return df.filter(_keep_cond(bucket, strata_col, rates, denom))


def _split_thresholds(
    fractions: dict[str, float], denom: int
) -> list[tuple[str, int]]:
    """(split_name, exclusive upper bucket bound) in insertion order;
    validates fractions sum to <= 1 after 1/denom quantization."""
    out, acc = [], 0
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1]: {frac}")
        width = int(round(frac * denom))
        if frac > 0 and width == 0:
            raise ValueError(
                f"fraction for {name!r} ({frac}) rounds to zero buckets at "
                f"denom={denom}; raise denom or the fraction"
            )
        acc += width
        out.append((name, acc))
    if acc > denom:
        raise ValueError(f"fractions sum to {acc}/{denom} > 1")
    return out


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    key_sql: str | None = None,
    denom: int = 10000,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: consecutive hash-bucket
    ranges of ``hash(key) % denom``, one range per split in dict order,
    rows past the last range get NULL (held out). Same guarantees as
    stratified_sample — content-keyed, partitioning-independent,
    map-only, dedup-consistent (duplicates land in the SAME split, so
    near-dup leakage across train/test can't come from the splitter) —
    which is exactly what a training pipeline needs from its splits.
    """
    if key_sql is None:
        key_sql = X.char_hash("spark", "text")
    bucket = F.expr(key_sql) % F.lit(denom)
    expr = F.lit(None).cast("string")
    # build the CASE from the last range backwards so earlier (lower)
    # ranges take precedence
    for name, ub in reversed(_split_thresholds(fractions, denom)):
        expr = F.when(bucket < ub, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_assign_sql(
    fractions: dict[str, float], denom: int = 10000
) -> str:
    """DuckDB-dialect CASE expression replaying split_assign."""
    bucket = f"(({X.char_hash('duck', 'text')}) % {denom})"
    whens = "".join(
        f" WHEN {bucket} < {ub} THEN '{name}'"
        for name, ub in _split_thresholds(fractions, denom)
    )
    return f"CASE{whens} ELSE NULL END"


def sample_rates_sql(
    rates: dict[str, float], strata_col: str = "lang", denom: int = 1000
) -> str:
    """The DuckDB-dialect WHERE predicate replaying stratified_sample's
    selection (for oracle SQL construction)."""
    bucket = f"({X.char_hash('duck', 'text')}) % {denom}"
    parts = [
        f"({strata_col} = '{s}' AND {bucket} < {int(round(r * denom))})"
        for s, r in sorted(rates.items())
    ]
    return "(" + " OR ".join(parts) + ")"


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_col: str,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the items of each ``by``
    shard end to end in ``order_col`` order and cut the resulting token
    stream every ``budget`` tokens — the packing a training loader does
    when it concatenates documents and slices fixed-length context
    windows. An item is assigned to the chunk containing its FIRST
    token:

        batch_id = cum_weight_before_this_item div budget

    which is a pure prefix-sum bucketing — deterministic, one
    expression, no sequential bin-packing recursion (first-fit packing
    is inherently serial; this is the parallelizable variant actually
    used at scale, at the cost of items straddling chunk boundaries).

    Scale shape: ONE exchange on the shard key + one window prefix sum;
    the shard key (e.g. doc_id mod K) bounds each partition's sort.
    Weights must be non-negative; order ties are broken by the weight
    so the prefix sum is a deterministic function of the data.

    Returns the input plus batch_id (long).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = F.col(weight_col).cast("long")
    win = (
        Window.partitionBy(*by)
        .orderBy(F.col(order_col), w)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(w).over(win) - w
    # exact integer division: subtract the remainder first so the
    # double quotient is of an exact multiple (a plain double divide
    # can round UP across a chunk boundary at large prefix sums)
    batch = (
        (before - before % F.lit(int(budget))) / F.lit(int(budget))
    ).cast("long")
    return df.withColumn("batch_id", batch)


def priority_sql(
    dialect: str, weight_sql: str, key_sql: str | None = None
) -> str:
    """The priority expression q = w / u with u = (hash(key)+1)/(P+1),
    in either dialect. Both divisions are IEEE-754 correctly-rounded
    operations on identical operands, so Spark and DuckDB produce the
    SAME double bit pattern — the selection (and the reported priority)
    is value-verifiable, not merely statistically similar."""
    if key_sql is None:
        key_sql = X.char_hash(dialect, "text")
    u = f"(cast(({key_sql}) + 1 AS double) / {X.P + 1}.0)"
    return f"(cast({weight_sql} AS double) / {u})"


def priority_sample(
    df: DataFrame,
    weight_sql: str,
    k: int,
    by: tuple[str, ...] = (),
    key_sql: str | None = None,
    order_col: str = "doc_id",
) -> DataFrame:
    """Weight-aware deterministic sampling via PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM 2007): each row gets priority
    q = w / u where u = (hash(content)+1)/(P+1) stands in for the
    uniform draw; keep the k largest-priority rows (per ``by`` group
    if given). High-weight rows are proportionally more likely to be
    kept, yet the selection is a pure function of row content — same
    reproducibility contract as stratified_sample (re-runs, cluster
    moves, and repartitions select the SAME rows; exact duplicates
    travel together).

    This is the "sample the corpus by quality score" stage of a
    training-data pipeline, done without RNG: w = a quality/importance
    weight, and the kept set is auditable because every row's priority
    is recomputable from the row alone.

    Scale shape: grouped mode is one exchange on the group key + a
    per-partition rank (row_number over [q desc, order_col]); global
    mode (by=()) is orderBy().limit(k) — Spark's
    TakeOrderedAndProject, a per-partition k-heap + driver merge, no
    full sort. Returns the input plus (priority double, rk int).

    Weights must be strictly positive (q would be 0/inf otherwise).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    q = F.expr(priority_sql("spark", weight_sql, key_sql))
    tagged = df.withColumn("priority", q)
    if by:
        w = Window.partitionBy(*by).orderBy(
            F.col("priority").desc(), F.col(order_col).asc()
        )
        return tagged.withColumn(
            "rk", F.row_number().over(w).cast("int")
        ).where(F.col("rk") <= k)
    top = tagged.orderBy(
        F.col("priority").desc(), F.col(order_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("priority").desc(), F.col(order_col).asc())
    # the single-partition window sees only the k surviving rows
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


def mixture_sample(
    docs: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    denom: int = 10000,
    key_sql: str | None = None,
) -> DataFrame:
    """Balance the corpus mixture: downsample every stratum to the
    TOKEN mass of the smallest one — the pretraining-mix step that stops
    one crawl source from dominating the token budget. Keep rates are
    derived IN-PLAN (rate_s = min_tokens / tokens_s), so there is no
    driver round-trip and the operator re-derives correct rates on any
    input; selection is the same content-keyed hash-threshold rule as
    stratified_sample (deterministic, partitioning-independent,
    dedup-consistent).

    Plan shape: one tiny hash aggregate (O(strata) rows) feeds a
    BROADCAST join back over the scan — the corpus side never shuffles
    and the filter evaluates inside the scan stage. Exactly the
    seasonal_anomaly profile-join shape, applied to sampling.

    Numerics: token totals are exact int64; rate = min/T is one double
    division of identical operands; the threshold round() sees the same
    double in any engine. NULL strata are dropped BEFORE the rate
    derivation — otherwise a handful of stray unlabeled docs would set
    the global minimum token mass and over-downsample every real
    stratum while themselves vanishing in the join.

    Returns the kept rows plus (n_toks, keep_thr) for auditability.
    """
    if key_sql is None:
        key_sql = X.char_hash("spark", text_col)
    n_toks = F.size(F.split(F.col(text_col), " "))
    base = docs.filter(F.col(strata_col).isNotNull()).withColumn(
        "n_toks", n_toks.cast("long")
    )
    tot = base.groupBy(strata_col).agg(F.sum("n_toks").alias("__T"))
    mn = tot.agg(F.min("__T").alias("__mn"))
    rates = tot.crossJoin(F.broadcast(mn)).select(
        strata_col,
        F.round(F.col("__mn").cast("double") / F.col("__T") * denom, 0)
        .cast("long")
        .alias("keep_thr"),
    )
    bucket = F.expr(key_sql) % F.lit(denom)
    return (
        base.join(F.broadcast(rates), strata_col)
        .filter(bucket < F.col("keep_thr"))
    )
