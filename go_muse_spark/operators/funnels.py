"""Behavioral sequence analytics over the event stream.

funnel_steps — the ordered-funnel primitive every product-analytics
engine ships (Amplitude/Mixpanel funnels, ClickHouse windowFunnel):
for each series, the earliest strictly-increasing chain of timestamps
through the given step sequence. t1 = min ts of step 1; t_{i+1} =
min ts of step i+1 AFTER t_i (the greedy earliest chain, which is the
standard semantics: greedy-earliest reaches step k iff any chain does,
by an exchange argument). Series that never hit step 1 are not funnel
entrants and are absent.

cohort_retention — the retention matrix: users bucketed by first-seen
period ("cohort"), counted by how many periods later they were active.
Computed with ONE shuffle: groupBy(user).collect_set(period) (partial
aggregation merges map-side, shuffle volume = O(distinct user-periods),
same as a distinct but without the second exchange for the min), then
cohort = array_min, offsets exploded map-side into a tiny final
aggregate where count(*) == count(distinct user) because each user
contributes each period at most once.

Scale shape: funnel_steps is k-1 inner joins + k-1 left joins ALL on
the same series key — after the first aggregate every side is hash-
partitioned on that key, so Catalyst plans co-partitioned joins and
reuses the exchange; per-step frames shrink monotonically (each level
is a subset of the previous level's users). All timestamps are integer
microseconds end-to-end: min() chains are exact, no float anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "cohort_retention"]

_US = 1_000_000


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    by: tuple[str, ...] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Earliest strictly-ordered chain through `steps` per series.

    Returns (by..., step1_us, ..., stepK_us, n_steps): epoch-microsecond
    timestamps of each reached step (NULL once the chain breaks),
    n_steps = how far the series got. One row per series that performed
    step 1 at least once.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bys = list(by)
    levels = [
        events.filter(F.col(type_col) == steps[0])
        .groupBy(*bys)
        .agg(F.min(t).alias("step1_us"))
    ]
    for i in range(1, len(steps)):
        prev = levels[-1]
        levels.append(
            events.filter(F.col(type_col) == steps[i])
            .select(*bys, t.alias("__t"))
            .join(prev.select(*bys, f"step{i}_us"), on=bys)
            .filter(F.col("__t") > F.col(f"step{i}_us"))
            .groupBy(*bys)
            .agg(F.min("__t").alias(f"step{i + 1}_us"))
        )
    out = reduce(
        lambda acc, lvl: acc.join(
            lvl.select(*bys, lvl.columns[-1]), on=bys, how="left"
        ),
        levels[1:],
        levels[0],
    )
    reached = [
        F.col(f"step{i + 1}_us").isNotNull().cast("int")
        for i in range(len(steps))
    ]
    return out.withColumn(
        "n_steps", sum(reached[1:], reached[0]).cast("int")
    )


def cohort_retention(
    events: DataFrame,
    period_secs: int = 86400,
    by: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention matrix: for each (cohort period, offset in periods),
    the number of series first seen in that cohort period that were
    active offset periods later. Offset 0 row == cohort size.

    Returns (cohort_epoch, offset, n_users) with cohort_epoch the
    period start in whole seconds.
    """
    ps = int(period_secs) * _US
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = (
        events.select(F.col(by), t.alias("__t_us"))
        .select(by, F.expr(f"__t_us div {ps}").alias("__k"))
        .groupBy(by)
        .agg(F.collect_set("__k").alias("__ks"))
        .select(
            F.array_min("__ks").alias("__cohort_k"),
            F.explode("__ks").alias("__k"),
        )
    )
    return (
        per_user.groupBy(
            (F.col("__cohort_k") * F.lit(int(period_secs))).alias(
                "cohort_epoch"
            ),
            (F.col("__k") - F.col("__cohort_k")).cast("int").alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
