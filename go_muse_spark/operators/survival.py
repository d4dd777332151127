"""Kaplan-Meier survival analysis over session / conversation lifetimes.

"How long do conversations live?" answered properly: the naive
histogram of durations is BIASED at the observation edge — a session
still open when the corpus ends has an unknown lifetime, and dropping
it (or counting it as ended) shortens every percentile. The KM
estimator is the standard fix: censored subjects stay in the risk set
up to their observed duration and then leave without counting as an
end, giving the unbiased survival curve S(t) every retention /
engagement analysis actually wants (product-limit estimator;
Kaplan & Meier 1958 — public-domain method).

    S(t) = prod over event durations t_i <= t of (1 - d_i / n_i)

with d_i = ended-at-t_i subjects, n_i = at-risk (duration >= t_i,
censored or not).

Numerics + determinism: d_i and n_i are exact int64 counts; the
product is evaluated as exp(cumulative sum of ln((n_i - d_i)/n_i))
where BOTH engines accumulate the window sum in duration order over
identical doubles — same sequential left-associated chain, no
shuffle-order float noise. Once a step has d_i = n_i (risk set dies
out), survival is pinned to exactly 0 by a running flag rather than
ln(0) arithmetic.

Scale shape: subjects arrive as one row each (the caller's sessionize
+ per-session aggregate — one exchange there); the grid aggregate
groups by QUANTIZED duration, so the final single-partition ordered
pass runs over at most (max duration / quantum) rows — thousands,
bounded by the clock, NOT by subject cardinality. That bound is the
reason the API takes pre-quantized durations: a microsecond grid over
10^9 sessions would funnel 10^9 rows through one task; a minute grid
never exceeds ~43k rows for a 30-day corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["survival_km"]


def survival_km(
    subjects: DataFrame,
    dur_col: str,
    censored_col: str,
) -> DataFrame:
    """Product-limit survival curve over per-subject rows.

    ``subjects``: one row per subject with an integer (quantized)
    duration and a boolean censoring flag (TRUE = still alive at the
    observation edge; leaves the risk set without ending).

    Returns one row per distinct EVENT duration (>= 1 ending there):
    (t, n_risk, n_events, n_censored, surv) with surv = S(t) after
    the deaths at t. Censor-only durations don't emit rows (standard
    KM: the curve only steps at events) but still shrink later risk
    sets.
    """
    t = F.col(dur_col).cast("long")
    cen = F.col(censored_col).cast("boolean")
    grid = (
        subjects.select(t.alias("t"), cen.alias("__c"))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("__all"),
            F.sum(F.when(~F.col("__c"), 1).otherwise(0)).alias(
                "n_events"
            ),
            F.sum(F.when(F.col("__c"), 1).otherwise(0)).alias(
                "n_censored"
            ),
        )
    )
    # at-risk = subjects with duration >= t: reverse running sum over
    # the quantized grid (single partition by design — see module
    # docstring for why this is bounded)
    w_risk = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risky = grid.select(
        "t",
        "n_events",
        "n_censored",
        F.sum("__all").over(w_risk).alias("n_risk"),
    )
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    dead = F.max(
        (F.col("n_events") >= F.col("n_risk")).cast("int")
    ).over(w_cum)
    curve = risky.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(term).over(w_cum)))
        .alias("surv"),
    )
    return curve.where(F.col("n_events") > 0)
