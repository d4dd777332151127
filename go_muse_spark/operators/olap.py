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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dimensional_rollup"]


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
