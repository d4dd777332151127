"""Data-quality gate: rule-driven validation profile over a table.

A 100 TB transcript ingest cannot afford a human eyeballing samples;
it needs a machine-checkable CONTRACT evaluated on every batch before
the rollup tiers consume it (the Deequ / Great Expectations role,
re-expressed as three Spark aggregation shapes). The reference engine
trusts its inputs (`muse.go` constructs Series from in-memory floats);
an ingest pipeline cannot, so this module is engine-side scope on top
of the reference's data model rather than a ported operator.

Three check families, one shared output contract
``(check string, n_rows long, n_viol long, ppm long)``:

- ``dq_profile``: N row-local predicates evaluated in ONE full-scan
  aggregate — each check is a SQL boolean "violation" expression, all
  folded into a single map-side-combined aggregate (one job, one
  final 1-row reduce, zero shuffles of the data itself) and unpivoted
  to one row per check. Adding a 20th check costs one more column in
  the same pass, not a 20th scan.
- ``dq_unique``: duplicate-key audit — ONE hash aggregate on the key
  (partial agg kills the shuffle: only distinct keys travel), a
  second tiny reduce folds group counts into (extra-rows, ppm).
  Mirrors Group.Add's duplicate-UID rejection (reference muse.go:
  Add returns an error on duplicate labels.ID) as a bulk audit.
- ``dq_sequence``: per-partition order check — within each series
  (``by``), ordered by ``order_col``, count rows whose ``ts_col``
  runs BACKWARDS (a lag() window, one exchange on the series key).
  This is the per-turn ordering invariant of the transcript contract
  ("text equality under stable (conv_id, turn_idx) ordering") made
  executable: a regression here means turn order and time order
  disagree and every downstream as-of join silently degrades.

Numeric contract: counts are exact int64; ppm = n_viol * 1_000_000
DIV n_rows — integer division, no doubles anywhere, so any engine
replays every output bit.

Scale shape: dq_profile is one scan with no data shuffle; dq_unique
shuffles only distinct keys; dq_sequence is one window exchange on
the series key (co-partitioned with every other per-series operator,
so AQE reuses the exchange when fused into an ingest plan). All three
return tiny DataFrames (rows = number of checks) that union cheaply
into one gate report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["dq_profile", "dq_unique", "dq_sequence", "dq_report", "schema_diff"]


_OUT_COLS = ("check", "n_rows", "n_viol", "ppm")


def _finish(df: DataFrame) -> DataFrame:
    """Shared output contract: exact integer ppm, stable column set."""
    return df.select(
        "check",
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.col("n_viol"), F.lit(0)).cast("long").alias("n_viol"),
        F.when(F.col("n_rows") > 0, (F.col("n_viol") * F.lit(1_000_000)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__num"),
    ).select(
        "check",
        "n_rows",
        "n_viol",
        F.when(
            F.col("n_rows") > 0,
            F.expr("__num div n_rows"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ppm"),
    )


def _flag_aggs(names_exprs, first_alias="__n"):
    """Shared one-pass aggregate: row count + one null-proof violation
    sum per predicate (NULL predicate results count as OK)."""
    return [F.count(F.lit(1)).alias(first_alias)] + [
        F.sum(
            F.when(F.expr(expr) == F.lit(True), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias(f"__v{i}")
        for i, expr in enumerate(names_exprs)
    ]


def _explode_checks(one, names, count_col="__n", first_sum=0):
    """Unpivot a 1-row aggregate of flag sums into the output rows,
    one per check name; __v<first_sum+i> pairs with names[i]."""
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(count_col).alias("n_rows"),
                        F.coalesce(
                            F.col(f"__v{first_sum + i}"), F.lit(0)
                        ).alias("n_viol"),
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("__c")
    ).select("__c.check", "__c.n_rows", "__c.n_viol")


def dq_profile(
    df: DataFrame, checks: dict[str, str]
) -> DataFrame:
    """Evaluate row-local violation predicates in ONE aggregate pass.

    ``checks`` maps check name -> SQL boolean expression that is TRUE
    when the row VIOLATES the rule (e.g. ``"value IS NULL"``,
    ``"event_type NOT IN ('click','view')"``). NULL predicate results
    count as non-violations (unknown is not proof of breakage; write
    an explicit IS NULL check when absence itself is the violation).

    Returns one row per check: (check, n_rows, n_viol, ppm), in the
    iteration order of ``checks``.
    """
    if not checks:
        raise ValueError("need at least one check")
    one = df.agg(*_flag_aggs(checks.values()))
    return _finish(_explode_checks(one, list(checks)))


def dq_unique(
    df: DataFrame, keys: tuple[str, ...], check: str = "dup_key"
) -> DataFrame:
    """Duplicate-key audit: n_viol = rows beyond the first per key
    (so a clean table scores 0, a fully-duplicated pair scores 1 per
    pair — the count of rows a dedup pass would drop). NULL key parts
    group together, matching groupBy semantics.
    """
    if not keys:
        raise ValueError("need at least one key column")
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("__c")
    )
    tot = per_key.agg(
        F.sum("__c").alias("n_rows"),
        F.sum(F.col("__c") - F.lit(1)).alias("n_viol"),
    ).select(F.lit(check).alias("check"), "n_rows", "n_viol")
    return _finish(tot)


def dq_sequence(
    df: DataFrame,
    by: tuple[str, ...],
    order_col: str,
    ts_col: str = "ts",
    check: str = "ts_order_regression",
    extra_checks: dict[str, str] | None = None,
) -> DataFrame:
    """Count rows whose event time runs backwards relative to the
    declared ordering: within each ``by`` series ordered by
    ``order_col``, a violation is ``ts < lag(ts)`` (strict — equal
    timestamps are fine; ties in time at distinct sequence positions
    are legal in the transcript contract). First row per series has
    no predecessor and cannot violate.

    ``extra_checks`` (dq_profile-style row-local predicates) ride the
    SAME pass: their flags are projected next to the lag window and
    fold into the same one-row aggregate — at 100 TB the scan is the
    dominant cost, so a gate that needs both families should pay for
    it once, not once per family. Output rows: the sequence check
    first, then the extras in dict order.
    """
    extra_checks = extra_checks or {}
    w = Window.partitionBy(*by).orderBy(F.col(order_col))
    prev = F.lag(F.col(ts_col)).over(w)
    seq_flag = (
        F.when(
            prev.isNotNull() & (F.col(ts_col) < prev), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("__s")
    )
    flagged = df.select(
        seq_flag,
        *[
            F.when(F.expr(expr) == F.lit(True), F.lit(1))
            .otherwise(F.lit(0))
            .alias(f"__v{i + 1}")
            for i, expr in enumerate(extra_checks.values())
        ],
    )
    one = flagged.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__s").alias("__v0"),
        *[
            F.sum(f"__v{i + 1}").alias(f"__v{i + 1}")
            for i in range(len(extra_checks))
        ],
    )
    names = [check, *extra_checks.keys()]
    return _finish(_explode_checks(one, names))


def dq_report(parts: list[DataFrame]) -> DataFrame:
    """Union any mix of dq_* outputs into one gate report (they all
    share the output contract, so this is a plain unionByName of tiny
    frames)."""
    if not parts:
        raise ValueError("need at least one part")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def schema_diff(old, new) -> list[tuple[str, str, str | None, str | None]]:
    """Schema-evolution audit between two table schemas (StructType or
    DDL string): the ingest gate's metadata half — a column appearing,
    vanishing, or changing type is a contract change that must be
    DECIDED (evolve the tier / reject the batch), never silently
    absorbed by a cast. Position changes are ignored (columnar formats
    address by name); nullability tightening is reported because a
    writer that starts emitting NULLs breaks exact-integer operators
    downstream.

    Returns [(change, column, old_type, new_type)] with change in
    {'added', 'dropped', 'type_changed', 'now_nullable'}, ordered by
    column name — deterministic, driver-side, no Spark job.
    """
    from pyspark.sql.types import StructType, _parse_datatype_string

    def fields(s):
        if isinstance(s, str):
            s = _parse_datatype_string(s)
        if not isinstance(s, StructType):
            raise ValueError("need a StructType or DDL struct string")
        return {f.name: f for f in s.fields}

    o, n = fields(old), fields(new)
    out: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(o.keys() | n.keys()):
        fo, fn = o.get(name), n.get(name)
        if fo is None:
            out.append(("added", name, None, fn.dataType.simpleString()))
        elif fn is None:
            out.append(("dropped", name, fo.dataType.simpleString(), None))
        else:
            if fo.dataType != fn.dataType:
                out.append(
                    (
                        "type_changed",
                        name,
                        fo.dataType.simpleString(),
                        fn.dataType.simpleString(),
                    )
                )
            if (not fo.nullable) and fn.nullable:
                out.append(
                    (
                        "now_nullable",
                        name,
                        fo.dataType.simpleString(),
                        fn.dataType.simpleString(),
                    )
                )
    return out
