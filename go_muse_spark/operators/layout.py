"""Z-order (Morton) file layout + data-skipping audit.

At 10^12 turns the tier tables are read through file-level min/max
statistics (parquet row-group stats / Iceberg manifest ranges): a file
whose [min, max] box misses the predicate never leaves object
storage. A layout sorted by time alone prunes time predicates and
NOTHING else — a (user, hour-range) probe still touches every file in
the range. Interleaving the bits of BOTH dimensions into one Morton
key and range-splitting on it gives every file a tight box in BOTH
dimensions (Delta/Iceberg `ZORDER BY` / `sort_order(z-order)`); this
module computes the key, simulates the file split, and AUDITS the
skipping — "how many files does this probe box touch under each
layout?" — as data, so the claim is measurable instead of folklore.

The Morton key is emitted as dialect-portable PURE-ARITHMETIC SQL
text (bit i extracted as (x div 2^i) % 2 — no engine bit-op builtins,
whose signatures differ), the repo's shared-expression-text trick: the
Spark plan and a DuckDB oracle evaluate the IDENTICAL integer tree,
so every z-value, file id, and pruning verdict replays bit-for-bit.

File model: fixed-width ranges of the sort key (file_id = key div
width). A real writer splits by equal ROW counts after a range
exchange; fixed-width keeps the audit deterministic and engine-free
while preserving exactly the property under test (locality of the
sort key). The audit generalizes unchanged.

Scale shape: z-value is a per-row scalar projection (map-side, codegen
int arithmetic); the audit is one hash aggregate on file_id. Nothing
here shuffles more than the one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_sql", "interleave_width", "layout_audit", "skew_advisor"]


def _div(dialect: str) -> str:
    if dialect == "spark":
        return "div"
    if dialect == "duck":
        return "//"
    raise ValueError(dialect)


def zorder_sql(dialect: str, a: str, b: str, bits: int = 16) -> str:
    """Morton interleave of two non-negative ints as portable SQL
    arithmetic: bit i of ``a`` lands at position 2i, of ``b`` at
    2i+1. ``bits`` bits per dimension (values must fit — caller
    clamps/buckets first). Left-associated sum, one term per bit."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    dv = _div(dialect)
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) {dv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({b}) {dv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def interleave_width(bits: int, n_files: int) -> int:
    """Fixed range width so the 2*bits-bit key space splits into
    ``n_files`` files (the last file absorbs the remainder)."""
    space = 1 << (2 * bits)
    if not 1 <= n_files <= space:
        raise ValueError("n_files out of range")
    return (space + n_files - 1) // n_files


def layout_audit(
    df: DataFrame,
    a_col: str,
    b_col: str,
    probe: tuple[int, int, int, int],
    bits: int = 16,
    n_files: int = 64,
) -> DataFrame:
    """Per-file min/max boxes + pruning verdict for a probe box under
    TWO layouts of the same rows: 'z' (Morton of (a, b)) and 'linear'
    (sorted by b alone — the time-sorted baseline). ``probe`` =
    (a_lo, a_hi, b_lo, b_hi), closed ranges. A file prunes when its
    box cannot intersect the probe. Returns
    (layout, file_id, n_rows, min_a, max_a, min_b, max_b, pruned).

    The pruned column is decided from the AGGREGATED min/max only —
    the same information a manifest holds — never from row data.

    ONE scan audits both layouts: each row explodes into its two
    (layout, file_id) assignments map-side, and the single hash
    aggregate's map-side partials shrink the shuffle to at most
    2 x n_files rows per task — a union of two per-layout jobs would
    read the table twice for the same answer.
    """
    a_lo, a_hi, b_lo, b_hi = (int(x) for x in probe)
    z = F.expr(zorder_sql("spark", a_col, b_col, bits))
    # one shared width: both keys live in the same 2*bits space, so
    # both layouts split into the same file count
    w = interleave_width(bits, n_files)
    # linear baseline: key = b scaled into the same 2*bits space so
    # both layouts split into comparable file counts
    lin_key = F.expr(f"cast({b_col} as bigint) * {1 << bits}")

    both = df.select(
        F.col(a_col).alias("__a"),
        F.col(b_col).alias("__b"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("z").alias("layout"), z.alias("__k")
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    lin_key.alias("__k"),
                ),
            )
        ).alias("__l"),
    ).select("__a", "__b", "__l.layout", "__l.__k")
    per_file = both.groupBy(
        "layout",
        F.expr(f"__k div {w}").cast("long").alias("file_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__a").cast("long").alias("min_a"),
        F.max("__a").cast("long").alias("max_a"),
        F.min("__b").cast("long").alias("min_b"),
        F.max("__b").cast("long").alias("max_b"),
    )
    pruned = (
        (F.col("max_a") < F.lit(a_lo))
        | (F.col("min_a") > F.lit(a_hi))
        | (F.col("max_b") < F.lit(b_lo))
        | (F.col("min_b") > F.lit(b_hi))
    ).cast("int")
    return per_file.select(
        "layout",
        "file_id",
        "n_rows",
        "min_a",
        "max_a",
        "min_b",
        "max_b",
        pruned.alias("pruned"),
    )


def layout_audit_sql(
    table_sql: str,
    a_col: str,
    b_col: str,
    probe: tuple[int, int, int, int],
    bits: int = 16,
    n_files: int = 64,
) -> str:
    """DuckDB oracle for layout_audit over ``table_sql`` (a relation
    producing the same a/b columns): the IDENTICAL arithmetic text."""
    a_lo, a_hi, b_lo, b_hi = (int(x) for x in probe)
    z = zorder_sql("duck", a_col, b_col, bits)
    width = interleave_width(bits, n_files)
    lin_key = f"cast({b_col} AS bigint) * {1 << bits}"

    def one(layout: str, key: str, w: int) -> str:
        return f"""
SELECT '{layout}' AS layout,
       cast(({key}) // {w} AS bigint) AS file_id,
       cast(count(*) AS bigint) AS n_rows,
       cast(min({a_col}) AS bigint) AS min_a,
       cast(max({a_col}) AS bigint) AS max_a,
       cast(min({b_col}) AS bigint) AS min_b,
       cast(max({b_col}) AS bigint) AS max_b,
       cast(max({a_col}) < {a_lo} OR min({a_col}) > {a_hi}
         OR max({b_col}) < {b_lo} OR min({b_col}) > {b_hi} AS int)
         AS pruned
FROM src GROUP BY 2"""

    return (
        f"WITH src AS ({table_sql})\n"
        + one("z", z, width)
        + "\nUNION ALL\n"
        + one("linear", lin_key, width)
    )


def skew_advisor(
    df: DataFrame,
    key_cols: tuple[str, ...],
    target_rows_per_task: int,
    top_k: int = 20,
) -> DataFrame:
    """Partition-skew profile + salt plan for a shuffle key: the top-k
    heaviest keys with their row share and the SALT FACTOR that caps
    any single (key, salt) partition at ``target_rows_per_task`` rows
    — the number the muse search path (conv_id-salted scoring) and
    every per-series window operator need BEFORE the hot conversation
    melts one task. The north-rule skew story, emitted as data from
    the data instead of hand-tuned.

        salt_factor = ceil(n_key / target)   (1 for well-behaved keys)

    All integer: counts exact, share in ppm by integer division,
    ceil as (n + target - 1) div target.

    Scale shape: ONE hash aggregate on the key (map-side partials
    shrink each task to its distinct keys), then TakeOrdered top-k —
    no full sort, no second pass. The advisor output is tiny and
    broadcastable straight into a salting expression.

    Returns (key..., n_rows, share_ppm, salt_factor), heaviest first,
    ties to key ascending.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    if target_rows_per_task < 1:
        raise ValueError("target_rows_per_task must be >= 1")
    per_key = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = per_key.agg(F.sum("n_rows").alias("__tot"))
    t = int(target_rows_per_task)
    scored = per_key.crossJoin(F.broadcast(tot)).select(
        *key_cols,
        "n_rows",
        F.expr("(n_rows * 1000000) div __tot").alias("share_ppm"),
        F.expr(f"(n_rows + {t - 1}) div {t}").alias("salt_factor"),
    )
    return scored.orderBy(
        F.col("n_rows").desc(), *[F.col(k).asc() for k in key_cols]
    ).limit(int(top_k))
