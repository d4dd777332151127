"""Deterministic Bloom filter as dual-dialect SQL — the semi-join
prefilter for 100 TB probe sides.

The scale problem: `probe SEMI JOIN build` shuffles the full probe
side on the join key even when build is tiny and selectivity is
high. Spark's runtime row-group Bloom pushdown covers simple cases;
a pipeline that wants the filter EXPLICITLY (to reuse it across
queries, ship it to a streaming ingest, or push it below an operator
AQE can't see through) needs the filter as data: a bitmap built once
from the build side, broadcast, and applied map-side so only
plausible rows ever reach an exchange. False positives are then
removed by the real join over the (much smaller) survivor set; false
negatives never happen.

Determinism (the reason this is hand-rolled and not
`spark.util.sketch.BloomFilter`): positions come from the repo's
dual-dialect polynomial char hash (functions/text.py — pure integer
arithmetic mod 1e9+7, identical text in Spark and DuckDB) through the
minhash coefficient families, and the bitmap packs 32 bits per BIGINT
word (no sign-bit traps). Every bit, and therefore every pass/fail
verdict, replays exactly in any engine — the filter is a VALUE, not
an opaque sketch object.

Scale shape: build = one explode of k positions per build row + ONE
hash aggregate over <= m/32 words (partial agg collapses each task to
word count first) + a 1-row assembly; probe = map-side bit tests
against the broadcast array — zero probe-side shuffle. m_bits is
caller-sized: FP rate ~ (1 - e^{-kn/m})^k; 10 bits/key + k=5 gives
<1%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions.text import P, char_hash, minhash_coeffs

__all__ = [
    "bloom_positions",
    "bloom_contains_sql",
    "bloom_build",
    "bloom_semi_filter",
]


def _shl1(dialect: str, b: str) -> str:
    if dialect == "spark":
        return f"shiftleft(cast(1 as bigint), {b})"
    if dialect == "duck":
        return f"(cast(1 as bigint) << ({b}))"
    raise ValueError(dialect)


def bloom_positions(
    dialect: str, h_src: str, k: int, m_bits: int
) -> list[str]:
    """k bit positions for a precomputed key hash column/expression
    ``h_src`` (char_hash output, already mod P): family i maps to
    ((a_i*h + b_i) % P) % m_bits. Pure integer text, both dialects."""
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    if m_bits < 32 or m_bits % 32 != 0:
        raise ValueError("m_bits must be a positive multiple of 32")
    return [
        f"((({a} * ({h_src}) + {b}) % {P}) % {m_bits})"
        for a, b in minhash_coeffs(k)
    ]


def bloom_contains_sql(
    dialect: str, h_src: str, k: int, m_bits: int, bm_col: str = "bm"
) -> str:
    """Boolean SQL: all k positions of ``h_src`` are set in the packed
    word array ``bm_col`` (1-based element_at in both dialects)."""
    el, dv = (
        ("element_at", "div") if dialect == "spark" else ("list_extract", "//")
    )
    tests = []
    for pos in bloom_positions(dialect, h_src, k, m_bits):
        word = f"{el}({bm_col}, cast(({pos}) {dv} 32 as int) + 1)"
        bit = _shl1(dialect, f"({pos}) % 32")
        tests.append(f"(({word} & {bit}) != 0)")
    return "(" + " AND ".join(tests) + ")"


def bloom_build(
    build: DataFrame, key_sql: str, k: int = 5, m_bits: int = 4096
) -> DataFrame:
    """ONE-row DataFrame (bm: array<bigint>) — the packed bitmap of
    the build side's keys. ``key_sql`` is a STRING-typed SQL
    expression over build's columns (hashed with the portable char
    hash). Absent words materialize as 0 so the array always has
    exactly m_bits/32 entries."""
    n_words = m_bits // 32
    h = F.expr(char_hash("spark", key_sql)).alias("__h")
    pos = build.select(h).select(
        F.explode(
            F.array(
                *[
                    F.expr(p)
                    for p in bloom_positions("spark", "__h", k, m_bits)
                ]
            )
        ).alias("__p")
    )
    words = pos.groupBy(
        F.expr("cast(__p div 32 as int)").alias("__w")
    ).agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), __p % 32))").alias(
            "__bits"
        )
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__w"), F.col("__bits")))
        ).alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(__m, i), cast(0 as bigint)))"
        ).alias("bm")
    )


def bloom_semi_filter(
    probe: DataFrame,
    bloom: DataFrame,
    key_sql: str,
    k: int = 5,
    m_bits: int = 4096,
) -> DataFrame:
    """probe rows whose key PLAUSIBLY appears in the bloomed build set
    (guaranteed superset of the true semi-join; FP rate set by k and
    m_bits). The bitmap broadcasts; the test is a map-side scalar —
    no probe-side shuffle. Follow with the exact join on survivors
    when exactness matters; the bloom's job is to make that join's
    input small."""
    h = F.expr(char_hash("spark", key_sql)).alias("__h")
    test = bloom_contains_sql("spark", "__h", k, m_bits)
    return (
        probe.crossJoin(F.broadcast(bloom))
        .withColumn("__h", h)
        .where(F.expr(test))
        .drop("__h", "bm")
    )
