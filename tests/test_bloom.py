"""Bloom prefilter: no false negatives, bounded FPs, engine parity."""

import pytest

from go_muse_spark.functions.bloom import (
    bloom_build,
    bloom_contains_sql,
    bloom_positions,
    bloom_semi_filter,
)


def test_no_false_negatives(spark):
    members = [f"user{i}" for i in range(50)]
    build = spark.createDataFrame([(m,) for m in members], "k string")
    bm = bloom_build(build, "k", k=5, m_bits=4096)
    probe = spark.createDataFrame(
        [(m,) for m in members] + [(f"other{i}",) for i in range(200)],
        "k string",
    )
    passed = {
        r["k"] for r in bloom_semi_filter(probe, bm, "k", 5, 4096).collect()
    }
    assert set(members) <= passed  # every member passes
    # FP rate at 50 keys in 4096 bits, k=5: well under 10% of 200
    assert len(passed - set(members)) < 20


def test_bitmap_shape_and_determinism(spark):
    build = spark.createDataFrame([("a",), ("b",)], "k string")
    bm1 = bloom_build(build, "k", k=3, m_bits=128).collect()[0]["bm"]
    bm2 = bloom_build(build, "k", k=3, m_bits=128).collect()[0]["bm"]
    assert len(bm1) == 4 and bm1 == bm2
    # exactly <= k*n bits set
    pop = sum(bin(w & 0xFFFFFFFF).count("1") for w in bm1)
    assert 1 <= pop <= 6


def test_duckdb_replays_bitmap_and_verdicts(spark):
    import duckdb

    members = ["alpha", "beta", "gamma", "delta"]
    build = spark.createDataFrame([(m,) for m in members], "k string")
    bm = bloom_build(build, "k", k=4, m_bits=256).collect()[0]["bm"]

    con = duckdb.connect()
    rows = ", ".join(f"('{m}')" for m in members)
    from go_muse_spark.functions.text import char_hash

    h = char_hash("duck", "k")
    pos_list = bloom_positions("duck", "h", 4, 256)
    duck_bm = con.sql(
        f"""
WITH b AS (SELECT {h} AS h FROM (VALUES {rows}) t(k)),
p AS (SELECT unnest([{", ".join(pos_list)}]) AS p FROM b),
w AS (SELECT cast(p // 32 AS int) AS w,
             bit_or(cast(1 AS bigint) << (p % 32)) AS bits
      FROM p GROUP BY 1)
SELECT list(coalesce(bits, 0) ORDER BY i) FROM
  (SELECT i, bits FROM range(0, 8) r(i) LEFT JOIN w ON w.w = r.i)
"""
    ).fetchone()[0]
    assert list(duck_bm) == list(bm)

    # verdict parity on probes (members + strangers)
    probes = members + ["zeta", "eta", "theta", "iota"]
    prows = ", ".join(f"('{m}')" for m in probes)
    test = bloom_contains_sql("duck", h, 4, 256)
    duck_pass = {
        r[0]
        for r in con.sql(
            f"""
WITH bmv AS (SELECT [{", ".join(str(x) for x in bm)}] AS bm)
SELECT k FROM (VALUES {prows}) t(k), bmv WHERE {test}
"""
        ).fetchall()
    }
    probe_df = spark.createDataFrame([(m,) for m in probes], "k string")
    bm_df = bloom_build(build, "k", k=4, m_bits=256)
    spark_pass = {
        r["k"]
        for r in bloom_semi_filter(probe_df, bm_df, "k", 4, 256).collect()
    }
    assert duck_pass == spark_pass
    assert set(members) <= spark_pass


def test_position_validation(spark):
    with pytest.raises(ValueError):
        bloom_positions("spark", "h", 0, 128)
    with pytest.raises(ValueError):
        bloom_positions("spark", "h", 4, 100)  # not multiple of 32
