"""Z-order layout: Morton key correctness, pruning beats linear."""

import pytest

from go_muse_spark.operators.layout import (
    interleave_width,
    layout_audit,
    zorder_sql,
)


def _morton(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_sql_matches_bitwise_reference(spark):
    import duckdb

    vals = [(0, 0), (1, 0), (0, 1), (3, 5), (12, 9), (255, 255), (200, 7)]
    expr_s = zorder_sql("spark", "a", "b", 8)
    expr_d = zorder_sql("duck", "a", "b", 8)
    df = spark.createDataFrame(vals, "a int, b int")
    got_s = {
        (r["a"], r["b"]): r["z"]
        for r in df.selectExpr("a", "b", f"{expr_s} as z").collect()
    }
    con = duckdb.connect()
    rows = ", ".join(f"({a}, {b})" for a, b in vals)
    got_d = {
        (a, b): z
        for a, b, z in con.sql(
            f"SELECT a, b, {expr_d} AS z FROM (VALUES {rows}) t(a, b)"
        ).fetchall()
    }
    for a, b in vals:
        ref = _morton(a, b, 8)
        assert got_s[(a, b)] == ref, (a, b)
        assert got_d[(a, b)] == ref, (a, b)


def test_interleave_width_covers_space(spark):
    assert interleave_width(8, 64) == (1 << 16) // 64
    # non-dividing file count still covers the space
    w = interleave_width(8, 7)
    assert w * 7 >= (1 << 16)


def test_z_layout_prunes_more_on_2d_probe(spark):
    # uniform 64x64 grid of (a, b); probe a small box in BOTH dims
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = layout_audit(df, "a", "b", (8, 15, 8, 15), bits=6, n_files=16)
    pdf = out.toPandas()
    z_pruned = pdf[(pdf.layout == "z") & (pdf.pruned == 1)].n_rows.sum()
    lin_pruned = pdf[(pdf.layout == "linear") & (pdf.pruned == 1)].n_rows.sum()
    # every row lands in exactly one file per layout
    assert pdf[pdf.layout == "z"].n_rows.sum() == 4096
    assert pdf[pdf.layout == "linear"].n_rows.sum() == 4096
    # z-order skips data on the a-dimension too; linear (b-sorted)
    # can only skip on b
    assert z_pruned > lin_pruned
    # correctness: no pruned file may contain a probe-box row
    probe = lambda r: 8 <= r <= 15
    bad = pdf[
        (pdf.pruned == 1)
        & (pdf.max_a >= 8) & (pdf.min_a <= 15)
        & (pdf.max_b >= 8) & (pdf.min_b <= 15)
    ]
    assert bad.empty


def test_zorder_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        zorder_sql("spark", "a", "b", 0)
    with pytest.raises(ValueError):
        zorder_sql("mysql", "a", "b", 8)
