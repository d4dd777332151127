"""Regression pins for the DuckDB float32 arithmetic trap.

DuckDB evaluates FLOAT * DOUBLE in float32 (the product's typeof is
FLOAT), which once desynchronized the oracle's quantized embedding
grid from numpy's double path by one integer step on a boundary value
(-0.1319035f * 1e6 reads exactly -131903.5 in float32 vs the true
-131903.49936...). These tests pin the widened expressions so the fix
cannot silently regress."""

import duckdb
import numpy as np

from go_muse_spark.functions import text as X

# the exact float32 that exposed the bug, plus boundary-ish friends
VALS = [-0.1319035, 0.1319035, 0.9999995, -0.0000005, 0.25, -1.0]


def _duck():
    return duckdb.connect()


def test_quantized_vec_matches_numpy_double_path():
    con = _duck()
    lit = ", ".join(
        f"cast(cast({v!r} as double) as float)" for v in VALS
    )
    expr = X.quantized_vec("duck", "v")
    got = con.sql(
        f"SELECT {expr} FROM (SELECT [{lit}] AS v)"
    ).fetchone()[0]
    f32 = np.array(VALS, dtype=np.float32).astype(np.float64)
    want = np.rint(f32 * 1e6).astype(np.int64)
    # ties at .5 are impossible on the true double grid (5^6
    # denominator argument), so rint == round-half-away here
    assert list(got) == want.tolist()


def test_duck_float_product_is_float32_without_cast():
    # the trap itself, pinned so we notice if DuckDB changes semantics
    con = _duck()
    t = con.sql(
        "SELECT typeof(cast(-0.1319035 as float) * 1000000.0)"
    ).fetchone()[0]
    assert t == "FLOAT"  # the demotion the widening fix defends against
    prod = con.sql(
        "SELECT cast(-0.1319035 as float) * 1000000.0"
    ).fetchone()[0]
    assert prod == -131903.5  # float32-rounded, exactly on the tie
    wide = con.sql(
        "SELECT cast(cast(-0.1319035 as float) as double) * 1000000.0"
    ).fetchone()[0]
    assert wide != -131903.5 and abs(wide - (-131903.49936)) < 1e-3


def test_dot_product_duck_matches_double_fold():
    con = _duck()
    a32 = np.array(VALS, dtype=np.float32)
    b32 = np.array(VALS[::-1], dtype=np.float32)
    lit_a = ", ".join(
        f"cast(cast({float(v)!r} as double) as float)" for v in a32
    )
    lit_b = ", ".join(
        f"cast(cast({float(v)!r} as double) as float)" for v in b32
    )
    expr = X.dot_product("duck", "a", "b", dims=len(VALS))
    got = con.sql(
        f"SELECT {expr} FROM (SELECT [{lit_a}] AS a, [{lit_b}] AS b)"
    ).fetchone()[0]
    # sequential left-to-right double fold over widened products
    acc = 0.0
    for x, y in zip(a32.astype(np.float64), b32.astype(np.float64)):
        acc += x * y
    assert got == acc  # bitwise
