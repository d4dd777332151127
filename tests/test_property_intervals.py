"""Hypothesis property tests for interval_intersect: arbitrary
interval sets vs a brute-force integer-grid membership reference, plus
the algebraic laws (commutativity; A AND A == union(A); intersection
covered time bounded by either side's union)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from go_muse_spark.operators.sessions import interval_intersect, interval_union

_iv = st.tuples(st.integers(0, 120), st.integers(1, 40))
_ivset = st.lists(_iv, min_size=0, max_size=12)


def _df(spark, ivs, key="u"):
    rows = [(key, s, s + ln) for s, ln in ivs]
    if not rows:
        rows = [(key, 0, 0)]  # degenerate, dropped by the operator
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "start_us", "end_us"]),
        schema="user_id string, start_us long, end_us long",
    )


def _member(ivs, size=200):
    m = [False] * size
    for s, ln in ivs:
        for i in range(s, min(s + ln, size)):
            m[i] = True
    return m


def _spans_from_member(m):
    spans, i = [], 0
    while i < len(m):
        if m[i]:
            j = i
            while j < len(m) and m[j]:
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


@given(a=_ivset, b=_ivset)
@settings(max_examples=12, deadline=None)
def test_intersect_equals_grid_membership(spark, a, b):
    got = sorted(
        (r["start"], r["end"])
        for r in interval_intersect(_df(spark, a), _df(spark, b)).collect()
    )
    want = _spans_from_member(
        [x and y for x, y in zip(_member(a), _member(b))]
    )
    assert got == want


@given(a=_ivset, b=_ivset)
@settings(max_examples=8, deadline=None)
def test_intersect_commutes_and_bounds(spark, a, b):
    ab = sorted(
        (r["start"], r["end"])
        for r in interval_intersect(_df(spark, a), _df(spark, b)).collect()
    )
    ba = sorted(
        (r["start"], r["end"])
        for r in interval_intersect(_df(spark, b), _df(spark, a)).collect()
    )
    assert ab == ba
    cov = sum(e - s for s, e in ab)
    for side in (a, b):
        side_cov = sum(
            r["covered"] for r in interval_union(_df(spark, side)).collect()
        )
        assert cov <= side_cov


@given(a=_ivset)
@settings(max_examples=8, deadline=None)
def test_self_intersection_is_union(spark, a):
    got = sorted(
        (r["start"], r["end"])
        for r in interval_intersect(_df(spark, a), _df(spark, a)).collect()
    )
    want = sorted(
        (r["start"], r["end"])
        for r in interval_union(_df(spark, a)).collect()
    )
    assert got == want
