"""interval_intersect: boundary-sweep AND of two interval sets."""

import random

import numpy as np
import pandas as pd

from go_muse_spark.operators.sessions import interval_intersect


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "start_us", "end_us"]),
        schema="user_id string, start_us long, end_us long",
    )


def _spans(rows):
    return [(r["start"], r["end"]) for r in rows]


def test_basic_overlap_and_halfopen_touch(spark):
    a = _df(spark, [("u", 0, 10), ("v", 0, 5)])
    b = _df(spark, [("u", 5, 15), ("v", 5, 10)])
    got = {
        r["user_id"]: (r["start"], r["end"], r["covered"])
        for r in interval_intersect(a, b).collect()
    }
    assert got["u"] == (5, 10, 5)
    # [0,5) and [5,10) touch but never overlap (half-open)
    assert "v" not in got


def test_stacked_and_split_coalesce(spark):
    # left side internally overlapping; right side one span
    a = _df(spark, [("u", 0, 10), ("u", 2, 6)])
    b = _df(spark, [("u", 4, 12)])
    got = interval_intersect(a, b).collect()
    assert _spans(got) == [(4, 10)]
    # touching left pieces [0,4)+[4,8): the boundary at 4 splits the
    # sweep segment, the union pass re-merges
    a2 = _df(spark, [("u", 0, 4), ("u", 4, 8)])
    b2 = _df(spark, [("u", 2, 6)])
    got2 = interval_intersect(a2, b2).collect()
    assert _spans(got2) == [(2, 6)]
    assert got2[0]["covered"] == 4


def test_matches_bruteforce_membership(spark):
    rng = random.Random(21)
    A, B = [], []
    for _ in range(40):
        s = rng.randint(0, 180)
        A.append(("u", s, s + rng.randint(1, 25)))
    for _ in range(40):
        s = rng.randint(0, 180)
        B.append(("u", s, s + rng.randint(1, 25)))
    got = sorted(
        _spans(interval_intersect(_df(spark, A), _df(spark, B)).collect())
    )
    # brute force on the integer grid
    grid = np.zeros(260, bool)
    ga = grid.copy()
    gb = grid.copy()
    for _, s, e in A:
        ga[s:e] = True
    for _, s, e in B:
        gb[s:e] = True
    both = ga & gb
    spans, i = [], 0
    while i < len(both):
        if both[i]:
            j = i
            while j < len(both) and both[j]:
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    assert got == spans
    # total covered equals membership count
    rows = interval_intersect(_df(spark, A), _df(spark, B)).collect()
    assert sum(r["covered"] for r in rows) == int(both.sum())


def test_disjoint_and_key_isolation(spark):
    a = _df(spark, [("u", 0, 5), ("w", 0, 5)])
    b = _df(spark, [("u", 10, 15), ("w", 3, 4)])
    got = {r["user_id"]: (r["start"], r["end"])
           for r in interval_intersect(a, b).collect()}
    assert got == {"w": (3, 4)}


def test_degenerate_intervals_dropped(spark):
    a = _df(spark, [("u", 5, 5), ("u", 0, 10)])  # zero-length dropped
    b = _df(spark, [("u", 3, 7)])
    got = interval_intersect(a, b).collect()
    assert _spans(got) == [(3, 7)]
