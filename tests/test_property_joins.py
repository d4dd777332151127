"""Hypothesis property tests for the as-of join family: randomized
(key, ts, value) tables checked against independent references —
pandas merge_asof for backward/forward/nearest (incl. its tie rules),
a numpy lerp for the interpolating join. The fixture suites pin
specific edge cases; these pin the CONTRACT on arbitrary data."""

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from go_muse_spark.operators.joins import (
    asof_forward_join,
    asof_interp_join,
    asof_join,
    asof_nearest_join,
)

T0 = dt.datetime(2024, 1, 1)


@st.composite
def _tables(draw):
    """A left table and a right table over 1-3 keys; right timestamps
    are unique per key (duplicate (key, ts) rights are documented
    unspecified-winner territory for every join in the family)."""
    keys = draw(st.sampled_from([["a"], ["a", "b"], ["a", "b", "c"]]))
    left, right = [], []
    for k in keys:
        lts = draw(
            st.lists(st.integers(0, 500), min_size=1, max_size=12)
        )
        rts = draw(
            st.lists(
                st.integers(0, 500), min_size=0, max_size=10, unique=True
            )
        )
        left += [(k, s) for s in lts]
        right += [
            (k, s, float(draw(st.integers(-1000, 1000))))
            for s in rts
        ]
    return left, right


def _spark_tables(spark, left, right):
    L = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)],
        "k string, ts timestamp, rid long",
    )
    R = spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), v) for k, s, v in right],
        "k string, ts timestamp, value double",
    )
    return L, R


def _pandas_ref(left, right, direction):
    lp = pd.DataFrame(
        [(k, T0 + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)],
        columns=["k", "ts", "rid"],
    ).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(
            [(k, T0 + dt.timedelta(seconds=s), v) for k, s, v in right],
            columns=["k", "ts", "value"],
        )
        .astype({"ts": "datetime64[ns]", "value": "float64"})
        .sort_values("ts", kind="stable")
    )
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    return {
        rid: (None if pd.isna(v) else v)
        for rid, v in zip(m["rid"], m["value"])
    }


def _interp_ref(left, right):
    by_key = {}
    for k, s, v in right:
        by_key.setdefault(k, []).append((s, v))
    for k in by_key:
        by_key[k].sort()
    out = {}
    for rid, (k, s) in enumerate(left):
        pts = by_key.get(k, [])
        prev = max((p for p in pts if p[0] <= s), default=None)
        nxt = min((p for p in pts if p[0] > s), default=None)
        if prev is None:
            out[rid] = None
        elif prev[0] == s:
            out[rid] = prev[1]
        elif nxt is None:
            out[rid] = None
        else:
            t, (tp, vp), (tn, vn) = s, prev, nxt
            out[rid] = vp + (vn - vp) * ((t - tp) / (tn - tp))
    return out


@settings(max_examples=12, deadline=None)
@given(_tables())
def test_asof_family_matches_references(spark, tables):
    left, right = tables
    L, R = _spark_tables(spark, left, right)

    got_b = {
        r["rid"]: r["value_r"]
        for r in asof_join(L, R, ["k"], value_cols=["value"]).collect()
    }
    assert got_b == _pandas_ref(left, right, "backward")

    got_f = {
        r["rid"]: r["value_f"]
        for r in asof_forward_join(L, R, ["k"], "value").collect()
    }
    assert got_f == _pandas_ref(left, right, "forward")

    got_n = {
        r["rid"]: r["value_n"]
        for r in asof_nearest_join(L, R, ["k"], "value").collect()
    }
    assert got_n == _pandas_ref(left, right, "nearest")

    got_i = {
        r["rid"]: r["value_i"]
        for r in asof_interp_join(L, R, ["k"], "value").collect()
    }
    want_i = _interp_ref(left, right)
    assert set(got_i) == set(want_i)
    for rid in want_i:
        if want_i[rid] is None:
            assert got_i[rid] is None
        else:
            assert got_i[rid] is not None
            assert np.isclose(got_i[rid], want_i[rid], rtol=0, atol=1e-9)
