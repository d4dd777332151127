"""mann_kendall / kendall_tau / time_above_threshold /
kmv_rolling_union: semantics vs independent numpy references."""

import datetime as dt
import itertools
import math
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.cardinality import (
    KMV_A,
    KMV_B,
    KMV_P,
    kmv_rolling_union,
    kmv_sketch_rollup,
)
from go_muse_spark.operators.stats import kendall_tau, mann_kendall
from go_muse_spark.operators.timeweight import time_above_threshold

T0 = dt.datetime(2026, 1, 1)
DAY = 86400


def _series_df(spark, values, key="a"):
    rows = [
        (key, T0 + dt.timedelta(days=i), int(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_ts", "v"]),
        schema="conv_id string, bucket_ts timestamp, v long",
    )


def _mk_ref(values):
    """Textbook Mann-Kendall: brute-force S, tie-corrected var, z."""
    v = np.asarray(values)
    n = len(v)
    s = sum(
        int(np.sign(v[j] - v[i]))
        for i, j in itertools.combinations(range(n), 2)
    )
    _, counts = np.unique(v, return_counts=True)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        int(t) * (t - 1) * (2 * t + 5) for t in counts
    )
    sd = math.sqrt(var18 / 18.0)
    z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
    d0 = n * (n - 1) / 2
    t1 = sum(int(t) * (t - 1) for t in counts) / 2
    tau = s / math.sqrt(d0 * (d0 - t1))
    return s, var18, z, tau


def test_mann_kendall_matches_reference(spark):
    rng = random.Random(7)
    vals = [rng.randint(0, 8) + i // 3 for i in range(25)]  # trend + ties
    got = mann_kendall(_series_df(spark, vals), "v").collect()
    assert len(got) == 1
    r = got[0]
    s, var18, z, tau = _mk_ref(vals)
    assert r["s_stat"] == s and r["var18"] == var18 and r["n"] == 25
    assert abs(r["z"] - z) < 1e-12
    assert abs(r["tau_b"] - tau) < 1e-12


def test_mann_kendall_monotone_and_flat(spark):
    up = _series_df(spark, range(10), key="up")
    flat = _series_df(spark, [5] * 10, key="flat")
    got = {
        r["conv_id"]: r
        for r in mann_kendall(up.union(flat), "v").collect()
    }
    # strictly increasing: every pair concordant, tau_b == 1
    assert got["up"]["s_stat"] == 45 and got["up"]["tau_b"] == 1.0
    # all tied: Var(S) == 0 -> dropped, no verdict row
    assert "flat" not in got


def test_mann_kendall_min_points(spark):
    assert mann_kendall(_series_df(spark, [1, 2, 3]), "v").count() == 0


def _xy_df(spark, xs, ys, key="a"):
    rows = [
        (key, T0 + dt.timedelta(days=i), int(x), int(y))
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_ts", "x", "y"]),
        schema="conv_id string, bucket_ts timestamp, x long, y long",
    )


def _tau_b_ref(xs, ys):
    x, y = np.asarray(xs), np.asarray(ys)
    n = len(x)
    s = sum(
        int(np.sign(x[j] - x[i])) * int(np.sign(y[j] - y[i]))
        for i, j in itertools.combinations(range(n), 2)
    )
    d0 = n * (n - 1) // 2
    tx = sum(t * (t - 1) // 2 for t in np.unique(x, return_counts=True)[1])
    ty = sum(t * (t - 1) // 2 for t in np.unique(y, return_counts=True)[1])
    return s, s / math.sqrt((d0 - tx) * (d0 - ty))


def test_kendall_tau_matches_reference_with_ties(spark):
    rng = random.Random(3)
    xs = [rng.randint(0, 6) for _ in range(20)]
    ys = [x + rng.randint(-2, 2) for x in xs]
    got = kendall_tau(_xy_df(spark, xs, ys), "x", "y").collect()
    assert len(got) == 1
    s, tau = _tau_b_ref(xs, ys)
    assert got[0]["s_stat"] == s
    assert abs(got[0]["tau_b"] - tau) < 1e-12


def test_kendall_tau_perfect_and_degenerate(spark):
    perfect = _xy_df(spark, range(8), [2 * v for v in range(8)], key="p")
    anti = _xy_df(spark, range(8), [-v for v in range(8)], key="m")
    const_y = _xy_df(spark, range(8), [4] * 8, key="c")
    got = {
        r["conv_id"]: r["tau_b"]
        for r in kendall_tau(
            perfect.union(anti).union(const_y), "x", "y"
        ).collect()
    }
    assert got["p"] == 1.0 and got["m"] == -1.0
    assert "c" not in got  # all-y-tied margin -> dropped


# ------------------------------------------------ time_above_threshold


def _ev_df(spark, rows):
    """rows: (user, offset_secs, value)."""
    data = [
        (u, T0 + dt.timedelta(seconds=s), float(v)) for u, s, v in rows
    ]
    return spark.createDataFrame(
        pd.DataFrame(data, columns=["user_id", "ts", "value"]),
        schema="user_id string, ts timestamp, value double",
    )


def test_above_threshold_interpolates_crossings(spark):
    # 0 -> 20 over 10s crosses h=10 at exactly t=5; 20 -> 0 over 10s
    # crosses back at t=15. Above = [5, 15) = 10s of 20s covered.
    df = _ev_df(spark, [("u", 0, 0.0), ("u", 10, 20.0), ("u", 20, 0.0)])
    got = time_above_threshold(
        df, "value", threshold=10.0, bucket_secs=3600, max_gap_secs=60
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["covered_us"] == 20_000_000
    assert r["above_us"] == 10_000_000
    assert r["above_frac"] == 0.5


def test_above_threshold_exact_geometry_vs_reference(spark):
    """Random walk vs a pointwise numpy integrator using the same
    round-crossing-then-integer-algebra contract."""
    rng = random.Random(11)
    ts, vals, t = [], [], 0
    for _ in range(200):
        ts.append(t)
        vals.append(round(rng.uniform(0, 20), 3))
        t += rng.randint(1, 900)
    df = _ev_df(spark, [("u", s, v) for s, v in zip(ts, vals)])
    h = 10_000
    bs = 3_600_000_000
    cov = {}
    ab = {}
    for (t0, v0), (t1, v1) in zip(
        zip(ts, vals), zip(ts[1:], vals[1:])
    ):
        t0u, t1u = t0 * 1_000_000, t1 * 1_000_000
        v0m, v1m = round(v0 * 1000), round(v1 * 1000)
        if v0m >= h and v1m >= h:
            alo, ahi = t0u, t1u
        elif v0m < h and v1m < h:
            alo = ahi = 0
        else:
            # HALF_UP like F.round (the quotient is positive in any
            # crossing case), not Python's banker rounding
            tx = t0u + math.floor(
                (t1u - t0u) * (h - v0m) / (v1m - v0m) + 0.5
            )
            alo, ahi = (tx, t1u) if v1m >= h else (t0u, tx)
        for k in range(t0u // bs, (t1u - 1) // bs + 1):
            cov[k] = cov.get(k, 0) + min(t1u, (k + 1) * bs) - max(t0u, k * bs)
            ab[k] = ab.get(k, 0) + max(
                0, min(ahi, (k + 1) * bs) - max(alo, k * bs)
            )
    got = {
        r["bucket_epoch"]: r
        for r in time_above_threshold(
            df, "value", threshold=10.0, bucket_secs=3600, max_gap_secs=1800
        ).collect()
    }
    # T0 is hour-aligned, so absolute buckets are base + relative ones
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert set(got) == {base + k * 3600 for k in cov}
    for k, c in cov.items():
        assert got[base + k * 3600]["covered_us"] == c
        assert got[base + k * 3600]["above_us"] == ab[k]


def test_above_threshold_stale_gap_and_bucket_split(spark):
    # 30min gap > max_gap=600 -> no line drawn; segment crossing an
    # hour boundary splits its above-time exactly.
    df = _ev_df(
        spark,
        [
            ("u", 3590, 20.0),
            ("u", 3610, 20.0),  # straddles the hour, fully above
            ("u", 5410, 20.0),  # 30 min later: stale, no segment
        ],
    )
    got = {
        r["bucket_epoch"]: r
        for r in time_above_threshold(
            df, "value", threshold=10.0, bucket_secs=3600, max_gap_secs=600
        ).collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[base]["covered_us"] == 10_000_000
    assert got[base]["above_us"] == 10_000_000
    assert got[base + 3600]["covered_us"] == 10_000_000
    assert got[base + 3600]["above_us"] == 10_000_000


def test_above_threshold_validates(spark):
    df = _ev_df(spark, [("u", 0, 1.0)])
    with pytest.raises(ValueError):
        time_above_threshold(df, "value", 1.0, bucket_secs=3600,
                             max_gap_secs=0)
    with pytest.raises(ValueError):
        time_above_threshold(df, "value", 1.0, bucket_secs=0,
                             max_gap_secs=60)


# -------------------------------------------------- kmv_rolling_union


def _kmv_hash(k):
    return ((k % KMV_P + KMV_P) % KMV_P * KMV_A + KMV_B) % KMV_P


def test_kmv_rolling_union_equals_raw_window_kmin(spark):
    """Min-associativity end-to-end: union of per-day k-min sketches
    == k smallest distinct hashes of the raw trailing window."""
    rng = random.Random(5)
    rows = []
    for d in range(20):
        for _ in range(rng.randint(30, 120)):
            rows.append(
                (T0 + dt.timedelta(days=d, seconds=rng.randint(0, 86399)),
                 rng.randint(0, 4000))
            )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "user_id"]),
        schema="ts timestamp, user_id long",
    )
    k = 16
    daily = kmv_sketch_rollup(df, "user_id", bucket_secs=DAY, k=k)
    got = {
        r["bucket_epoch"]: list(r["kmv"])
        for r in kmv_rolling_union(
            daily, window_buckets=7, bucket_secs=DAY, k=k
        ).collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    by_day = {}
    for ts, uid in rows:
        d = (ts - T0).days
        by_day.setdefault(d, set()).add(_kmv_hash(uid))
    for d, exp_day in by_day.items():
        window = set()
        for dd in range(max(0, d - 6), d + 1):
            window |= by_day.get(dd, set())
        expect = sorted(window)[:k]
        assert got[base + d * DAY] == expect


def test_kmv_rolling_union_estimate_and_small_sketch(spark):
    # fewer than k distinct in the window -> est == exact count
    rows = [(T0 + dt.timedelta(days=d), d * 10 + i)
            for d in range(3) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "user_id"]),
        schema="ts timestamp, user_id long",
    )
    daily = kmv_sketch_rollup(df, "user_id", bucket_secs=DAY, k=64)
    out = kmv_rolling_union(daily, 7, bucket_secs=DAY, k=64).collect()
    by_day = {r["bucket_epoch"]: r for r in out}
    base = min(by_day)
    assert by_day[base]["n_est"] == 5.0
    assert by_day[base + 2 * DAY]["n_est"] == 15.0


def test_kmv_rolling_union_validates(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(T0, 1)], columns=["ts", "user_id"]),
        schema="ts timestamp, user_id long",
    )
    daily = kmv_sketch_rollup(df, "user_id", bucket_secs=DAY, k=8)
    with pytest.raises(ValueError):
        kmv_rolling_union(daily, 0)


# -------------------------------------------- seasonal_mann_kendall


def test_seasonal_mk_matches_reference(spark):
    from go_muse_spark.operators.stats import seasonal_mann_kendall

    rng = random.Random(13)
    vals = [rng.randint(0, 5) + (i // 7) + (3 if i % 7 in (0, 6) else 0)
            for i in range(35)]  # weekly shape + trend
    rows = [("a", T0 + dt.timedelta(days=i), i % 7, int(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_ts", "ph", "v"]),
        schema="conv_id string, bucket_ts timestamp, ph int, v long",
    )
    got = seasonal_mann_kendall(df, "v", "ph").collect()
    assert len(got) == 1
    # independent per-phase reference
    S = V = 0
    for p in range(7):
        pv = [v for i, v in enumerate(vals) if i % 7 == p]
        s, var18, _, _ = _mk_ref(pv)
        S += s
        V += var18
    r = got[0]
    assert r["s_stat"] == S and r["var18"] == V and r["n"] == 35
    assert r["n_phases"] == 7
    sd = math.sqrt(V / 18.0)
    zexp = (S - 1) / sd if S > 0 else (S + 1) / sd if S < 0 else 0.0
    assert abs(r["z"] - zexp) < 1e-12


def test_seasonal_mk_tied_phase_included_and_pure_seasonal_null(spark):
    from go_muse_spark.operators.stats import seasonal_mann_kendall

    # phase 0 strictly rises, phase 1 all tied: tied phase adds
    # Var 0 but its n still counts; total verdict from phase 0 only
    rows = [("a", T0 + dt.timedelta(days=2 * i), 0, i) for i in range(6)]
    rows += [("a", T0 + dt.timedelta(days=2 * i + 1), 1, 9) for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_ts", "ph", "v"]),
        schema="conv_id string, bucket_ts timestamp, ph int, v long",
    )
    got = seasonal_mann_kendall(df, "v", "ph").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 12 and r["n_phases"] == 2
    assert r["s_stat"] == 15  # 6*5/2 concordant pairs in phase 0
    # pure weekly pattern with NO trend: every phase all-tied ->
    # total Var 0 -> no verdict row
    rows2 = [("b", T0 + dt.timedelta(days=i), i % 7, (i % 7) * 10)
             for i in range(28)]
    df2 = spark.createDataFrame(
        pd.DataFrame(rows2, columns=["conv_id", "bucket_ts", "ph", "v"]),
        schema="conv_id string, bucket_ts timestamp, ph int, v long",
    )
    assert seasonal_mann_kendall(df2, "v", "ph").collect() == []
