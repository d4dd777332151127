"""drift operators + ccf_lags + winsorized_mean: semantics vs numpy."""

import datetime as dt
import math
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.drift import (
    dist_drift,
    dist_entropy,
    heavy_change,
)
from go_muse_spark.operators.olap import winsorized_mean
from go_muse_spark.operators.stats import ccf_lags

T0 = dt.datetime(2026, 1, 1)
DAY = 86400


def _drift_ref(cur, base, n_bins, metric):
    """Independent per-bucket reference: smoothed histograms, term
    micro-rounding before the sum (the operator contract)."""
    n, bn = sum(cur), sum(base)
    total = 0
    for c, b in zip(cur, base):
        p = (c + 1) / (n + n_bins)
        q = (b + 1) / (bn + n_bins)
        if metric == "psi":
            t = (p - q) * math.log(p / q)
        else:
            m = (p + q) / 2
            t = (p * math.log(p / m) + q * math.log(q / m)) / 2
        total += round(t * 1e6)
    return n, total


def _mkdrift(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["v", "b"]),
        schema="v long, b long",
    )


def test_dist_drift_psi_matches_reference(spark):
    rng = random.Random(7)
    n_bins, width = 5, 10
    # baseline buckets 0,1; scored buckets 2,3 with a shifted mix
    rows, hists = [], {}
    for bucket in range(4):
        hist = [0] * n_bins
        for _ in range(200):
            v = rng.randrange(0, 50) if bucket < 2 else rng.randrange(20, 70)
            rows.append((v, bucket * DAY))
            hist[min(n_bins - 1, max(0, v // width))] += 1
        hists[bucket] = hist
    base = [a + b for a, b in zip(hists[0], hists[1])]
    out = {
        r["b"]: r
        for r in dist_drift(
            _mkdrift(spark, rows), "v", "b", baseline_end=2 * DAY,
            width=width, n_bins=n_bins, metric="psi",
        ).collect()
    }
    assert sorted(out) == [2 * DAY, 3 * DAY]  # baseline not scored
    for bucket in (2, 3):
        n, want = _drift_ref(hists[bucket], base, n_bins, "psi")
        assert out[bucket * DAY]["n"] == n
        assert out[bucket * DAY]["drift_u"] == want


def test_dist_drift_jsd_identical_dist_near_zero_and_bounded(spark):
    # scored bucket == pooled baseline -> JSD ~ 0 (smoothing-level);
    # disjoint support -> large but < ln2 * 1e6
    rows = [(v, 0) for v in range(40)] + [(v, DAY) for v in range(40)]
    rows += [(v + 1000, 2 * DAY) for v in range(40)]
    out = {
        r["b"]: r["drift_u"]
        for r in dist_drift(
            _mkdrift(spark, rows), "v", "b", baseline_end=DAY,
            width=10, n_bins=8, metric="jsd",
        ).collect()
    }
    assert abs(out[DAY]) < 1000  # same distribution
    assert 0 < out[2 * DAY] < math.log(2) * 1e6  # bounded by ln 2
    # empty bins still contribute: the disjoint case sees the vanish
    assert out[2 * DAY] > 100000


def test_dist_drift_validates(spark):
    df = _mkdrift(spark, [(1, 0)])
    with pytest.raises(ValueError):
        dist_drift(df, "v", "b", 10, width=1, n_bins=1)
    with pytest.raises(ValueError):
        dist_drift(df, "v", "b", 10, width=5, n_bins=4, metric="kl")


def test_dist_entropy_matches_reference(spark):
    rng = random.Random(3)
    rows = []
    mixes = {0: [60, 30, 10], DAY: [100], 2 * DAY: [25, 25, 25, 25]}
    for b, mix in mixes.items():
        for i, c in enumerate(mix):
            rows += [(f"cat{i}", b)] * c
    rng.shuffle(rows)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cat", "b"]), schema="cat string, b long"
    )
    out = {r["b"]: r for r in dist_entropy(df, "cat", ("b",)).collect()}
    for b, mix in mixes.items():
        n = sum(mix)
        want = -sum(round(c / n * math.log(c / n) * 1e6) for c in mix)
        assert out[b]["n"] == n
        assert out[b]["k"] == len(mix)
        assert out[b]["entropy_u"] == want
    # single category: exactly zero; uniform-4: ~ ln(4)
    assert out[DAY]["entropy_u"] == 0
    assert out[2 * DAY]["entropy_u"] == pytest.approx(
        math.log(4) * 1e6, abs=4
    )


def test_heavy_change_appear_disappear_and_rank(spark):
    # u1 stable, u2 disappears after day0, u3 appears day1, u4 jumps
    counts = spark.createDataFrame(
        pd.DataFrame(
            [
                ("u1", 0, 10), ("u1", DAY, 11),
                ("u2", 0, 50),
                ("u3", DAY, 30),
                ("u4", 0, 5), ("u4", DAY, 45),
            ],
            columns=["k", "b", "c"],
        ),
        schema="k string, b long, c long",
    )
    out = heavy_change(counts, ("k",), "b", "c", step=DAY, top_k=3).collect()
    by_day = {}
    for r in out:
        by_day.setdefault(r["b"], []).append(r)
    # day0 has no previous bucket IN THE DATA -> prev=0 for all
    d0 = sorted(by_day[0], key=lambda r: r["rnk"])
    assert [(r["k"], r["delta"]) for r in d0] == [
        ("u2", 50), ("u1", 10), ("u4", 5)
    ]
    d1 = sorted(by_day[DAY], key=lambda r: r["rnk"])
    # u2: 0-50=-50 biggest |delta|; u4: +40; u3: +30 (appearance)
    assert [(r["k"], r["delta"]) for r in d1] == [
        ("u2", -50), ("u4", 40), ("u3", 30)
    ]
    # no phantom bucket after the last day
    assert set(by_day) == {0, DAY}


def test_heavy_change_tie_breaks_on_key(spark):
    counts = spark.createDataFrame(
        pd.DataFrame(
            [("b", 0, 7), ("a", 0, 7), ("c", 0, 7)], columns=["k", "b", "c"]
        ),
        schema="k string, b long, c long",
    )
    out = heavy_change(counts, ("k",), "b", "c", step=DAY, top_k=2).collect()
    assert [(r["k"], r["rnk"]) for r in sorted(out, key=lambda r: r["rnk"])] \
        == [("a", 1), ("b", 2)]


def _hourly(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            [(u, T0 + dt.timedelta(hours=h), x, y) for u, h, x, y in rows],
            columns=["conv_id", "bucket_ts", "x", "y"],
        )
    )


def test_ccf_matches_numpy_and_finds_planted_lag(spark):
    rng = random.Random(19)
    xs = [rng.randrange(1, 100) for _ in range(48)]
    # y leads x by 2 hours: x_t = y_{t-2} (+small noise-free copy)
    rows = [
        ("a", h, xs[h - 2] if h >= 2 else rng.randrange(1, 100), xs[h])
        for h in range(48)
    ]
    out = {
        r["lag_s"]: r
        for r in ccf_lags(
            _hourly(spark, rows), "x", "y",
            lag_secs=(-7200, -3600, 0, 3600, 7200),
        ).collect()
    }
    assert out[7200]["ccf"] == pytest.approx(1.0, abs=1e-9)
    # every lag's value matches the numpy pairs over realized buckets
    xv = {h: r[2] for r, h in zip(rows, range(48))}
    yv = {h: r[3] for r, h in zip(rows, range(48))}
    for lag_s, r in out.items():
        lag_h = lag_s // 3600
        pairs = [
            (xv[h], yv[h - lag_h])
            for h in range(48)
            if 0 <= h - lag_h < 48
        ]
        assert r["n_pairs"] == len(pairs)
        a = np.array([p[0] for p in pairs], dtype=float)
        b = np.array([p[1] for p in pairs], dtype=float)
        assert r["ccf"] == pytest.approx(np.corrcoef(a, b)[0, 1], abs=1e-9)


def test_ccf_gaps_drop_pairs_and_min_pairs(spark):
    rows = [("a", h, h + 1, 2 * h + 1) for h in (0, 1, 2, 10)]
    out = {
        r["lag_s"]: r
        for r in ccf_lags(
            _hourly(spark, rows), "x", "y", lag_secs=(0, 3600), min_pairs=3
        ).collect()
    }
    assert out[0]["n_pairs"] == 4
    # lag 1h realizes only (1,0),(2,1) -> 2 pairs < min_pairs -> NULL
    assert out[3600]["n_pairs"] == 2
    assert out[3600]["ccf"] is None


def test_winsorized_mean_matches_scipy_semantics(spark):
    rng = random.Random(5)
    vals = [rng.randrange(-50, 1000) for _ in range(37)]
    df = spark.createDataFrame(
        pd.DataFrame(
            [("g", v, i) for i, v in enumerate(vals)],
            columns=["g", "v", "i"],
        ),
        schema="g string, v long, i long",
    )
    r = winsorized_mean(df, "v", ("g",), 0.1, order_cols=("i",)).collect()[0]
    k = int(len(vals) * 0.1)
    s = sorted(vals)
    clamped = [min(max(v, s[k]), s[-k - 1]) for v in vals]
    assert r["n"] == 37 and r["n_wins"] == k
    assert r["lo_cap"] == s[k] and r["hi_cap"] == s[-k - 1]
    assert r["wins_sum"] == sum(clamped)
    assert r["wins_mean"] == pytest.approx(sum(clamped) / 37, abs=1e-9)


def test_winsorized_zero_frac_is_plain_mean_and_validates(spark):
    df = spark.createDataFrame(
        pd.DataFrame([("g", v, v) for v in (1, 2, 30)], columns=["g", "v", "i"]),
        schema="g string, v long, i long",
    )
    r = winsorized_mean(df, "v", ("g",), 0.0, order_cols=("i",)).collect()[0]
    assert r["n_wins"] == 0 and r["wins_sum"] == 33
    assert r["wins_mean"] == pytest.approx(11.0)
    with pytest.raises(ValueError):
        winsorized_mean(df, "v", ("g",), 0.5)


def test_ks_drift_matches_scipy_style_reference(spark):
    """Exact KS vs a brute-force two-sample reference on the
    quantized values."""
    from go_muse_spark.operators.drift import ks_drift

    rng = random.Random(31)
    rows = []
    for _ in range(400):  # baseline bucket 0: uniform-ish
        rows.append((round(rng.uniform(0, 10), 3), 0))
    for _ in range(300):  # scored bucket 100: shifted
        rows.append((round(rng.uniform(3, 13), 3), 100))
    for _ in range(250):  # scored bucket 200: same dist as baseline
        rows.append((round(rng.uniform(0, 10), 3), 200))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["value", "b"]),
        schema="value double, b long",
    )
    got = {r["b"]: r for r in ks_drift(
        df, "value", "b", baseline_end=50, quant=1000
    ).collect()}

    base = sorted(round(v * 1000) for v, b in rows if b == 0)
    for bucket in (100, 200):
        cur = sorted(round(v * 1000) for v, b in rows if b == bucket)
        m, n = len(base), len(cur)
        vals = sorted(set(base) | set(cur))
        import bisect
        d_num = max(
            abs(bisect.bisect_right(base, v) * n
                - bisect.bisect_right(cur, v) * m)
            for v in vals
        )
        r = got[bucket]
        assert (r["m"], r["n"], r["d_num"]) == (m, n, d_num)
        assert abs(r["ks"] - d_num / (m * n)) < 1e-15
    # shifted bucket clearly more drifted than the same-dist one
    assert got[100]["ks"] > 2 * got[200]["ks"]


def test_ks_drift_identical_samples_zero(spark):
    from go_muse_spark.operators.drift import ks_drift

    rows = [(float(v), b) for b in (0, 100) for v in range(50)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["value", "b"]),
        schema="value double, b long",
    )
    r = ks_drift(df, "value", "b", baseline_end=50).collect()
    assert len(r) == 1 and r[0]["d_num"] == 0 and r[0]["ks"] == 0.0


def test_ks_drift_validates(spark):
    from go_muse_spark.operators.drift import ks_drift

    df = spark.createDataFrame(
        pd.DataFrame([(1.0, 0)], columns=["value", "b"]),
        schema="value double, b long",
    )
    with pytest.raises(ValueError):
        ks_drift(df, "value", "b", baseline_end=50, quant=0)


def test_w1_drift_matches_wasserstein_reference(spark):
    """W1 from the same grid pass vs an independent reference: the
    textbook empirical W1 = integral |F_a - F_b| dv on quantized
    values (equivalent to mean |sorted-quantile difference| when
    n == m)."""
    from go_muse_spark.operators.drift import ks_drift

    rng = random.Random(47)
    rows = [(round(rng.uniform(0, 10), 3), 0) for _ in range(300)]
    rows += [(round(rng.uniform(2, 12), 3), 100) for _ in range(200)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["value", "b"]),
        schema="value double, b long",
    )
    r = ks_drift(df, "value", "b", baseline_end=50, quant=1000).collect()[0]
    base = sorted(round(v * 1000) for v, b in rows if b == 0)
    cur = sorted(round(v * 1000) for v, b in rows if b == 100)
    m, n = len(base), len(cur)
    import bisect
    vals = sorted(set(base) | set(cur))
    w1_num = sum(
        abs(bisect.bisect_right(base, v) * n - bisect.bisect_right(cur, v) * m)
        * (vals[k + 1] - vals[k])
        for k, v in enumerate(vals[:-1])
    )
    assert r["w1_num"] == w1_num
    assert abs(r["w1"] - w1_num / (m * n * 1000)) < 1e-12
    # a +2 location shift of overlapping uniforms has W1 ~ 2
    assert 1.0 < r["w1"] < 3.0
