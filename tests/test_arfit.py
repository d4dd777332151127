"""pacf / Durbin-Levinson unroll: semantics vs independent numpy."""

import datetime as dt
import random

import numpy as np
import pandas as pd
import pytest

from go_muse_spark.operators.arfit import dl_layers, dl_sql_ctes, pacf

T0 = dt.datetime(2026, 1, 1)


def _df(spark, values, key="a"):
    rows = [
        (key, T0 + dt.timedelta(days=i), int(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_ts", "v"]),
        schema="conv_id string, bucket_ts timestamp, v long",
    )


def _ref(values, K):
    """Independent reference: biased autocovariance + textbook
    Durbin-Levinson in plain Python floats."""
    x = np.asarray(values, dtype=float)
    n = len(x)
    xb = x.mean()
    c = [float(((x[: n - k] - xb) * (x[k:] - xb)).sum()) / n
         for k in range(K + 1)]
    rho = [ck / c[0] for ck in c]
    phi = {1: {1: rho[1]}}
    for k in range(2, K + 1):
        num = rho[k] - sum(phi[k - 1][j] * rho[k - j] for j in range(1, k))
        den = 1.0 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
        phi[k] = {k: num / den}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
    pac = [phi[k][k] for k in range(1, K + 1)]
    ar = [phi[K][j] for j in range(1, K + 1)]
    return rho[1:], pac, ar


def test_pacf_matches_reference(spark):
    rng = random.Random(42)
    vals, prev = [], 50.0
    for _ in range(60):  # AR(1)-ish walk with noise
        prev = 0.7 * prev + rng.randint(0, 30)
        vals.append(int(prev))
    K = 6
    got = {r["k"]: r for r in pacf(_df(spark, vals), "v", K).collect()}
    rho, pac, ar = _ref(vals, K)
    assert set(got) == set(range(1, K + 1))
    for k in range(1, K + 1):
        assert got[k]["n"] == 60
        assert abs(got[k]["rho"] - rho[k - 1]) < 1e-9
        assert abs(got[k]["pacf"] - pac[k - 1]) < 1e-9
        assert abs(got[k]["ar_coef"] - ar[k - 1]) < 1e-9


def test_pacf_ar_coefs_solve_yule_walker(spark):
    """The final-level coefficients must solve the Toeplitz system
    R a = r (Yule-Walker) — an independent linear-algebra check."""
    rng = random.Random(9)
    vals = [int(20 + 10 * np.sin(i / 3) + rng.randint(0, 6))
            for i in range(80)]
    K = 4
    got = {r["k"]: r["ar_coef"]
           for r in pacf(_df(spark, vals), "v", K).collect()}
    x = np.asarray(vals, float)
    n, xb = len(x), np.mean(vals)
    c = np.array([((x[: n - k] - xb) * (x[k:] - xb)).sum() / n
                  for k in range(K + 1)])
    rho = c / c[0]
    R = np.array([[rho[abs(i - j)] for j in range(K)] for i in range(K)])
    a = np.linalg.solve(R, rho[1: K + 1])
    for k in range(1, K + 1):
        assert abs(got[k] - a[k - 1]) < 1e-9


def test_pacf_pure_ar1_cuts_off(spark):
    # deterministic AR(1): pacf(1) ~ rho1, pacf(k>1) ~ 0
    vals = [int(1000 * (0.8 ** i)) for i in range(40)]
    got = {r["k"]: r for r in pacf(_df(spark, vals), "v", 4).collect()}
    assert abs(got[1]["pacf"]) > 0.7
    for k in (2, 3, 4):
        assert abs(got[k]["pacf"]) < 0.2
    # innovation ratio is non-increasing in k
    ratios = [got[k]["innov_ratio"] for k in (1, 2, 3, 4)]
    assert all(b <= a + 1e-12 for a, b in zip(ratios, ratios[1:]))


def test_pacf_short_and_flat_series_dropped(spark):
    short = _df(spark, range(6), key="s")  # < min_points = K+4
    flat = _df(spark, [7] * 30, key="f")  # zero variance
    out = pacf(short.union(flat), "v", 4).collect()
    assert out == []


def test_pacf_validates(spark):
    df = _df(spark, range(30))
    with pytest.raises(ValueError):
        pacf(df, "v", 0)
    with pytest.raises(ValueError):
        pacf(df, "v", 13)
    with pytest.raises(ValueError):
        pacf(df, "v", 5, min_points=6)


def test_dl_sql_ctes_shape():
    txt, final = dl_sql_ctes(3, "base")
    # 1 + 3*(K-1) layers
    assert final == "dl_7"
    assert txt.count("AS (SELECT *") == 7
    assert "phi_3_3" in txt and "num_2 / den_2" in txt
    # layer text is identical to what the Spark side applies
    assert dl_layers(3)[0] == {"phi_1_1": "rho_1"}
