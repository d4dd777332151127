"""ols_fit3: exact Cramer solve vs numpy lstsq."""

import datetime as dt
import random

import numpy as np
import pandas as pd

from go_muse_spark.operators.ols import ols3_layers, ols_fit3

T0 = dt.datetime(2026, 1, 1)


def _df(spark, triples, key="a"):
    rows = [(key, int(t), int(x), int(y)) for t, x, y in triples]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "t", "x", "y"]),
        schema="conv_id string, t long, x long, y long",
    )


def test_ols3_matches_numpy(spark):
    rng = random.Random(17)
    triples = []
    for t in range(40):
        x = 1 if t % 7 in (5, 6) else 0
        y = 20 + 3 * t - 15 * x + rng.randint(-4, 4)
        triples.append((t, x, y))
    got = ols_fit3(_df(spark, triples), "y", "t", "x").collect()
    assert len(got) == 1
    r = got[0]
    A = np.array([[1.0, t, x] for t, x, _ in triples])
    yv = np.array([y for _, _, y in triples], float)
    b, res, *_ = np.linalg.lstsq(A, yv, rcond=None)
    assert abs(r["b0"] - b[0]) < 1e-8
    assert abs(r["b1"] - b[1]) < 1e-8
    assert abs(r["b2"] - b[2]) < 1e-8
    sse = float(((A @ b - yv) ** 2).sum())
    assert abs(r["sse"] - sse) < 1e-6
    sst = float(((yv - yv.mean()) ** 2).sum())
    assert abs(r["r2"] - (1 - sse / sst)) < 1e-9
    # recovered the planted effects
    assert abs(r["b1"] - 3) < 0.5 and abs(r["b2"] + 15) < 3


def test_ols3_exact_fit_r2_one(spark):
    triples = [(t, t % 2, 5 + 2 * t + 7 * (t % 2)) for t in range(12)]
    r = ols_fit3(_df(spark, triples), "y", "t", "x").collect()[0]
    assert abs(r["b0"] - 5) < 1e-9
    assert abs(r["b1"] - 2) < 1e-9
    assert abs(r["b2"] - 7) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12


def test_ols3_singular_and_short_dropped(spark):
    # x constant -> singular moment matrix -> dropped
    const_x = _df(spark, [(t, 1, t) for t in range(10)], key="cx")
    # too short
    short = _df(spark, [(t, t % 2, t) for t in range(4)], key="sh")
    # zero y variance
    flat = _df(spark, [(t, t % 2, 5) for t in range(10)], key="fl")
    out = ols_fit3(const_x.union(short).union(flat), "y", "t", "x").collect()
    assert out == []


def test_ols3_layers_text_stable():
    layers = ols3_layers()
    assert list(layers[0]) == ["det", "det0", "det1", "det2"]
    assert layers[1]["b0"] == "cast(det0 AS double) / cast(det AS double)"
    assert "1.0 - sse / sst" == layers[3]["r2"]
