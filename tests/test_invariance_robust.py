"""Algebraic invariance pins for the rolling-robust family: the laws
(not specific values) on seeded random series — translation and
positive scaling must leave Hampel verdicts and dominant-period
argmaxes exactly unchanged, because every comparison is carried in
exact integers that transform equivariantly."""

import datetime as dt
import random

import pytest

from go_muse_spark.operators.arfit import dominant_period
from go_muse_spark.operators.stats import hampel


def _df(spark, vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (conv, t0 + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v int"
    )


def _rand(seed, n=48, hi=50):
    rng = random.Random(seed)
    return [rng.randint(0, hi) for _ in range(n)]


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_hampel_affine_invariant(spark, seed):
    vals = _rand(seed)
    a, b = 3, 1000  # positive scale + translation
    base = hampel(_df(spark, vals), "v", 9, quant=1).orderBy("bucket_ts")
    moved = hampel(
        _df(spark, [a * v + b for v in vals]), "v", 9, quant=1
    ).orderBy("bucket_ts")
    flags0 = [r["is_outlier"] for r in base.collect()]
    flags1 = [r["is_outlier"] for r in moved.collect()]
    # dev and MAD both scale by a, translation cancels in both ->
    # the integer comparison k_den*a*dev > k_num*a*MAD is unchanged
    assert flags0 == flags1


@pytest.mark.parametrize("seed", [5, 23])
def test_dominant_period_affine_invariant(spark, seed):
    vals = _rand(seed, n=60)
    a, b = 7, 500
    r0 = dominant_period(_df(spark, vals), "v", 2, 12).collect()
    r1 = dominant_period(
        _df(spark, [a * v + b for v in vals]), "v", 2, 12
    ).collect()
    assert len(r0) == len(r1) == 1
    # C_k scales by a^2 and ignores b; rho = C_k/C_0 is exactly
    # invariant, so lag AND rounded strength match bit for bit
    assert r0[0]["best_lag"] == r1[0]["best_lag"]
    assert r0[0]["rho_u"] == r1[0]["rho_u"]
