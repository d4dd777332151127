"""survival_km vs a hand-rolled product-limit reference."""

import math

import pytest

from go_muse_spark.operators.survival import survival_km


def _ref_km(subjects):
    """subjects: list of (dur, censored). Returns {t: (n_risk, d, S)}."""
    times = sorted({d for d, c in subjects if not c})
    out, s = {}, 1.0
    for t in times:
        n_risk = sum(1 for d, _ in subjects if d >= t)
        d = sum(1 for dd, c in subjects if dd == t and not c)
        s *= (n_risk - d) / n_risk
        out[t] = (n_risk, d, s)
    return out


def _run(spark, subjects):
    df = spark.createDataFrame(subjects, "dur long, cen boolean")
    return {
        r["t"]: (r["n_risk"], r["n_events"], r["surv"])
        for r in survival_km(df, "dur", "cen").collect()
    }


def test_no_censoring_matches_empirical(spark):
    subs = [(5, False), (5, False), (10, False), (20, False)]
    got = _run(spark, subs)
    ref = _ref_km(subs)
    assert set(got) == set(ref)
    for t in ref:
        assert got[t][0] == ref[t][0] and got[t][1] == ref[t][1]
        assert got[t][2] == pytest.approx(ref[t][2], rel=1e-12)
    # all ended -> curve reaches exactly 0 at the last event
    assert got[20][2] == 0.0


def test_censoring_shrinks_risk_not_deaths(spark):
    subs = [
        (3, False),
        (4, True),   # censored at 4: at risk for t=3, gone by t=6
        (6, False),
        (8, True),
        (9, False),
    ]
    got = _run(spark, subs)
    ref = _ref_km(subs)
    for t in ref:
        assert got[t] == (
            ref[t][0],
            ref[t][1],
            pytest.approx(ref[t][2], rel=1e-12),
        )
    # censored durations emit no curve rows
    assert 4 not in got and 8 not in got
    # survival stays > 0: the last subject to leave was a death but
    # earlier censoring means S multiplies finite factors only
    assert got[9][2] == 0.0  # last at-risk subject dies at 9


def test_censored_tail_keeps_curve_positive(spark):
    subs = [(2, False), (5, False), (9, True), (9, True)]
    got = _run(spark, subs)
    # after the t=5 death, 2 censored subjects remain -> S stays > 0
    assert got[5][2] == pytest.approx(0.75 * (2 / 3), rel=1e-12)


def test_km_beats_naive_under_censoring(spark):
    # naive "drop censored" underestimates survival
    subs = [(1, False)] * 2 + [(10, True)] * 8
    got = _run(spark, subs)
    assert got[1][2] == pytest.approx(0.8, rel=1e-12)  # 8/10 survive
    # naive on uncensored only would say S(1) = 0


def test_random_censoring_matches_reference(spark):
    import random

    for seed in (7, 41):
        rng = random.Random(seed)
        subs = [
            (rng.randint(1, 30), rng.random() < 0.3) for _ in range(120)
        ]
        got = _run(spark, subs)
        ref = _ref_km(subs)
        assert set(got) == set(ref)
        for t in ref:
            assert got[t][0] == ref[t][0] and got[t][1] == ref[t][1]
            assert got[t][2] == pytest.approx(ref[t][2], rel=1e-12)
        # survival is non-increasing along t
        ts = sorted(got)
        for a, b in zip(ts, ts[1:]):
            assert got[b][2] <= got[a][2] + 1e-15
