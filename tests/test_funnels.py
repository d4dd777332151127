"""funnel_steps / cohort_retention: hand fixtures + random parity with
a pure-Python simulator."""

import datetime as dt
import random

from go_muse_spark.operators.funnels import cohort_retention, funnel_steps

EPOCH = dt.datetime(2024, 1, 1)
US = 1_000_000


def _ts(secs):
    return EPOCH + dt.timedelta(seconds=secs)


def _us(secs):
    base = (EPOCH - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    return base + int(secs * US)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


STEPS = ["view", "click", "purchase"]


def test_funnel_hand_fixture(spark):
    rows = [
        # u1: purchase happens BEFORE the click -> chain stops at 2
        (1, _ts(0), "view"), (1, _ts(3), "purchase"), (1, _ts(5), "click"),
        # u2: full ordered chain; later duplicates must not matter
        (2, _ts(10), "view"), (2, _ts(11), "click"), (2, _ts(12), "purchase"),
        (2, _ts(13), "view"),
        # u3: click without view -> not a funnel entrant
        (3, _ts(1), "click"),
        # u4: view only
        (4, _ts(2), "view"),
    ]
    out = {r["user_id"]: r for r in funnel_steps(_events(spark, rows), STEPS).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["n_steps"] == 2 and out[1]["step3_us"] is None
    assert out[1]["step2_us"] == _us(5)
    assert out[2]["n_steps"] == 3
    assert (out[2]["step1_us"], out[2]["step2_us"], out[2]["step3_us"]) == (
        _us(10), _us(11), _us(12))
    assert out[4]["n_steps"] == 1 and out[4]["step2_us"] is None


def _sim_funnel(rows, steps):
    per = {}
    for u, t, e in rows:
        us = (t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        per.setdefault(u, []).append((us, e))
    out = {}
    for u, evs in per.items():
        evs.sort()
        reached, last = [], -1
        for s in steps:
            nxt = min((t for t, e in evs if e == s and t > last), default=None)
            if nxt is None:
                break
            reached.append(nxt)
            last = nxt
        if reached:
            out[u] = reached
    return out


def test_funnel_random_parity(spark):
    rng = random.Random(3)
    rows = []
    for u in range(40):
        t = 0.0
        for _ in range(rng.randrange(0, 15)):
            t += rng.expovariate(1 / 30.0)
            rows.append((u, _ts(t), rng.choice(["view", "click", "purchase", "other"])))
    if not rows:
        rows = [(0, _ts(0), "view")]
    want = _sim_funnel(rows, STEPS)
    got = {r["user_id"]: r for r in funnel_steps(_events(spark, rows), STEPS).collect()}
    assert set(got) == set(want)
    for u, chain in want.items():
        r = got[u]
        assert r["n_steps"] == len(chain), u
        for i, tus in enumerate(chain):
            assert r[f"step{i + 1}_us"] == tus, (u, i)
        for i in range(len(chain), 3):
            assert r[f"step{i + 1}_us"] is None, (u, i)


def test_cohort_hand_fixture(spark):
    day = 86400
    rows = [
        (1, _ts(0), "view"), (1, _ts(day + 5), "view"), (1, _ts(3 * day), "view"),
        (2, _ts(10), "view"), (2, _ts(20), "click"),
        (3, _ts(day), "view"), (3, _ts(2 * day), "view"),
    ]
    out = {
        (r["cohort_epoch"], r["offset"]): r["n_users"]
        for r in cohort_retention(_events(spark, rows), day).collect()
    }
    d0 = (_us(0) // (day * US)) * day
    # cohort day0: users 1,2 -> offset0=2, offset1=1 (u1), offset3=1 (u1)
    assert out[(d0, 0)] == 2
    assert out[(d0, 1)] == 1
    assert out[(d0, 3)] == 1
    # cohort day1: user 3 -> offset0=1, offset1=1
    assert out[(d0 + day, 0)] == 1
    assert out[(d0 + day, 1)] == 1
    assert len(out) == 5


def test_cohort_offset0_is_cohort_size(spark):
    rng = random.Random(9)
    rows = []
    for u in range(60):
        start = rng.randrange(0, 5) * 86400 + rng.randrange(0, 86400)
        for _ in range(rng.randrange(1, 8)):
            rows.append((u, _ts(start + rng.randrange(0, 10 * 86400)), "view"))
    df = _events(spark, rows)
    out = cohort_retention(df, 86400).collect()
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r["cohort_epoch"], {})[r["offset"]] = r["n_users"]
    # offset 0 row exists for every cohort and equals its max count
    total = 0
    for c, offs in by_cohort.items():
        assert 0 in offs, c
        assert offs[0] == max(offs.values()), c
        total += offs[0]
    assert total == 60  # every user lands in exactly one cohort
