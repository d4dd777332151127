"""time_weighted_avg / state_durations: hand-computed fixtures plus a
random parity check against a pure-Python segment simulator."""

import datetime as dt
import random

from pyspark.sql import functions as F

from go_muse_spark.operators.timeweight import (
    state_durations,
    time_weighted_avg,
)

US = 1_000_000
EPOCH = dt.datetime(2024, 1, 1)


def _ts(secs):
    return EPOCH + dt.timedelta(seconds=secs)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double, state string")


def test_twa_hand_fixture(spark):
    # events: t=0 v=1, t=30 v=3, t=100 v=5; hold 50s; buckets 60s
    df = _events(
        spark,
        [
            (1, _ts(0), 1.0, "a"),
            (1, _ts(30), 3.0, "a"),
            (1, _ts(100), 5.0, "a"),
        ],
    )
    out = {
        r["bucket_epoch"]: r
        for r in time_weighted_avg(df, "value", 60, 50).collect()
    }
    # bucket starts are absolute epochs; re-key relative to the first
    e0 = min(out)
    rel = {k - e0: out[k] for k in out}
    # b0: seg [0,30)x1 + [30,60)x3 -> covered 60s, twa 2.0
    assert rel[0]["covered_us"] == 60 * US
    assert abs(rel[0]["twa"] - 2.0) < 1e-12
    # b1: seg [60,80)x3 + [100,120)x5 -> covered 40s, twa 4.0
    assert rel[60]["covered_us"] == 40 * US
    assert abs(rel[60]["twa"] - 4.0) < 1e-12
    # b2: seg [120,150)x5 -> covered 30s, twa 5.0
    assert rel[120]["covered_us"] == 30 * US
    assert abs(rel[120]["twa"] - 5.0) < 1e-12
    assert len(rel) == 3


def test_state_durations_hand_fixture(spark):
    # a at t=0, b at t=45, a at t=70; hold 100s; buckets 60s
    df = _events(
        spark,
        [
            (1, _ts(0), 0.0, "a"),
            (1, _ts(45), 0.0, "b"),
            (1, _ts(70), 0.0, "a"),
        ],
    )
    rows = state_durations(df, "state", 60, 100).collect()
    e0 = min(r["bucket_epoch"] for r in rows)
    got = {(r["bucket_epoch"] - e0, r["state"]): (r["dur_us"], r["n_enters"]) for r in rows}
    # b0 [0,60): a [0,45)=45s (enters), b [45,60)=15s (enters)
    assert got[(0, "a")] == (45 * US, 1)
    assert got[(0, "b")] == (15 * US, 1)
    # b1 [60,120): b [60,70)=10s carry-in (no enter), a [70,120)=50s (enters)
    assert got[(60, "b")] == (10 * US, 0)
    assert got[(60, "a")] == (50 * US, 1)
    # b2 [120,180): a carry [120,170)=50s (hold expires at 70+100)
    assert got[(120, "a")] == (50 * US, 0)
    assert len(got) == 5


def _simulate(rows, bucket, hold):
    """Pure-Python oracle: integral + covered per (user, bucket)."""
    per_user = {}
    for u, t, v, _s in rows:
        us = (t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        per_user.setdefault(u, []).append((us, v))
    acc = {}
    for u, pts in per_user.items():
        pts.sort()
        for i, (t, v) in enumerate(pts):
            e = min(pts[i + 1][0] if i + 1 < len(pts) else t + hold * US, t + hold * US)
            vmu = round(v * 1000)
            k = t // (bucket * US)
            while k * bucket * US < e:
                lo = max(t, k * bucket * US)
                hi = min(e, (k + 1) * bucket * US)
                if hi > lo:
                    num, cov = acc.get((u, k), (0, 0))
                    acc[(u, k)] = (num + vmu * (hi - lo), cov + hi - lo)
                k += 1
    return {
        (u, k * bucket): (num / cov / 1000.0, cov)
        for (u, k), (num, cov) in acc.items()
    }


def test_twa_random_parity(spark):
    rng = random.Random(7)
    rows = []
    for u in range(5):
        t = 0.0
        for _ in range(40):
            t += rng.expovariate(1 / 90.0)
            rows.append((u, _ts(t), rng.uniform(-5, 5), "x"))
    df = _events(spark, rows)
    want = _simulate(rows, 120, 300)
    got2 = {
        (r["user_id"], r["bucket_epoch"]): (r["twa"], r["covered_us"])
        for r in time_weighted_avg(df, "value", 120, 300).collect()
    }
    assert set(got2) == set(want)
    for key in want:
        tw, cov = want[key]
        gtw, gcov = got2[key]
        assert gcov == cov, key
        assert abs(gtw - tw) < 1e-9, key


def test_state_durations_conserve_time(spark):
    rng = random.Random(11)
    rows = []
    for u in range(4):
        t = 0.0
        for _ in range(30):
            t += rng.expovariate(1 / 60.0)
            rows.append((u, _ts(t), 0.0, rng.choice("abc")))
    df = _events(spark, rows)
    out = state_durations(df, "state", 60, 240)
    # per (user, bucket): total duration across states <= bucket length
    per_bucket = (
        out.groupBy("user_id", "bucket_epoch")
        .agg(F.sum("dur_us").alias("d"))
        .collect()
    )
    assert per_bucket
    assert all(r["d"] <= 60 * US for r in per_bucket)
    # total across everything == sum of segment lengths (disjointness)
    total = sum(r["d"] for r in per_bucket)
    sim = _simulate(rows, 60, 240)
    assert total == sum(cov for (_tw, cov) in sim.values())


def test_instant_snapshot_staleness_and_ties(spark):
    import datetime as dt

    import pandas as pd

    from go_muse_spark.operators.timeweight import instant_snapshot

    t0 = dt.datetime(2026, 1, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        # u1: fresh observation at minute 55 wins over minute 30
        (1, mk(30), 10.0), (1, mk(55), 20.0),
        # u2: last report outside the 30m lookback -> absent
        (2, mk(20), 99.0),
        # u3: duplicate timestamp -> larger payload wins (struct tiebreak)
        (3, mk(50), 5.0), (3, mk(50), 7.0),
        # u4: exactly AT the snapshot instant -> included (half-open lower)
        (4, mk(60), 42.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    )
    out = {
        r["user_id"]: r
        for r in instant_snapshot(
            df,
            "2026-01-01 01:00:00",
            30 * 60,
            by=("user_id",),
            payload={"vmu": "cast(round(value * 1000) as bigint)"},
        ).collect()
    }
    assert set(out) == {1, 3, 4}
    assert out[1]["vmu"] == 20000
    assert out[3]["vmu"] == 7000
    assert out[4]["vmu"] == 42000


def test_instant_snapshot_validates(spark):
    import pandas as pd
    import pytest

    from go_muse_spark.operators.timeweight import instant_snapshot

    df = spark.createDataFrame(
        pd.DataFrame([(1, dt.datetime(2026, 1, 1), 1.0)],
                     columns=["user_id", "ts", "value"])
    )
    with pytest.raises(ValueError):
        instant_snapshot(df, "2026-01-01 00:00:00", 0)


def test_state_transitions_compaction(spark):
    import pandas as pd

    from go_muse_spark.operators.timeweight import state_transitions

    t0 = dt.datetime(2026, 1, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        (1, mk(0), "up"), (1, mk(1), "up"), (1, mk(2), "down"),
        (1, mk(3), "down"), (1, mk(4), "up"),
        (2, mk(0), "up"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    )
    out = sorted(
        state_transitions(df, "event_type", by=("user_id",)).collect(),
        key=lambda r: (r["user_id"], r["trans_idx"]),
    )
    flat = [
        (r["user_id"], r["from_state"], r["to_state"], r["trans_idx"])
        for r in out
    ]
    assert flat == [
        (1, None, "up", 1),
        (1, "up", "down", 2),
        (1, "down", "up", 3),
        (2, None, "up", 1),
    ]
