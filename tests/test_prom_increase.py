"""prom_increase: Prometheus extrapolatedRate parity on hand-computed
fixtures (boundary extrapolation, 1.1x threshold, duration-to-zero
clamp, counter resets, gauge mode, <2-sample guard)."""

import datetime as dt

import pytest

from go_muse_spark.operators.rollup import prom_increase

H0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [("a", H0 + dt.timedelta(seconds=s), float(v), i)
         for i, (s, v) in enumerate(rows)],
        "conv_id string, ts timestamp, v double, seq long",
    )


def _run(spark, rows, counter=True):
    df = _mk(spark, rows)
    out = prom_increase(
        df, "v", "1h", by=("conv_id",), counter=counter,
        order_cols=("seq",),
    ).collect()
    return {r["bucket_ts"]: r for r in out}


def _expected(samples, bucket_start_s=0, range_s=3600, counter=True):
    ts = [s for s, _ in samples]
    vs = [v for _, v in samples]
    if counter:
        raw = 0.0
        for i in range(1, len(vs)):
            d = vs[i] - vs[i - 1]
            raw += d if d >= 0 else vs[i]
    else:
        raw = float(vs[-1] - vs[0])
    sampled = float(ts[-1] - ts[0])
    avg = sampled / (len(ts) - 1)
    dstart = float(ts[0] - bucket_start_s)
    dend = float(bucket_start_s + range_s - ts[-1])
    if dstart >= 1.1 * avg:
        dstart = avg / 2
    if counter and raw > 0 and vs[0] >= 0:
        dzero = sampled * (vs[0] / raw)
        if dzero < dstart:
            dstart = dzero
    if dend >= 1.1 * avg:
        dend = avg / 2
    return raw * ((sampled + dstart + dend) / sampled)


def test_extrapolates_to_bucket_edges(spark):
    # dense regular samples well inside the hour: both edges capped at
    # avg/2 (1.1x rule), no zero-clamp (v0 large)
    rows = [(600 + 60 * i, 1000 + 10 * i) for i in range(30)]
    got = _run(spark, rows)[H0]
    assert got["raw_increase"] == 290.0
    assert abs(got["increase"] - _expected(rows)) < 1e-9
    assert got["n_samples"] == 30


def test_short_boundary_gap_used_verbatim(spark):
    # first sample 10s into the hour, avg spacing 120s: 10 < 1.1*120,
    # so the true gap (not avg/2) extends the interval
    rows = [(10 + 120 * i, 500 + i) for i in range(28)]
    got = _run(spark, rows)[H0]
    assert abs(got["increase"] - _expected(rows)) < 1e-9


def test_duration_to_zero_clamps_counter_start(spark):
    # counter born mid-bucket: v0 tiny vs raw increase, so the
    # extrapolation toward the bucket start is clamped at the implied
    # time-of-zero instead of avg/2
    rows = [(1800 + 60 * i, 1 + 100 * i) for i in range(10)]
    exp = _expected(rows)
    got = _run(spark, rows)[H0]
    assert abs(got["increase"] - exp) < 1e-9
    # the clamp actually engaged
    raw, sampled = 900.0, 540.0
    assert sampled * (1.0 / raw) < (sampled / 9) / 2


def test_counter_reset_compensation(spark):
    rows = [(0, 10), (600, 20), (1200, 3), (1800, 8), (3599, 9)]
    got = _run(spark, rows)[H0]
    # raw: +10, reset -> +3, +5, +1 = 19
    assert got["raw_increase"] == 19.0
    assert abs(got["increase"] - _expected(rows)) < 1e-9


def test_gauge_mode_allows_negative_delta(spark):
    rows = [(0, 10), (1200, 4), (3599, 7)]
    got = _run(spark, rows, counter=False)[H0]
    assert got["raw_increase"] == -3.0
    assert abs(got["increase"] - _expected(rows, counter=False)) < 1e-9


def test_single_sample_and_zero_span_buckets_dropped(spark):
    rows = [(0, 1)]  # one sample in 10:00
    rows2 = [(3600, 5), (3600, 7)]  # two samples, same microsecond, 11:00
    out = _run(spark, rows + rows2)
    assert H0 not in out
    assert H0 + dt.timedelta(hours=1) not in out


def test_buckets_are_independent(spark):
    rows = [(60 * i, i) for i in range(120)]  # spans two hours
    out = _run(spark, rows)
    b0 = [(s, v) for s, v in rows if s < 3600]
    b1 = [(s - 3600, v) for s, v in rows if s >= 3600]
    assert abs(out[H0]["increase"] - _expected(b0)) < 1e-9
    assert abs(
        out[H0 + dt.timedelta(hours=1)]["increase"] - _expected(b1)
    ) < 1e-9


def test_rate_is_increase_over_range_seconds(spark):
    """rate(): identical extrapolation, divided by the range width."""
    from go_muse_spark.operators.rollup import prom_rate

    rows = [(600 + 60 * i, 1000 + 10 * i) for i in range(30)]
    df = _mk(spark, rows)
    got = {
        r["bucket_ts"]: r
        for r in prom_rate(
            df, "v", "1h", by=("conv_id",), order_cols=("seq",)
        ).collect()
    }[H0]
    exp = _expected(rows)
    assert abs(got["increase"] - exp) < 1e-9
    assert abs(got["rate_per_s"] - exp / 3600.0) < 1e-12


def test_resets_counts_strict_decreases(spark):
    """resets(): one per strict in-bucket decrease; single-sample
    buckets report 0; equal consecutive values are not resets."""
    from go_muse_spark.operators.rollup import prom_resets

    rows = [
        (0, 10), (600, 20), (1200, 3),    # reset 1
        (1800, 8), (2400, 8),             # equal: no reset
        (3000, 2),                        # reset 2
        (3600, 5),                        # next bucket, 1 sample
    ]
    df = _mk(spark, rows)
    out = {
        r["bucket_ts"]: r
        for r in prom_resets(
            df, "v", tier="1h", by=("conv_id",), order_cols=("seq",)
        ).collect()
    }
    assert out[H0]["resets"] == 2
    assert out[H0]["n_samples"] == 6
    b1 = H0 + dt.timedelta(hours=1)
    assert out[b1]["resets"] == 0
    assert out[b1]["n_samples"] == 1


def test_changes_counts_any_difference(spark):
    """changes(): one per consecutive-sample difference in either
    direction; equal neighbors don't count; single-sample buckets 0;
    resets() is always <= changes() on the same stream."""
    from go_muse_spark.operators.rollup import prom_changes

    rows = [
        (0, 10), (600, 20), (1200, 3),    # up + down = 2 changes
        (1800, 8), (2400, 8),             # equal: no change
        (3000, 2),                        # down = 1 change
        (3600, 5),                        # next bucket, 1 sample
    ]
    df = _mk(spark, rows)
    out = {
        r["bucket_ts"]: r
        for r in prom_changes(
            df, "v", tier="1h", by=("conv_id",), order_cols=("seq",)
        ).collect()
    }
    assert out[H0]["changes"] == 4  # 10->20, 20->3, 3->8, 8->2
    assert out[H0]["n_samples"] == 6
    b1 = H0 + dt.timedelta(hours=1)
    assert out[b1]["changes"] == 0
    assert out[b1]["n_samples"] == 1


def test_irate_hand_fixtures(spark):
    """irate: last-two-samples rate, reset rule, tie-break, and the
    <2-samples / zero-span drop rules."""
    import datetime as dt
    from pyspark.sql import functions as F  # noqa: F401
    from go_muse_spark.operators.rollup import prom_irate

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # series a, one bucket: samples at :00 v=10, :10 v=16, :40 v=31
        # -> irate from (:10,16)->(:40,31): 15/30 = 0.5/s
        ("a", t0, 1, 10.0),
        ("a", t0 + dt.timedelta(seconds=10), 2, 16.0),
        ("a", t0 + dt.timedelta(seconds=40), 3, 31.0),
        # series b: counter RESET (40 -> 5): increase = post-reset value
        ("b", t0, 4, 40.0),
        ("b", t0 + dt.timedelta(seconds=20), 5, 5.0),
        # series c: single sample -> dropped
        ("c", t0, 6, 7.0),
        # series d: two samples at the SAME ts -> one distinct
        # timestamp after dedup, dropped
        ("d", t0, 7, 1.0),
        ("d", t0, 8, 2.0),
        # series e: duplicate scrape at the LATEST instant — dedup
        # keeps the event_id-8 winner (v=7) and falls back to the
        # previous DISTINCT timestamp: (7-1)/10 = 0.6/s (the pre-fix
        # engine dropped this bucket outright)
        ("e", t0, 6, 1.0),
        ("e", t0 + dt.timedelta(seconds=10), 7, 5.0),
        ("e", t0 + dt.timedelta(seconds=10), 8, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "k string, ts timestamp, event_id long, value double"
    )
    out = {
        r["k"]: r
        for r in prom_irate(
            ev, "value", tier="1h", by=("k",), order_cols=("event_id",)
        ).collect()
    }
    assert set(out) == {"a", "b", "e"}
    assert out["a"]["delta"] == 15.0
    assert abs(out["a"]["irate_per_s"] - 0.5) < 1e-12
    assert out["b"]["delta"] == 5.0  # reset: post-reset value
    assert abs(out["b"]["irate_per_s"] - 0.25) < 1e-12
    assert out["e"]["delta"] == 6.0  # dup-ts winner 7.0 minus 1.0
    assert abs(out["e"]["irate_per_s"] - 0.6) < 1e-12
    # gauge mode: no reset correction, delta goes negative
    g = {
        r["k"]: r
        for r in prom_irate(
            ev, "value", tier="1h", by=("k",), counter=False,
            order_cols=("event_id",),
        ).collect()
    }
    assert g["b"]["delta"] == -35.0


def test_delta_gauge_no_reset_correction(spark):
    """counter=False: a mid-bucket drop is NOT treated as a reset —
    delta is the extrapolated last-minus-first, sign and all."""
    from go_muse_spark.operators.rollup import prom_increase

    rows = [(600 + 600 * i, v) for i, v in enumerate([50, 80, 20, 35])]
    df = _mk(spark, rows)
    got = prom_increase(
        df, "v", "1h", by=("conv_id",), counter=False,
        order_cols=("seq",),
    ).collect()
    assert len(got) == 1
    r = got[0]
    # raw = 35 - 50 (no +80 reset term the counter path would add)
    assert r["raw_increase"] == -15.0
    assert abs(
        r["increase"] - _expected(rows, counter=False)
    ) < 1e-9


def test_deriv_matches_polyfit(spark):
    """deriv(): the exact-integer-sum slope equals numpy's least-squares
    fit on the same (seconds, value) points; buckets with <2 distinct
    timestamps are dropped."""
    import numpy as np

    from go_muse_spark.operators.rollup import prom_deriv

    rows = [(60 * i + 7, 3.25 + 0.5 * i + (i % 3) * 0.125)
            for i in range(12)]
    df = _mk(spark, rows)
    got = prom_deriv(df, "v", "1h", by=("conv_id",)).collect()
    assert len(got) == 1
    r = got[0]
    xs = np.array([s for s, _ in rows], dtype=float)
    ys = np.array([v for _, v in rows], dtype=float)
    slope = np.polyfit(xs, ys, 1)[0]
    assert r["n_samples"] == 12
    assert abs(r["slope"] - slope) < 1e-9

    # single-sample and zero-variance buckets vanish
    deg = _mk(spark, [(0, 1.0)])
    assert prom_deriv(deg, "v", "1h", by=("conv_id",)).count() == 0


def test_predict_linear_extends_the_fit(spark):
    """predict_linear(): the regression line evaluated t_ahead past the
    bucket end — for a perfectly linear gauge the prediction is exact."""
    from go_muse_spark.operators.rollup import prom_deriv

    # v = 10 + 0.01 * t_seconds, sampled every 5 min
    rows = [(300 * i, 10.0 + 0.01 * 300 * i) for i in range(12)]
    df = _mk(spark, rows)
    got = prom_deriv(
        df, "v", "1h", by=("conv_id",), t_ahead_secs=600
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert abs(r["slope"] - 0.01) < 1e-9
    # at bucket_end + 600s = t=4200s: 10 + 0.01*4200 = 52.0
    assert abs(r["predicted"] - 52.0) < 1e-6


def test_idelta_gauge_signed_no_reset_correction(spark):
    """idelta(): last-two-samples difference of a gauge — a drop yields
    a NEGATIVE delta (isRate=false, no reset branch), duplicate
    timestamps at the bucket tail fall back to the latest distinct
    one, and single-distinct-timestamp buckets vanish."""
    from go_muse_spark.operators.rollup import prom_irate

    # last two distinct-ts samples: 7.0 @120s then 4.5 @180s -> -2.5
    rows = [(0, 1.0), (60, 3.0), (120, 7.0), (180, 4.5)]
    out = prom_irate(
        _mk(spark, rows), "v", "1h", by=("conv_id",), counter=False,
        order_cols=("seq",),
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["delta"] - (-2.5)) < 1e-12

    # duplicate scrape at the latest instant: seq-max wins the dedup,
    # prev falls back to the latest DISTINCT earlier timestamp
    dup = [(0, 1.0), (60, 3.0), (180, 9.0), (180, 8.0)]
    out = prom_irate(
        _mk(spark, dup), "v", "1h", by=("conv_id",), counter=False,
        order_cols=("seq",),
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["delta"] - (8.0 - 3.0)) < 1e-12

    # all samples at one timestamp -> no distinct pair -> dropped
    deg = [(60, 1.0), (60, 2.0)]
    assert prom_irate(
        _mk(spark, deg), "v", "1h", by=("conv_id",), counter=False,
        order_cols=("seq",),
    ).count() == 0


def _hw_reference(ys, sf=0.5, tf=0.25):
    """Prometheus funcDoubleExponentialSmoothing, transcribed: seed
    s1=y[0], b=y[1]-y[0]; the trend update lags one sample."""
    s0, s1, b = 0.0, ys[0], ys[1] - ys[0]
    for i in range(1, len(ys)):
        if i - 1 != 0:
            b = tf * (s1 - s0) + (1.0 - tf) * b
        s0, s1 = s1, sf * ys[i] + (1.0 - sf) * (s1 + b)
    return s1


def test_holt_winters_matches_prometheus_recurrence(spark):
    """holt_winters(): the JVM aggregate-fold equals the published
    recurrence bit-for-bit; out-of-order input is sorted by timestamp
    first; <2-sample buckets vanish."""
    from go_muse_spark.operators.stats import holt_winters

    ys = [3.0, 7.0, 5.5, 9.25, 2.0, 6.125, 8.0]
    rows = [(60 * i, v) for i, v in enumerate(ys)]
    import random
    rng = random.Random(7)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    out = holt_winters(
        _mk(spark, shuffled), "v", "1h", by=("conv_id",)
    ).collect()
    assert len(out) == 1
    assert out[0]["n_samples"] == len(ys)
    assert out[0]["smoothed"] == _hw_reference(ys)

    # exactly two samples: one fold step, s1 = y1 analytically
    two = holt_winters(
        _mk(spark, [(0, 4.0), (60, 10.0)]), "v", "1h", by=("conv_id",)
    ).collect()
    assert len(two) == 1
    assert two[0]["smoothed"] == _hw_reference([4.0, 10.0])
    assert abs(two[0]["smoothed"] - 10.0) < 1e-12

    # single-sample bucket dropped
    assert holt_winters(
        _mk(spark, [(0, 1.0)]), "v", "1h", by=("conv_id",)
    ).count() == 0
