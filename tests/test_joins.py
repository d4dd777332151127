"""asof_join semantics: backward match, inclusivity, nulls, tolerance."""

import datetime as dt

from pyspark.sql import functions as F

from go_muse_spark.operators.joins import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [("a", _ts(5), 1), ("a", _ts(10), 2), ("a", _ts(20), 3),
         ("b", _ts(7), 4)],
        "k string, ts timestamp, lv long",
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 100.0), ("a", _ts(15), 150.0), ("b", _ts(9), 900.0)],
        "k string, ts timestamp, rv double",
    )
    got = {
        r["lv"]: (r["rv_r"], r["ts_r"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert got[1] == (None, None)            # nothing at-or-before ts=5
    assert got[2] == (100.0, _ts(10))        # equal ts is INCLUSIVE
    assert got[3] == (150.0, _ts(15))        # latest prior, not first
    assert got[4] == (None, None)            # right row is in the future


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [("a", _ts(100), 1)], "k string, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 5.0)], "k string, ts timestamp, rv double"
    )
    loose = asof_join(left, right, on=["k"], tolerance_s=1000).collect()[0]
    tight = asof_join(left, right, on=["k"], tolerance_s=10).collect()[0]
    assert loose["rv_r"] == 5.0
    assert tight["rv_r"] is None and tight["ts_r"] is None


def test_asof_one_exchange_plan(spark):
    """The composition must stay a single keyed exchange — no inequality
    join, no cartesian."""
    left = spark.createDataFrame(
        [("a", _ts(5), 1)], "k string, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 2.0)], "k string, ts timestamp, rv double"
    )
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against an independent implementation:
    pandas.merge_asof(direction='backward') on the same data."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 80),
            "ts": pd.to_datetime(rng.integers(0, 10_000, 80), unit="s"),
            "lv": np.arange(80),
        }
    ).drop_duplicates(["k", "ts"])
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 60),
            "ts": pd.to_datetime(rng.integers(0, 10_000, 60), unit="s"),
            "rv": rng.normal(size=60).round(6),
        }
    ).drop_duplicates(["k", "ts"])

    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), on=["k"]
        )
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lv").reset_index(drop=True)
    assert list(got["lv"]) == list(want["lv"])
    a = got["rv_r"].fillna(-999).to_numpy()
    b = want["rv"].fillna(-999).to_numpy()
    assert (a == b).all()


def test_asof_null_payload_row_is_still_the_match(spark):
    """A right row with a NULL payload IS the latest match (DuckDB ASOF
    semantics): the join must not stitch an older value onto a newer
    timestamp."""
    left = spark.createDataFrame(
        [("a", _ts(12), 1)], "k string, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 5.0), ("a", _ts(10), None)],
        "k string, ts timestamp, rv double",
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row["ts_r"] == _ts(10)
    assert row["rv_r"] is None  # the ts-10 row's value, not ts-5's 5.0


def test_asof_column_collision_raises(spark):
    import pytest

    left = spark.createDataFrame(
        [("a", _ts(5), 1.0)], "k string, ts timestamp, rv_r double"
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 2.0)], "k string, ts timestamp, rv double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"])


def test_asof_bucketed_parity_randomized(spark):
    """The skew-proof (key, time-bucket) variant must return exactly the
    plain path's rows for every bucket width — including widths far
    smaller than the match gaps, where most matches resolve through the
    carried boundary spine rather than in-bucket."""
    import numpy as np

    rng = np.random.default_rng(11)
    keys = ["a", "b", "c"]
    left = spark.createDataFrame(
        [
            (keys[int(k)], _ts(int(s)), i)
            for i, (k, s) in enumerate(
                zip(rng.integers(0, 3, 120), rng.integers(0, 500, 120))
            )
        ],
        "k string, ts timestamp, lv long",
    )
    right = spark.createDataFrame(
        [
            (keys[int(k)], _ts(int(s)), float(i))
            for i, (k, s) in enumerate(
                zip(rng.integers(0, 3, 60), rng.integers(0, 500, 60))
            )
        ],
        "k string, ts timestamp, rv double",
    )
    # dedupe right to one row per (key, ts): equal-ts winner is
    # unspecified in BOTH paths, so parity needs a deterministic right
    right = right.groupBy("k", "ts").agg(F.max("rv").alias("rv"))

    def rows(df):
        return sorted(
            (r["lv"], r["rv_r"], r["ts_r"]) for r in df.collect()
        )

    plain = rows(asof_join(left, right, on=["k"]))
    for bucket in (7, 60, 10_000):
        got = rows(asof_join(left, right, on=["k"], bucket_secs=bucket))
        assert got == plain, f"bucket_secs={bucket} diverges"
    # tolerance composes with the bucketed path too
    tol_plain = rows(asof_join(left, right, on=["k"], tolerance_s=30))
    tol_b = rows(
        asof_join(left, right, on=["k"], tolerance_s=30, bucket_secs=7)
    )
    assert tol_b == tol_plain


def test_asof_bucketed_no_cartesian_plan(spark):
    left = spark.createDataFrame(
        [("a", _ts(5), 1)], "k string, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 2.0)], "k string, ts timestamp, rv double"
    )
    plan = (
        asof_join(left, right, on=["k"], bucket_secs=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- interval_join


def test_interval_containment_and_overlap(spark):
    from go_muse_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", _ts(5), 1), ("a", _ts(100), 2), ("a", _ts(250), 3),
         ("b", _ts(5), 4)],
        "k string, ts timestamp, pid long",
    )
    # two overlapping windows on key a; none on b at t=5
    ivs = spark.createDataFrame(
        [("a", _ts(0), _ts(120), 10), ("a", _ts(90), _ts(300), 20),
         ("b", _ts(50), _ts(60), 30)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    got = sorted(
        (r["pid"], r["wid_w"])
        for r in interval_join(pts, ivs, on=["k"], bucket_secs=60).collect()
    )
    # pid 1 -> w10 only; pid 2 -> BOTH (overlap); pid 3 -> w20; pid 4 -> none
    assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]


def test_interval_closed_bounds(spark):
    from go_muse_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", _ts(0), 1), ("a", _ts(120), 2), ("a", _ts(121), 3)],
        "k string, ts timestamp, pid long",
    )
    ivs = spark.createDataFrame(
        [("a", _ts(0), _ts(120), 10)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    got = sorted(
        r["pid"]
        for r in interval_join(pts, ivs, on=["k"], bucket_secs=7).collect()
    )
    assert got == [1, 2]  # both ends inclusive, 121 outside


def test_interval_matches_bruteforce_randomized(spark):
    import random

    from go_muse_spark.operators.joins import interval_join

    rng = random.Random(17)
    pts_rows = [
        (str(rng.randrange(4)), _ts(rng.randrange(5000)), i)
        for i in range(300)
    ]
    ivs_rows = []
    for j in range(60):
        s = rng.randrange(5000)
        ivs_rows.append(
            (str(rng.randrange(4)), _ts(s), _ts(s + rng.randrange(900)), j)
        )
    pts = spark.createDataFrame(
        pts_rows, "k string, ts timestamp, pid long"
    )
    ivs = spark.createDataFrame(
        ivs_rows, "k string, start_ts timestamp, end_ts timestamp, wid long"
    )
    want = sorted(
        (p[2], w[3])
        for p in pts_rows
        for w in ivs_rows
        if p[0] == w[0] and w[1] <= p[1] <= w[2]
    )
    for bucket in (60, 333, 3600):
        got = sorted(
            (r["pid"], r["wid_w"])
            for r in interval_join(
                pts, ivs, on=["k"], bucket_secs=bucket
            ).collect()
        )
        assert got == want, bucket


def test_interval_no_cartesian_plan(spark):
    from go_muse_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", _ts(5), 1)], "k string, ts timestamp, pid long"
    )
    ivs = spark.createDataFrame(
        [("a", _ts(0), _ts(60), 9)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    plan = (
        interval_join(pts, ivs, on=["k"], bucket_secs=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_malformed_raises(spark):
    import pytest

    from go_muse_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", _ts(5), 1)], "k string, ts timestamp, pid long"
    )
    bad = spark.createDataFrame(
        [("a", _ts(60), _ts(0), 9)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    with pytest.raises(Exception, match="interval_join"):
        interval_join(pts, bad, on=["k"], bucket_secs=60).collect()
    wide = spark.createDataFrame(
        [("a", _ts(0), _ts(10_000_000), 9)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    with pytest.raises(Exception, match="interval_join"):
        interval_join(
            pts, wide, on=["k"], bucket_secs=60, max_span_buckets=100
        ).collect()


def test_interval_collision_raises(spark):
    import pytest

    from go_muse_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        [("a", _ts(5), 1, 0)], "k string, ts timestamp, pid long, wid_w long"
    )
    ivs = spark.createDataFrame(
        [("a", _ts(0), _ts(60), 9)],
        "k string, start_ts timestamp, end_ts timestamp, wid long",
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, ivs, on=["k"], bucket_secs=60)


def test_asof_interp_bracketed_lerp(spark):
    from go_muse_spark.operators.joins import asof_interp_join

    left = spark.createDataFrame(
        [("a", _ts(5), 1), ("a", _ts(10), 2), ("a", _ts(12), 3),
         ("a", _ts(25), 4), ("a", _ts(2), 5), ("b", _ts(7), 6)],
        "k string, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("a", _ts(4), 10.0), ("a", _ts(10), 40.0), ("a", _ts(20), 90.0)],
        "k string, ts timestamp, value double",
    )
    out = {
        r["lid"]: r
        for r in asof_interp_join(
            left, right, ["k"], "value"
        ).collect()
    }
    # t=5 between (4,10) and (10,40): 10 + 30 * 1/6
    assert abs(out[1]["value_i"] - (10.0 + 30.0 / 6.0)) < 1e-12
    # exact hit at t=10 -> row value, prev ts == t
    assert out[2]["value_i"] == 40.0
    assert out[2]["ts_prev"] == _ts(10)
    # t=12 between (10,40) and (20,90): 40 + 50 * 0.2
    assert abs(out[3]["value_i"] - 50.0) < 1e-12
    # t=25 after the last right row -> NULL (no extrapolation)
    assert out[4]["value_i"] is None and out[4]["ts_next"] is None
    assert out[4]["ts_prev"] == _ts(20)
    # t=2 before the first right row -> NULL
    assert out[5]["value_i"] is None and out[5]["ts_prev"] is None
    # key with no right rows at all -> NULL
    assert out[6]["value_i"] is None


def test_asof_interp_collision_raises(spark):
    import pytest

    from go_muse_spark.operators.joins import asof_interp_join

    left = spark.createDataFrame(
        [("a", _ts(5), 0.0)], "k string, ts timestamp, value_i double"
    )
    right = spark.createDataFrame(
        [("a", _ts(4), 1.0)], "k string, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_interp_join(left, right, ["k"], "value")


def test_asof_nearest_pandas_parity(spark):
    """nearest direction incl. the pandas tie rule (equal distance ->
    backward) and edge cases: no prev, no next, exact hit."""
    import datetime as dt
    from go_muse_spark.operators.joins import asof_nearest_join

    t0 = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=s))
         for s in (0, 10, 14, 15, 16, 40)],
        "k string, ts timestamp",
    )
    R = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=10), 1.0),
         ("k", t0 + dt.timedelta(seconds=20), 2.0),
         ("z", t0, 9.0)],
        "k string, ts timestamp, value double",
    )
    out = {r["ts"].second: (r["value_n"], r["ts_match"].second)
           for r in asof_nearest_join(L, R, ["k"], "value").collect()}
    assert out[0] == (1.0, 10)    # no prev -> forward
    assert out[10] == (1.0, 10)   # exact hit -> distance 0, backward
    assert out[14] == (1.0, 10)   # 4s back vs 6s fwd
    assert out[15] == (1.0, 10)   # TIE (5s both) -> backward (pandas)
    assert out[16] == (2.0, 20)   # 6s back vs 4s fwd
    assert out[40] == (2.0, 20)   # no next -> backward
    # key with no right rows at all -> NULLs
    L2 = spark.createDataFrame([("nope", t0)], "k string, ts timestamp")
    r2 = asof_nearest_join(L2, R, ["k"], "value").collect()[0]
    assert r2["value_n"] is None and r2["ts_match"] is None
    # pandas cross-check on the same data
    import pandas as pd
    lp = L.toPandas().sort_values("ts")
    rp = R.toPandas().sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    want = {t.second: v for t, v in zip(m["ts"], m["value"])}
    got = {s: v for s, (v, _) in out.items()}
    assert got == want


def test_asof_forward_pandas_parity(spark):
    """forward direction (earliest at-or-after, exact hit inclusive) vs
    pandas merge_asof(direction='forward'), plus the no-next NULL."""
    import datetime as dt
    from go_muse_spark.operators.joins import asof_forward_join

    t0 = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=s))
         for s in (0, 10, 14, 20, 21, 40)],
        "k string, ts timestamp",
    )
    R = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=10), 1.0),
         ("k", t0 + dt.timedelta(seconds=20), 2.0),
         ("z", t0, 9.0)],
        "k string, ts timestamp, value double",
    )
    rows = asof_forward_join(L, R, ["k"], "value").collect()
    out = {r["ts"].second: (r["value_f"],
                            r["ts_match"].second if r["ts_match"] else None)
           for r in rows}
    assert out[0] == (1.0, 10)    # strictly before both -> first
    assert out[10] == (1.0, 10)   # exact hit INCLUSIVE
    assert out[14] == (2.0, 20)   # next is 20
    assert out[20] == (2.0, 20)   # exact hit on the later row
    assert out[21] == (None, None)  # nothing after
    assert out[40] == (None, None)
    # key with no right rows -> NULLs
    L2 = spark.createDataFrame([("nope", t0)], "k string, ts timestamp")
    r2 = asof_forward_join(L2, R, ["k"], "value").collect()[0]
    assert r2["value_f"] is None and r2["ts_match"] is None
    # pandas cross-check
    import pandas as pd
    lp = L.toPandas().sort_values("ts")
    rp = R.toPandas().sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    want = {t.second: (None if pd.isna(v) else v)
            for t, v in zip(m["ts"], m["value"])}
    got = {s: v for s, (v, _) in out.items()}
    assert got == want
