"""PromQL label_replace()/label_join() semantics and the count_values /
stdvar_over_time additions: fully-anchored match, capture expansion,
empty-expansion label removal, missing-src-as-empty, no-match passthrough,
join slot preservation; spread moments vs numpy population variance."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from go_muse_spark.labels import label_id_map, label_join, label_replace
from go_muse_spark.operators.rollup import count_values, moving_aggregate

H0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _dims_df(spark, rows):
    """rows: list of dict labels."""
    df = spark.createDataFrame([(i,) for i in range(len(rows))], "i long")
    pairs = sorted({k for r in rows for k in r})
    m = F.create_map(
        *[
            c
            for k in pairs
            for c in (
                F.lit(k),
                F.element_at(
                    F.map_from_arrays(
                        F.array(*[F.lit(str(j)) for j in range(len(rows))]),
                        F.array(*[F.lit(r.get(k)) for r in rows]),
                    ),
                    F.col("i").cast("string"),
                ),
            )
        ]
    )
    # drop null-valued entries (label absent on that row)
    m = F.map_filter(m, lambda _k, v: v.isNotNull())
    return df.withColumn("dims", m)


def _collect(df):
    rows = df.orderBy("i").select("dims").collect()
    return [dict(r["dims"]) for r in rows]


def test_label_replace_match_capture_and_passthrough(spark):
    rows = [
        {"job": "api-1", "instance": "h1"},
        {"job": "db-2", "instance": "h2"},
    ]
    out = _collect(
        label_replace(
            _dims_df(spark, rows), "dims", "svc", "$1", "job", "(api)-\\d+"
        )
    )
    # full-anchor match on api-1 -> svc=api; db-2 unmatched -> unchanged
    assert out[0] == {"job": "api-1", "instance": "h1", "svc": "api"}
    assert out[1] == {"job": "db-2", "instance": "h2"}


def test_label_replace_partial_match_is_not_a_match(spark):
    # 'api' occurs inside the value but the anchored regex must match
    # the WHOLE value, like PromQL
    rows = [{"job": "api-1"}]
    out = _collect(
        label_replace(_dims_df(spark, rows), "dims", "svc", "x", "job", "api")
    )
    assert out[0] == {"job": "api-1"}


def test_label_replace_empty_expansion_removes_dst(spark):
    rows = [{"job": "api-1", "region": "3"}, {"job": "api-2", "region": "4"}]
    out = _collect(
        label_replace(_dims_df(spark, rows), "dims", "region", "", "region", "3")
    )
    assert out[0] == {"job": "api-1"}  # region removed
    assert out[1] == {"job": "api-2", "region": "4"}  # no match: kept


def test_label_replace_missing_src_reads_empty(spark):
    # PromQL: a missing src label matches as "" — regex '' matches it
    rows = [{"job": "api-1"}]
    out = _collect(
        label_replace(_dims_df(spark, rows), "dims", "flag", "none", "zone", "")
    )
    assert out[0] == {"job": "api-1", "flag": "none"}


def test_label_replace_overwrites_existing_dst(spark):
    rows = [{"job": "api-1", "svc": "old"}]
    out = _collect(
        label_replace(
            _dims_df(spark, rows), "dims", "svc", "$1", "job", "(.*)-1"
        )
    )
    assert out[0] == {"job": "api-1", "svc": "api"}


def test_label_join_keeps_empty_slots_and_removes_empty_result(spark):
    rows = [
        {"a": "x", "b": "y"},
        {"a": "x"},  # b missing -> empty slot, separator kept
        {},  # both missing with empty sep -> dst removed
    ]
    df = label_join(_dims_df(spark, rows), "dims", "ab", "-", ["a", "b"])
    out = _collect(df)
    assert out[0] == {"a": "x", "b": "y", "ab": "x-y"}
    assert out[1] == {"a": "x", "ab": "x-"}
    assert out[2] == {"ab": "-"}  # sep between two empties is non-empty

    df2 = label_join(_dims_df(spark, [{}]), "dims", "ab", "", ["a", "b"])
    assert _collect(df2) == [{}]  # truly empty join removes dst


def test_label_replace_then_id_is_canonical(spark):
    rows = [{"b": "2", "a": "1"}]
    df = label_replace(_dims_df(spark, rows), "dims", "c", "z", "a", "1")
    got = df.select(label_id_map("dims").alias("gid")).collect()[0]["gid"]
    assert got == "a:1,b:2,c:z"


def _tier(spark, rows):
    """rows: (conv, hour_offset, cnt)."""
    return spark.createDataFrame(
        [
            (c, H0 + dt.timedelta(hours=h), int(v))
            for c, h, v in rows
        ],
        "conv_id string, bucket_ts timestamp, turn_cnt long",
    )


def test_count_values(spark):
    rolled = _tier(
        spark,
        [("a", 0, 5), ("b", 0, 5), ("c", 0, 7), ("a", 1, 5)],
    )
    out = {
        (r["bucket_ts"], r["turn_cnt"]): r["n_series"]
        for r in count_values(rolled, "turn_cnt").collect()
    }
    assert out == {
        (H0, 5): 2,
        (H0, 7): 1,
        (H0 + dt.timedelta(hours=1), 5): 1,
    }


def test_moving_aggregate_spread_matches_numpy_population(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rolled = _tier(spark, [("a", h, v) for h, v in enumerate(vals)])
    out = (
        moving_aggregate(rolled, "turn_cnt", 4 * 3600, with_spread=True)
        .orderBy("bucket_ts")
        .collect()
    )
    for i, r in enumerate(out):
        win = vals[max(0, i - 3) : i + 1]
        assert r["win_n"] == len(win)
        assert r["win_sumsq"] == sum(v * v for v in win)
        assert np.isclose(r["win_var"], np.var(win))  # population (/n)
        assert np.isclose(r["win_std"], np.std(win))
