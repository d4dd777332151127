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


# ----------------------------------------------------- vector_binop


def _vec(spark, rows):
    """rows: (labels dict, bucket, value)."""
    import pandas as pd

    data = [(d, int(b), int(v)) for d, b, v in rows]
    return spark.createDataFrame(
        pd.DataFrame(data, columns=["dims", "bucket_epoch", "value"]),
        schema="dims map<string,string>, bucket_epoch long, value long",
    )


def test_vector_binop_one_to_one_ratio(spark):
    from go_muse_spark.labels import vector_binop

    errors = _vec(spark, [
        ({"user": "a", "dc": "eu"}, 0, 2),
        ({"user": "b", "dc": "us"}, 0, 5),
    ])
    totals = _vec(spark, [
        ({"user": "a", "job": "web"}, 0, 8),
        ({"user": "b", "job": "web"}, 0, 10),
        ({"user": "c", "job": "web"}, 0, 7),  # no left partner: drops
    ])
    out = vector_binop(
        errors, totals, "/", on=["user"],
        extra_on_cols=("bucket_epoch",),
    ).collect()
    got = {r["dims"]["user"]: (dict(r["dims"]), r["value"]) for r in out}
    # result labels = on-labels only; inner-join semantics
    assert got == {"a": ({"user": "a"}, 0.25), "b": ({"user": "b"}, 0.5)}


def test_vector_binop_strict_duplicate_raises(spark):
    import pytest as _pytest

    from go_muse_spark.labels import vector_binop

    dup = _vec(spark, [
        ({"user": "a", "dc": "eu"}, 0, 1),
        ({"user": "a", "dc": "us"}, 0, 2),  # same on-signature
    ])
    one = _vec(spark, [({"user": "a"}, 0, 3)])
    with _pytest.raises(ValueError, match="duplicate series signature"):
        vector_binop(dup, one, "+", on=["user"],
                     extra_on_cols=("bucket_epoch",))
    # many-to-one is legal with group='left' (left may repeat)
    out = vector_binop(
        dup, one, "+", on=["user"], extra_on_cols=("bucket_epoch",),
        group="left",
    ).collect()
    assert sorted(r["value"] for r in out) == [4, 5]
    # full left label set kept
    assert all("dc" in r["dims"] for r in out)


def test_vector_binop_group_left_carry(spark):
    from go_muse_spark.labels import vector_binop

    reqs = _vec(spark, [
        ({"user": "a", "path": "/x"}, 0, 6),
        ({"user": "a", "path": "/y"}, 0, 4),
    ])
    quota = _vec(spark, [({"user": "a", "tier": "gold"}, 0, 2)])
    out = vector_binop(
        reqs, quota, "*", on=["user"], extra_on_cols=("bucket_epoch",),
        group="left", carry=("tier",),
    ).collect()
    got = {r["dims"]["path"]: (r["dims"].get("tier"), r["value"]) for r in out}
    assert got == {"/x": ("gold", 12), "/y": ("gold", 8)}


def test_vector_binop_bucket_scoped_matching(spark):
    from go_muse_spark.labels import vector_binop

    l = _vec(spark, [({"user": "a"}, 0, 1), ({"user": "a"}, 3600, 9)])
    r = _vec(spark, [({"user": "a"}, 0, 2), ({"user": "a"}, 3600, 3)])
    out = vector_binop(
        l, r, "-", on=["user"], extra_on_cols=("bucket_epoch",),
        strict=False,
    ).collect()
    got = {r2["bucket_epoch"]: r2["value"] for r2 in out}
    assert got == {0: -1, 3600: 6}
