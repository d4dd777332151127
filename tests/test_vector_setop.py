"""PromQL and/unless/or set matching: left-side values, right gates."""

import pytest

from pyspark.sql import functions as F

from go_muse_spark.labels import vector_setop


def _vec(spark, rows):
    # rows: (user, bucket, value)
    df = spark.createDataFrame(rows, "u string, b long, value double")
    return df.select(
        F.create_map(F.lit("user"), F.col("u")).alias("dims"),
        F.col("b").alias("bucket_epoch"),
        "value",
    )


def _flat(df):
    return {
        (r["dims"]["user"], r["bucket_epoch"]): r["value"]
        for r in df.collect()
    }


def test_and_unless_or(spark):
    left = _vec(spark, [("a", 1, 10.0), ("b", 1, 20.0), ("c", 2, 30.0)])
    right = _vec(spark, [("a", 1, 999.0), ("c", 1, 999.0), ("d", 2, 40.0)])
    on = ["user"]
    ex = ("bucket_epoch",)

    got_and = _flat(vector_setop(left, right, "and", on, extra_on_cols=ex))
    # only ("a",1) matches on signature+bucket; value from LEFT
    assert got_and == {("a", 1): 10.0}

    got_unless = _flat(
        vector_setop(left, right, "unless", on, extra_on_cols=ex)
    )
    assert got_unless == {("b", 1): 20.0, ("c", 2): 30.0}

    got_or = _flat(vector_setop(left, right, "or", on, extra_on_cols=ex))
    # all left rows + right orphans (("c",1) and ("d",2))
    assert got_or == {
        ("a", 1): 10.0,
        ("b", 1): 20.0,
        ("c", 2): 30.0,
        ("c", 1): 999.0,
        ("d", 2): 40.0,
    }


def test_right_values_never_leak_into_and(spark):
    left = _vec(spark, [("a", 1, 1.0)])
    right = _vec(spark, [("a", 1, 777.0)])
    out = vector_setop(left, right, "and", ["user"], extra_on_cols=("bucket_epoch",))
    assert [r["value"] for r in out.collect()] == [1.0]


def test_bad_op(spark):
    left = _vec(spark, [("a", 1, 1.0)])
    with pytest.raises(ValueError):
        vector_setop(left, left, "xor", ["user"])
