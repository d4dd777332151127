"""skew_advisor: counts, shares, salt factors, top-k order."""

import pytest

from go_muse_spark.operators.layout import skew_advisor


def test_salt_plan(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 25 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_advisor(df, ("k",), target_rows_per_task=10, top_k=10)
    got = {r["k"]: r for r in out.collect()}
    assert got["hot"]["n_rows"] == 70
    assert got["hot"]["share_ppm"] == 700_000
    assert got["hot"]["salt_factor"] == 7
    assert got["warm"]["salt_factor"] == 3  # ceil(25/10)
    assert got["cold"]["salt_factor"] == 1
    # heaviest first
    order = [r["k"] for r in out.collect()]
    assert order == ["hot", "warm", "cold"]


def test_top_k_and_ties(spark):
    rows = [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 3
    df = spark.createDataFrame(rows, "k string")
    out = skew_advisor(df, ("k",), 100, top_k=2).collect()
    assert [r["k"] for r in out] == ["a", "b"]  # tie -> key asc


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_advisor(df, (), 10)
    with pytest.raises(ValueError):
        skew_advisor(df, ("k",), 0)
