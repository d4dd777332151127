"""dq_profile / dq_unique / dq_sequence: hand-verifiable gates."""

import datetime as dt

from go_muse_spark.operators.dataquality import (
    dq_profile,
    dq_report,
    dq_sequence,
    dq_unique,
)


def _ts(s):
    return dt.datetime(2025, 1, 1, 0, 0, s)


def test_dq_profile_counts_and_ppm(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, -1.0), (4, 2.0)],
        "id int, v double",
    )
    out = dq_profile(
        df,
        {"v_null": "v IS NULL", "v_negative": "v < 0", "never": "id > 99"},
    )
    rows = {r["check"]: r for r in out.collect()}
    assert list(rows) == ["v_null", "v_negative", "never"]
    assert rows["v_null"]["n_viol"] == 1 and rows["v_null"]["n_rows"] == 4
    # NULL predicate result (v < 0 on NULL v) is a non-violation
    assert rows["v_negative"]["n_viol"] == 1
    assert rows["never"]["n_viol"] == 0 and rows["never"]["ppm"] == 0
    assert rows["v_null"]["ppm"] == 250_000  # exact integer div


def test_dq_unique_extra_row_count(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), (None, 3)],
        "k string, x int",
    )
    row = dq_unique(df, ("k",)).collect()[0]
    # 3 rows of 'a' -> 2 extra; b and NULL clean
    assert row["n_rows"] == 5 and row["n_viol"] == 2
    assert row["ppm"] == 400_000


def test_dq_sequence_backward_ts(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, _ts(10)),
            ("c1", 1, _ts(20)),
            ("c1", 2, _ts(15)),  # regression
            ("c1", 3, _ts(15)),  # equal ts: fine
            ("c2", 0, _ts(5)),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    row = dq_sequence(df, ("conv_id",), "turn_idx").collect()[0]
    assert row["n_rows"] == 5 and row["n_viol"] == 1
    assert row["ppm"] == 200_000


def test_dq_sequence_fused_extra_checks(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, _ts(10), None),
            ("c1", 1, _ts(5), 2.0),  # ts regression + non-null v
            ("c2", 0, _ts(1), -3.0),
        ],
        "conv_id string, turn_idx int, ts timestamp, v double",
    )
    rep = dq_sequence(
        df,
        ("conv_id",),
        "turn_idx",
        extra_checks={"v_null": "v IS NULL", "v_neg": "v < 0"},
    )
    rows = {r["check"]: r["n_viol"] for r in rep.collect()}
    assert rows == {"ts_order_regression": 1, "v_null": 1, "v_neg": 1}
    assert all(r["n_rows"] == 3 for r in rep.collect())


def test_dq_report_union(spark):
    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    rep = dq_report(
        [dq_profile(df, {"v_null": "v IS NULL"}), dq_unique(df, ("id",))]
    )
    got = {r["check"] for r in rep.collect()}
    assert got == {"v_null", "dup_key"}
    assert rep.columns == ["check", "n_rows", "n_viol", "ppm"]


def test_dq_empty_table_zero_ppm(spark):
    df = spark.createDataFrame([], "id int, v double")
    rows = dq_profile(df, {"v_null": "v IS NULL"}).collect()
    assert rows[0]["n_rows"] == 0 and rows[0]["ppm"] == 0
    row = dq_unique(df, ("id",)).collect()[0]
    assert row["n_rows"] == 0 and row["ppm"] == 0


def test_schema_diff_changes(spark):
    from go_muse_spark.operators.dataquality import schema_diff

    old = "conv_id string not null, turn_idx int, ts timestamp"
    new = "conv_id string, turn_idx bigint, ts timestamp, tool string"
    got = schema_diff(old, new)
    assert ("added", "tool", None, "string") in got
    assert ("type_changed", "turn_idx", "int", "bigint") in got
    assert ("now_nullable", "conv_id", "string", "string") in got
    assert all(c[0] != "dropped" for c in got)
    # identical schemas -> empty
    assert schema_diff(new, new) == []
    # dropped column
    assert ("dropped", "ts", "timestamp", None) in schema_diff(
        new, "conv_id string"
    )


def test_schema_diff_rejects_non_struct(spark):
    import pytest as _pytest

    from go_muse_spark.operators.dataquality import schema_diff

    with _pytest.raises(Exception):
        schema_diff("int", "int")
