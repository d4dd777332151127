"""Hampel filter: hand-computed window medians/MADs, edge handling."""

import datetime as dt

from go_muse_spark.operators.stats import hampel


def _rows(vals, conv="c1"):
    t0 = dt.datetime(2025, 1, 1)
    return [
        (conv, t0 + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(vals)
    ]


def _df(spark, vals, conv="c1"):
    return spark.createDataFrame(
        _rows(vals, conv), "conv_id string, bucket_ts timestamp, v double"
    )


def test_hampel_spike_flagged(spark):
    # flat series with one spike; window 5, quant 1 -> pure ints
    vals = [10, 10, 10, 10, 100, 10, 10, 10, 10]
    out = (
        hampel(_df(spark, vals), "v", 5, quant=1)
        .orderBy("bucket_ts")
        .collect()
    )
    # first/last 2 rows: incomplete window -> NULL verdict
    assert [r["is_outlier"] for r in out[:2]] == [None, None]
    assert [r["is_outlier"] for r in out[-2:]] == [None, None]
    mid = out[2:-2]
    # spike at idx 4: window [10,10,100,10,10] -> med 10, MAD 0,
    # dev 90 > 0 -> outlier
    spike = mid[2]
    assert spike["val_q"] == 100 and spike["med_q"] == 10
    assert spike["mad_q"] == 0 and spike["is_outlier"] == 1
    # neighbors contain the spike in their window but med/MAD robust:
    # window [10,10,10,10,100] -> med 10, mad 0, dev 0 -> not outlier
    assert all(r["is_outlier"] == 0 for r in mid if r["val_q"] == 10)


def test_hampel_low_median_and_mad(spark):
    # window 5 of distinct values: [1,3,5,7,9] -> med 5 (low med of
    # odd n is the true median), devs sorted [0,2,2,4,4] -> MAD 2
    vals = [1, 3, 5, 7, 9]
    out = hampel(_df(spark, vals), "v", 5, quant=1).orderBy(
        "bucket_ts"
    ).collect()
    c = out[2]
    assert c["med_q"] == 5 and c["mad_q"] == 2
    # dev = 0, threshold 4.4478*2 -> not outlier
    assert c["is_outlier"] == 0


def test_hampel_threshold_rational(spark):
    # med 0, MAD 1 -> outlier iff |x| * 10000 > 44478, i.e. |x| >= 5
    # (quant=1 ints): x=4 -> 40000 <= 44478 keep; x=5 -> 50000 flag
    vals = [0, -1, 0, 1, 4, 0, -1, 0, 1, 5, 0, -1, 0, 1]
    out = hampel(_df(spark, vals), "v", 5, quant=1).orderBy(
        "bucket_ts"
    ).collect()
    got = {r["val_q"]: r["is_outlier"] for r in out[2:-2]}
    assert got[4] == 0 and got[5] == 1


def test_hampel_short_series_all_null(spark):
    out = hampel(_df(spark, [1, 2, 3]), "v", 5, quant=1).collect()
    assert all(r["is_outlier"] is None for r in out)


def test_hampel_rejects_even_window(spark):
    import pytest

    with pytest.raises(ValueError):
        hampel(_df(spark, [1, 2, 3]), "v", 4)
