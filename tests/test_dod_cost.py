"""dod_cost model == len(encode_timestamps(ts)) byte for byte."""

import datetime as dt

import numpy as np
import pytest

from go_muse_spark.functions.codecs import encode_timestamps
from go_muse_spark.operators.compress import dod_cost


def _df(spark, series):
    rows = []
    for conv, ts_list in series.items():
        for t in ts_list:
            rows.append((conv, dt.datetime(2025, 1, 1) + dt.timedelta(seconds=t)))
    return spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp")


def _actual_bytes(ts_list):
    us = (np.asarray(sorted(ts_list), dtype=np.int64)) * 1_000_000 + int(
        dt.datetime(2025, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    return len(encode_timestamps(us))


@pytest.mark.parametrize(
    "series",
    [
        # regular cadence: dods all zero after the first delta
        {"reg": list(range(0, 3600 * 50, 3600))},
        # irregular gaps
        {"irr": [0, 10, 25, 26, 100, 5000, 5003, 9000]},
        # shrinking deltas (negative dods exercise zigzag)
        {"neg": [0, 100, 190, 270, 340, 400, 450, 490]},
        # single point and pair
        {"one": [0], "two": [0, 3600]},
        # mixed several series at once
        {
            "a": list(range(0, 3600 * 30, 3600)),
            "b": [0, 7, 9, 400, 401, 402],
        },
    ],
)
def test_model_matches_encoder(spark, series):
    out = {
        r["conv_id"]: r for r in dod_cost(_df(spark, series)).collect()
    }
    assert set(out) == set(series)
    for conv, ts_list in series.items():
        want = _actual_bytes(ts_list)
        got = out[conv]["ts_bytes"]
        assert got == want, (conv, got, want)
        assert out[conv]["n_points"] == len(ts_list)


def test_dense_regular_tier_near_one_bit(spark):
    # 200 perfectly regular hourly points: bitmap dominates -> ~1.4
    # bits/point incl. header at this length, asymptotically -> 1
    out = dod_cost(
        _df(spark, {"r": list(range(0, 3600 * 200, 3600))})
    ).collect()[0]
    assert out["k_nonzero"] <= 1  # only the first delta's dod
    assert out["bits_per_point_u"] < 2_000_000


def test_ieee_bits_sql_matches_numpy(spark):
    import numpy as np

    from go_muse_spark.operators.compress import ieee_bits_sql

    vals = [0, 1, 2, 3, 7, 8, 100, 1023, 4096, 123456789, (1 << 51) + 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["bits"]
        for r in df.selectExpr(
            "v", f"{ieee_bits_sql('v')} as bits"
        ).collect()
    }
    for v in vals:
        want = int(np.float64(v).view(np.uint64))
        assert got[v] == want, (v, got[v], want)


def _xor_actual_bytes(vals):
    import numpy as np

    from go_muse_spark.functions.codecs import encode_floats

    return len(encode_floats(np.asarray(vals, dtype=np.float64)))


@pytest.mark.parametrize(
    "series",
    [
        {"flat": [5] * 40},                      # all-zero XORs
        {"ramp": list(range(1, 60))},
        {"noisy": [3, 9, 1, 1, 27, 4, 4, 4, 800, 2]},
        {"one": [42], "two": [7, 7], "two2": [7, 9]},
    ],
)
def test_xor_model_matches_encoder(spark, series):
    from go_muse_spark.operators.compress import xor_cost

    rows = []
    for conv, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (conv, dt.datetime(2025, 1, 1) + dt.timedelta(hours=i), v)
            )
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, v long"
    )
    out = {r["conv_id"]: r for r in xor_cost(df, "v").collect()}
    for conv, vals in series.items():
        want = _xor_actual_bytes(vals)
        assert out[conv]["val_bytes"] == want, (
            conv,
            out[conv]["val_bytes"],
            want,
        )
