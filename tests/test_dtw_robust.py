"""DTW + robust-stats operators vs independent pandas/numpy references."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.dtw import dtw_distance, dtw_pairs
from go_muse_spark.operators.olap import trimmed_mean
from go_muse_spark.operators.stats import rank_corr_bucket, rolling_corr

INF = 1 << 62


def _brute_dtw(a, b, band=None):
    n, m = len(a), len(b)
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if band is not None and abs((i - 1) - (j - 1)) > band:
                continue
            c = abs(int(a[i - 1]) - int(b[j - 1]))
            prev = min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
            if prev < INF:
                D[i][j] = c + prev
    return D[n][m]


def test_dtw_distance_matches_bruteforce():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(1, 30))
        m = int(rng.integers(1, 30))
        a = rng.integers(-500, 500, n)
        b = rng.integers(-500, 500, m)
        assert dtw_distance(a, b) == _brute_dtw(a, b)


def test_dtw_distance_banded_matches_bruteforce_when_reachable():
    rng = np.random.default_rng(12)
    for _ in range(40):
        n = int(rng.integers(2, 25))
        a = rng.integers(0, 200, n)
        b = rng.integers(0, 200, n)  # equal length: band always reachable
        band = int(rng.integers(1, n))
        assert dtw_distance(a, b, band=band) == _brute_dtw(a, b, band=band)


def test_dtw_axioms():
    rng = np.random.default_rng(13)
    a = rng.integers(0, 100, 20)
    b = rng.integers(0, 100, 20)
    assert dtw_distance(a, a) == 0  # identity
    assert dtw_distance(a, b) == dtw_distance(b, a)  # symmetry
    # banded <= implies >= unbanded distance (band only removes paths)
    assert dtw_distance(a, b, band=3) >= dtw_distance(a, b)
    # shift-by-one of the same series is cheap vs a random pair
    shifted = np.roll(a, 1)
    assert dtw_distance(a, shifted) <= dtw_distance(a, b)


def test_dtw_pairs_spark_matches_kernel(spark):
    rng = np.random.default_rng(21)
    rows = []
    series = {}
    for k in range(5):
        key = f"u{k}"
        vals = rng.integers(0, 50, 12)
        series[key] = vals
        for i, v in enumerate(vals):
            rows.append((key, i, int(v)))
    df = spark.createDataFrame(rows, "k string, i int, v long")
    out = dtw_pairs(df, key_col="k", idx_col="i", value_col="v",
                    top_series=None).toPandas()
    assert len(out) == 10  # 5 choose 2
    for r in out.itertuples():
        want = dtw_distance(series[r.key_a], series[r.key_b])
        assert r.dtw == want
        assert r.n_a == 12 and r.n_b == 12
        assert r.dtw_norm == pytest.approx(want / 24.0)


def test_dtw_pairs_top_series_bounds_pairs(spark):
    rows = [(f"u{k}", i, (k + 1) * 10 + i) for k in range(6)
            for i in range(8)]
    df = spark.createDataFrame(rows, "k string, i int, v long")
    out = dtw_pairs(df, key_col="k", idx_col="i", value_col="v",
                    top_series=3).toPandas()
    assert len(out) == 3  # 3 choose 2
    keys = set(out.key_a) | set(out.key_b)
    assert keys == {"u3", "u4", "u5"}  # highest sum(|v|)


def test_rolling_corr_matches_pandas(spark):
    rng = np.random.default_rng(31)
    rows = []
    for k in ("a", "b"):
        t0 = pd.Timestamp("2024-01-01")
        for i in range(48):
            if rng.random() < 0.15:
                continue  # gaps stay absent
            rows.append((k, (t0 + pd.Timedelta(hours=i)).to_pydatetime(),
                         int(rng.integers(0, 20)),
                         int(rng.integers(0, 10))))
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp,"
                                     " x long, y long")
    got = rolling_corr(df, "x", "y", 6 * 3600, min_points=3).toPandas()
    pdf = pd.DataFrame(rows, columns=["k", "ts", "x", "y"])
    for r in got.itertuples():
        win = pdf[(pdf.k == r.conv_id)
                  & (pdf.ts > r.bucket_ts - pd.Timedelta(seconds=6 * 3600))
                  & (pdf.ts <= r.bucket_ts)]
        assert r.win_n == len(win)
        if r.corr == r.corr and r.corr is not None:  # non-NaN/None
            want = np.corrcoef(win.x, win.y)[0, 1]
            assert r.corr == pytest.approx(want, abs=1e-9)
        else:
            assert (len(win) < 3 or win.x.nunique() == 1
                    or win.y.nunique() == 1)


def test_rank_corr_bucket_matches_scipy_free_spearman(spark):
    rng = np.random.default_rng(41)
    rows = []
    for b in range(4):
        for k in range(20):
            rows.append((b, f"u{k:02d}", int(rng.integers(0, 15)),
                         int(rng.integers(0, 15))))
    df = spark.createDataFrame(rows, "bucket long, conv_id string,"
                                     " x long, y long")
    got = rank_corr_bucket(df, "x", "y", key_col="conv_id",
                           bucket_col="bucket").toPandas()
    pdf = pd.DataFrame(rows, columns=["b", "k", "x", "y"])
    for r in got.itertuples():
        g = pdf[pdf.b == r.bucket].sort_values(["x", "k"]).reset_index()
        rx = {k: i + 1 for i, k in enumerate(g.k)}
        g2 = pdf[pdf.b == r.bucket].sort_values(["y", "k"]).reset_index()
        ry = {k: i + 1 for i, k in enumerate(g2.k)}
        xs = np.array([rx[k] for k in sorted(rx)])
        ys = np.array([ry[k] for k in sorted(rx)])
        want = np.corrcoef(xs, ys)[0, 1]
        assert r.n_series == 20
        assert r.corr == pytest.approx(want, abs=1e-9)


def test_trimmed_mean_matches_pandas(spark):
    rng = np.random.default_rng(51)
    rows = [(("g1" if i % 3 else "g2"), int(rng.integers(-100, 1000)), i)
            for i in range(90)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = trimmed_mean(df, "v", dims=("g",), trim_frac=0.1,
                       order_cols=("id",)).toPandas()
    pdf = pd.DataFrame(rows, columns=["g", "v", "id"])
    for r in got.itertuples():
        grp = pdf[pdf.g == r.g].sort_values(["v", "id"])
        k = int(np.floor(len(grp) * 0.1))
        kept = grp.iloc[k: len(grp) - k]
        assert r.n == len(grp)
        assert r.n_trim == k
        assert r.n_kept == len(kept)
        assert r.kept_sum == kept.v.sum()
        assert r.trimmed_mean == pytest.approx(kept.v.mean())


def test_trimmed_mean_zero_trim_is_plain_mean(spark):
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate([5, 1, 9])],
        "g string, v long, id long",
    )
    got = trimmed_mean(df, "v", dims=("g",), trim_frac=0.1,
                       order_cols=("id",)).toPandas()
    assert got.iloc[0].n_kept == 3  # floor(3*0.1)=0 trimmed
    assert got.iloc[0].trimmed_mean == pytest.approx(5.0)


def test_best_changepoint_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    series = {}
    rows = []
    for u in range(6):
        n = int(rng.integers(8, 28))
        shift_at = int(rng.integers(3, n - 3))
        vals = [int((10 if i >= shift_at else 3) + rng.integers(0, 3))
                for i in range(n)]
        series[f"u{u}"] = vals
        for i, v in enumerate(vals):
            rows.append((f"u{u}", i * 86400, v))
    from go_muse_spark.operators.stats import best_changepoint

    df = spark.createDataFrame(rows, "conv_id string, bucket_epoch long,"
                                     " v long")
    got = (best_changepoint(df, "v", bucket_col="bucket_epoch")
           .toPandas().set_index("conv_id"))

    for u, vals in series.items():
        x = np.array(vals, dtype=np.int64)
        n, sn = len(x), int(x.sum())
        best = None
        for k in range(3, n - 2):
            sk = int(x[:k].sum())
            h = float(sk * sk * (n - k) + (sn - sk) * (sn - sk) * k) \
                / float(k * (n - k))
            if best is None or h > best[1]:
                best = (k, h)
        g = got.loc[u]
        assert int(g.split_k) == best[0]
        assert g.gain == pytest.approx(best[1] - sn * sn / n, abs=1e-9)
        assert int(g.split_bucket) == best[0] * 86400  # first right bucket


def test_theil_sen_matches_bruteforce(spark):
    import datetime

    rng = np.random.default_rng(6)
    series = {}
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(5):
        n = int(rng.integers(6, 20))  # mix of odd/even pair counts
        vals = [int(2 * i + rng.integers(0, 5)) for i in range(n)]
        if n > 8:
            vals[3] = 500  # outlier the median slope must shrug off
        series[f"u{u}"] = vals
        for i, v in enumerate(vals):
            rows.append((f"u{u}", t0 + datetime.timedelta(days=i), v))
    from go_muse_spark.operators.stats import theil_sen

    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp,"
                                     " v long")
    got = theil_sen(df, "v").toPandas().set_index("conv_id")

    epoch0 = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    for u, vals in series.items():
        t = [epoch0 + i * 86400 for i in range(len(vals))]
        slopes = sorted(((vals[j] - vals[i]) / (t[j] - t[i]), t[i], t[j])
                        for i in range(len(vals))
                        for j in range(i + 1, len(vals)))
        p = len(slopes)
        s = slopes[(p + 1) // 2 - 1][0]
        resid = sorted((vals[i] - s * t[i], t[i])
                       for i in range(len(vals)))
        e = resid[(len(vals) + 1) // 2 - 1][0]
        g = got.loc[u]
        assert g.n_pairs == p
        assert g.slope == s  # bit-exact: same IEEE division
        assert g.intercept == pytest.approx(e, abs=1e-12)
        if len(vals) > 8:
            # outlier resistance: slope stays near the true 2/day
            assert abs(g.slope * 86400 - 2.0) < 1.5


def test_dtw_unreachable_band_pairs_dropped(spark):
    # ragged series: lengths 5 and 12 with band=3 -> |n-m|=7 > band,
    # the pair is unreachable and must be DROPPED (not a sentinel row)
    assert dtw_distance(np.arange(5), np.arange(12), band=3) is None
    rows = [("short", i, i) for i in range(5)]
    rows += [("long", i, i) for i in range(12)]
    rows += [("mid", i, i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, i int, v long")
    out = dtw_pairs(df, key_col="k", idx_col="i", value_col="v",
                    top_series=None, band=3).toPandas()
    got_pairs = set(map(tuple, out[["key_a", "key_b"]].to_numpy()))
    assert ("long", "short") not in got_pairs  # |12-5| > 3: dropped
    assert ("long", "mid") in got_pairs        # |12-10| <= 3: kept
    assert ("mid", "short") not in got_pairs   # |10-5| > 3: dropped


def test_dtw_batch_matches_single():
    rng = np.random.default_rng(71)
    from go_muse_spark.operators.dtw import dtw_distance_batch

    for band in (None, 8, 3):
        for (n, m) in ((64, 64), (40, 37), (1, 1), (5, 8)):
            if band is not None and abs(n - m) > band:
                with pytest.raises(ValueError):
                    dtw_distance_batch(
                        rng.integers(0, 99, (4, n)).astype(np.int64),
                        rng.integers(0, 99, (4, m)).astype(np.int64),
                        band=band,
                    )
                continue
            A = rng.integers(0, 997, (20, n)).astype(np.int64)
            B = rng.integers(0, 997, (20, m)).astype(np.int64)
            got = dtw_distance_batch(A, B, band=band)
            want = np.array(
                [dtw_distance(A[i], B[i], band=band) for i in range(20)]
            )
            assert (got == want).all()


def test_dtw_pairs_broadcast_matches_join_plan(spark):
    rng = np.random.default_rng(81)
    rows = [(f"u{k}", i, int(rng.integers(0, 60)))
            for k in range(8) for i in range(15)]
    df = spark.createDataFrame(rows, "k string, i int, v long")
    a = (dtw_pairs(df, "k", "i", "v", top_series=None)
         .toPandas().sort_values(["key_a", "key_b"]).reset_index(drop=True))
    b = (dtw_pairs(df, "k", "i", "v", top_series=None,
                   broadcast_series=True, pair_partitions=8)
         .toPandas().sort_values(["key_a", "key_b"]).reset_index(drop=True))
    assert len(a) == 28
    assert a.equals(b)
