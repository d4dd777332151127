"""Matrix profile: kernel vs brute force, Spark operator, segmented
decomposition equality, degenerate-window handling."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.gapfill import gap_fill
from go_muse_spark.operators.matrix_profile import (
    matrix_profile,
    matrix_profile_ab,
    matrix_profile_segments,
    profile_ab,
    profile_self,
)
from go_muse_spark.operators.rollup import rollup_transcripts
from go_muse_spark.sources.events import events_as_transcripts


def _brute(x, m, excl):
    w = len(x) - m + 1
    mp = np.full(w, np.nan)
    idx = np.full(w, -1)
    for i in range(w):
        best = -np.inf
        for j in range(w):
            if abs(i - j) < excl:
                continue
            a = x[i : i + m] - x[i : i + m].mean()
            b = x[j : j + m] - x[j : j + m].mean()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na == 0 or nb == 0:
                continue
            c = float(a @ b / (na * nb))
            if c > best:
                best, idx[i] = c, j
        if np.isfinite(best):
            mp[i] = best
    return mp, idx


def test_profile_self_matches_brute_force():
    rng = np.random.default_rng(11)
    x = rng.normal(size=160).cumsum() + 0.5 * rng.normal(size=160)
    mp, idx = profile_self(x, 10, 3, block=31)
    bf, bfi = _brute(x, 10, 3)
    assert np.allclose(mp, bf, atol=1e-10, equal_nan=True)
    assert (idx == bfi).all()


def test_profile_self_integer_counts_match_brute_force():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 7, size=120).astype(float)
    mp, idx = profile_self(x, 7, 1, block=17)
    bf, bfi = _brute(x, 7, 1)
    assert np.allclose(mp, bf, atol=1e-10, equal_nan=True)
    # exact ties possible on repeated integer windows: first max wins
    # in both (np.argmax and the brute loop's strict > update)
    assert (idx == bfi).all()


def test_profile_self_sigma_zero_windows_are_nan():
    x = np.concatenate([np.arange(30.0), np.full(20, 3.0), np.arange(30.0)])
    mp, idx = profile_self(x, 8, 2)
    w = len(x) - 8 + 1
    for i in range(w):
        if np.std(x[i : i + 8]) == 0:
            assert np.isnan(mp[i]) and idx[i] == -1
        else:
            assert np.isfinite(mp[i])


def test_profile_self_too_short_is_empty():
    mp, idx = profile_self(np.arange(4.0), 6, 1)
    assert mp.size == 0 and idx.size == 0


def test_profile_ab_composes_to_self():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 12, size=190).astype(float)
    m, excl, seg = 9, 2, 48
    bf, bfi = _brute(x, m, excl)
    n = len(x)
    w = n - m + 1
    best = np.full(w, -np.inf)
    besti = np.full(w, -1)
    nseg = -(-n // seg)
    for sa in range(nseg):
        for sb in range(nseg):
            oa = sa * seg
            ob = sb * seg
            xa = x[oa : min(n, (sa + 1) * seg + m - 1)]
            xb = x[ob : min(n, (sb + 1) * seg + m - 1)]
            c, gi = profile_ab(
                xa, xb, m, off_a=oa, off_b=ob, exclusion=excl, block=13
            )
            for k in range(c.size):
                g = oa + k
                if g // seg != sa or not np.isfinite(c[k]):
                    continue
                if c[k] > best[g] or (c[k] == best[g] and gi[k] < besti[g]):
                    best[g], besti[g] = c[k], gi[k]
    got = np.where(np.isfinite(best), best, np.nan)
    assert np.allclose(got, bf, atol=1e-12, equal_nan=True)
    assert (besti == bfi).all()


@pytest.fixture(scope="module")
def daily_dense(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rolled = rollup_transcripts(events_as_transcripts(ev), "1d")
    return gap_fill(
        rolled, "1d", mode="zero", value_cols=("turn_cnt",)
    ).cache()


def test_matrix_profile_spark_matches_kernel(daily_dense):
    out = (
        matrix_profile(daily_dense, "turn_cnt", 7)
        .toPandas()
        .sort_values(["conv_id", "pos"])
    )
    pdf = daily_dense.toPandas().sort_values(["conv_id", "bucket_ts"])
    for conv, grp in pdf.groupby("conv_id"):
        x = grp["turn_cnt"].to_numpy(dtype=float)
        mp, idx = profile_self(x, 7, 1)
        keep = np.isfinite(mp)
        got = out[out.conv_id == conv]
        assert got.pos.tolist() == list(np.arange(mp.size)[keep])
        assert np.allclose(got.mp_corr.to_numpy(), mp[keep])
        assert got.mp_idx.tolist() == list(idx[keep])
        assert np.allclose(
            got.mp_dist.to_numpy(),
            np.sqrt(np.maximum(2.0 * 7 * (1.0 - mp[keep]), 0.0)),
        )


def test_matrix_profile_segments_equals_whole(daily_dense):
    whole = (
        matrix_profile(daily_dense, "turn_cnt", 7)
        .toPandas()
        .sort_values(["conv_id", "pos"])
        .reset_index(drop=True)
    )
    seg = (
        matrix_profile_segments(daily_dense, "turn_cnt", 7, seg_len=9)
        .toPandas()
        .sort_values(["conv_id", "pos"])
        .reset_index(drop=True)
    )
    assert len(whole) == len(seg)
    m = whole.merge(
        seg, on=["conv_id", "pos"], suffixes=("_w", "_s"), how="inner"
    )
    assert len(m) == len(whole)
    assert (m.mp_corr_w == m.mp_corr_s).all()  # bit-identical kernels
    assert (m.mp_idx_w == m.mp_idx_s).all()
    assert (m.bucket_ts_w == m.bucket_ts_s).all()


def test_matrix_profile_requires_dense_grid_positions(spark):
    # profile positions follow ts order; duplicate keys across groups
    # stay independent
    from datetime import datetime, timedelta

    rows = []
    for conv in ("a", "b"):
        for i in range(40):
            rows.append((conv, datetime(2024, 1, 1) + timedelta(hours=i), float((i * (3 if conv == "a" else 5)) % 7)))
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp, v double")
    out = matrix_profile(df, "v", 6, keys=("conv_id",)).toPandas()
    for conv in ("a", "b"):
        x = np.array([(i * (3 if conv == "a" else 5)) % 7 for i in range(40)], dtype=float)
        mp, _ = profile_self(x, 6, 1)
        keep = np.isfinite(mp)
        got = out[out.conv_id == conv].sort_values("pos")
        assert np.allclose(got.mp_corr.to_numpy(), mp[keep])


def test_matrix_profile_ab_finds_planted_pattern(spark):
    """A query shape planted (affine-transformed) inside one series
    scores corr 1.0 at the planted position with the right query
    window index (z-normalization erases the affine transform); the
    profile is a MAX over query windows, so an anti-correlated plant
    reports its best POSITIVE partner, not -1; and the Spark path
    equals the kernel for every series."""
    import datetime as dt

    q = np.array([0.0, 1.0, 4.0, 9.0, 4.0, 1.0, 0.0, 2.0])  # 2 windows m=7
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # series A: background 5s, plant 3*q[:7]+10 at pos 4
    a = [5.0] * 16
    for k in range(7):
        a[4 + k] = 3.0 * q[k] + 10.0
    # series B: anti-correlated plant at pos 2
    b = [7.0] * 16
    for k in range(7):
        b[2 + k] = -2.0 * q[k] + 1.0
    for name, vals in (("a", a), ("b", b)):
        for i, v in enumerate(vals):
            rows.append((name, t0 + dt.timedelta(days=i), float(v)))
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, turn_cnt double"
    )
    out = (
        matrix_profile_ab(df, q, "turn_cnt", 7)
        .toPandas()
        .sort_values(["conv_id", "pos"])
    )
    ga = out[out.conv_id == "a"].set_index("pos")
    gb = out[out.conv_id == "b"].set_index("pos")
    assert abs(ga.loc[4, "mp_corr"] - 1.0) < 1e-12
    assert ga.loc[4, "mp_idx"] == 0  # matched query window 0 = q[:7]
    # planted pos dominates every other window of its series
    assert ga.loc[4, "mp_corr"] == ga["mp_corr"].max()
    # the anti-plant's exact -1 vs query window 0 is NOT reported:
    # the profile maxes over query windows and window 1 beats it
    q0 = q[:7] - q[:7].mean()
    b_win = np.asarray(b[2:9]) - np.mean(b[2:9])
    assert abs(
        float(b_win @ q0)
        / (np.linalg.norm(b_win) * np.linalg.norm(q0))
        + 1.0
    ) < 1e-12  # sanity: the plant IS exactly anti-correlated with q0
    assert gb.loc[2, "mp_corr"] > -1.0 and gb.loc[2, "mp_idx"] == 1
    # Spark path == kernel on every series (incl. flat nan windows)
    pdf = df.toPandas().sort_values(["conv_id", "bucket_ts"])
    for conv, grp in pdf.groupby("conv_id"):
        x = grp["turn_cnt"].to_numpy(dtype=float)
        corr, gidx = profile_ab(x, q, 7, exclusion=0)
        keep = np.isfinite(corr)
        got = out[out.conv_id == conv]
        assert got.pos.tolist() == list(np.arange(corr.size)[keep])
        assert np.allclose(got.mp_corr.to_numpy(), corr[keep])
        assert got.mp_idx.tolist() == list(gidx[keep])


def test_matrix_profile_ab_validates_short_query(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "conv_id string, bucket_ts timestamp, turn_cnt double",
    )
    with pytest.raises(ValueError):
        matrix_profile_ab(df, np.ones(3), "turn_cnt", 7)
