"""Matrix profile: kernel vs brute force, Spark operator, segmented
decomposition equality, degenerate-window handling."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_muse_spark.operators.gapfill import gap_fill
from go_muse_spark.operators.matrix_profile import (
    matrix_profile,
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
