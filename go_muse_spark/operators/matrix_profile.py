"""Matrix profile — self-join twin of the muse cross-correlation search.

The reference scores ONE query series against groups of candidates
(muse.go:23-92: z-normalized cross-correlation via FFT, best score per
group). The matrix profile asks the reflexive question the reference
cannot: for EVERY length-m window of a series, how strongly does it
correlate with its own best match elsewhere in the same series? High
profile correlation = repeated structure (motifs); low = the window
that resembles nothing else (discord, the classic anomaly primitive).
Math is the same z-normalized Pearson the muse kernels implement
(xcorr.go:84-130), applied window-against-window instead of
series-against-series.

Distributed plan (the shape that survives 100 TB):

  rollup/gap-fill (dense grid)  ->  ONE exchange on the series key  ->
  applyInPandas: blockwise O(w^2) profile per series  ->  flat rows

Per-series work is embarrassingly parallel across millions of series —
identical to the muse search plan (operators/search.py), so skew
handling and sizing carry over. Inside a task the w x w correlation
matrix is NEVER materialized: windows are scored in row blocks of
`block` (default 2048), so peak memory is O(block * w) regardless of
series length, while the arithmetic stays one BLAS GEMM per block
(exact float64 dot products — no STOMP recurrence drift, which matters
because contract oracles compare against DuckDB's corr() at 1e-6).

For a single series too long for one task, `matrix_profile_segments`
splits the window axis into segments (each carrying an m-1 overlap
tail), self-joins segment pairs, scores each pair with the same
blockwise kernel, and max-reduces per window — a relational AB-join
decomposition whose partial results combine associatively, so Spark
distributes the quadratic segment grid instead of one task owning the
whole series.

Degenerate windows (sigma = 0, e.g. an all-zero gap-filled stretch)
are excluded from both sides of every pair — mirroring the reference's
refusal to score sigma=0 series (xcorr.go:164-171) and DuckDB corr()'s
NULL — and emit no profile row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "profile_self",
    "profile_ab",
    "matrix_profile",
    "matrix_profile_segments",
]


def _window_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-window raw sums (sx_i, den_i) with den_i = sqrt(m*ssq - sx^2).

    Exact per-window sums (einsum over the strided view), not cumsum
    differences: cumsum cancellation loses ~sqrt(n) digits on long
    series, and on integer-valued series (counts) the sums are EXACT in
    float64, which makes the pooled Pearson expression below
    bit-identical to a SQL engine evaluating the same closed form from
    integer sums — the property the contract oracles rely on at 1e-6
    rounding.
    """
    win = np.lib.stride_tricks.sliding_window_view(x, m)
    sx = win.sum(axis=1)
    ssq = np.einsum("ij,ij->i", win, win)
    var = m * ssq - sx * sx
    np.maximum(var, 0.0, out=var)
    return sx, np.sqrt(var)


def profile_self(
    x: np.ndarray, m: int, exclusion: int, block: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile of one series.

    Returns (mp_corr, mp_idx): for each window start i, the max Pearson
    correlation against any window j with |i-j| >= exclusion and the
    argmax j (first max wins on exact ties, matching np.argmax and the
    reference's maxAbsIndex tie rule, xcorr.go:39-50). Windows with
    sigma=0 (or whose every admissible partner has sigma=0) get
    mp_corr = nan.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    w = n - m + 1
    if w < 1:
        return np.empty(0), np.empty(0, dtype=np.int64)
    sx, s = _window_stats(x, m)
    win = np.lib.stride_tricks.sliding_window_view(x, m)
    valid = s > 0.0
    mp = np.full(w, -np.inf)
    idx = np.zeros(w, dtype=np.int64)
    js = np.arange(w)
    for lo in range(0, w, block):
        hi = min(lo + block, w)
        # exact dot products for rows [lo, hi) against ALL windows;
        # pooled Pearson (m*G - sx_i*sx_j) / (den_i * den_j) evaluated
        # with the exact expression tree the SQL oracle uses
        g = win[lo:hi] @ win.T  # (hi-lo, w) GEMM
        c = m * g - np.outer(sx[lo:hi], sx)
        denom = np.outer(s[lo:hi], s)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(denom > 0.0, c / denom, -np.inf)
        c[~valid[lo:hi], :] = -np.inf
        c[:, ~valid] = -np.inf
        # exclusion band |i - j| < exclusion
        ii = np.arange(lo, hi)[:, None]
        c[np.abs(ii - js[None, :]) < exclusion] = -np.inf
        mp[lo:hi] = c.max(axis=1)
        idx[lo:hi] = c.argmax(axis=1)
    bad = ~np.isfinite(mp)
    mp[bad] = np.nan
    idx[bad] = -1
    return mp, idx


def profile_ab(
    xa: np.ndarray,
    xb: np.ndarray,
    m: int,
    *,
    off_a: int = 0,
    off_b: int = 0,
    exclusion: int = 0,
    block: int = 2048,
) -> tuple[np.ndarray, np.ndarray]:
    """AB-join partial profile: best correlation of each window of `xa`
    against windows of `xb`, with global window starts off_a + i /
    off_b + j (the exclusion band applies to GLOBAL positions, so
    segment pairs of one underlying series compose correctly).
    Returns (corr, global_idx) for xa's windows; nan/-1 where no
    admissible partner exists."""
    xa = np.asarray(xa, dtype=np.float64)
    xb = np.asarray(xb, dtype=np.float64)
    wa = xa.size - m + 1
    wb = xb.size - m + 1
    if wa < 1 or wb < 1:
        return np.full(max(wa, 0), np.nan), np.full(max(wa, 0), -1)
    sx_a, s_a = _window_stats(xa, m)
    sx_b, s_b = _window_stats(xb, m)
    win_a = np.lib.stride_tricks.sliding_window_view(xa, m)
    win_b = np.lib.stride_tricks.sliding_window_view(xb, m)
    valid_b = s_b > 0.0
    mp = np.full(wa, -np.inf)
    idx = np.zeros(wa, dtype=np.int64)
    gj = off_b + np.arange(wb)
    for lo in range(0, wa, block):
        hi = min(lo + block, wa)
        g = win_a[lo:hi] @ win_b.T
        c = m * g - np.outer(sx_a[lo:hi], sx_b)
        denom = np.outer(s_a[lo:hi], s_b)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(denom > 0.0, c / denom, -np.inf)
        c[s_a[lo:hi] <= 0.0, :] = -np.inf
        c[:, ~valid_b] = -np.inf
        if exclusion > 0:
            gi = off_a + np.arange(lo, hi)
            c[np.abs(gi[:, None] - gj[None, :]) < exclusion] = -np.inf
        mp[lo:hi] = c.max(axis=1)
        idx[lo:hi] = gj[c.argmax(axis=1)]
    bad = ~np.isfinite(mp)
    mp[bad] = np.nan
    idx[bad] = -1
    return mp, idx


def _out_schema(df: DataFrame, keys: tuple[str, ...], ts_col: str):
    fields = [df.schema[k] for k in keys]
    fields.append(T.StructField("pos", T.IntegerType()))
    fields.append(T.StructField(ts_col, df.schema[ts_col].dataType))
    fields += [
        T.StructField("mp_corr", T.DoubleType()),
        T.StructField("mp_idx", T.IntegerType()),
        T.StructField("mp_dist", T.DoubleType()),
    ]
    return T.StructType(fields)


def matrix_profile(
    df: DataFrame,
    value_col: str,
    m: int,
    *,
    keys: tuple[str, ...] = ("conv_id",),
    ts_col: str = "bucket_ts",
    exclusion: int | None = None,
    block: int = 2048,
) -> DataFrame:
    """Per-series matrix profile over a dense (gap-filled) grid.

    One row per window start with a finite profile: keys, pos (0-based
    window start in ts order), ts of the window start, mp_corr (max
    z-normalized Pearson vs any window >= `exclusion` starts away,
    default m//4 like the STAMP convention), mp_idx (its window start),
    mp_dist (the equivalent z-normalized Euclidean distance
    sqrt(2m(1-corr))). Input must already be dense per key (use
    gap_fill first): the profile is positional, silent buckets shift
    every window after them.
    """
    excl = max(1, m // 4) if exclusion is None else exclusion
    keys = tuple(keys)
    schema = _out_schema(df, keys, ts_col)

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(dtype=np.float64)
        mp, idx = profile_self(x, m, excl, block=block)
        w = mp.size
        keep = np.isfinite(mp)
        out = pd.DataFrame(
            {
                **{k: pdf[k].iloc[0] for k in keys},
                "pos": np.arange(w, dtype=np.int32)[keep],
                ts_col: pdf[ts_col].iloc[: w][keep].to_numpy(),
                "mp_corr": mp[keep],
                "mp_idx": idx[keep].astype(np.int32),
                "mp_dist": np.sqrt(
                    np.maximum(2.0 * m * (1.0 - mp[keep]), 0.0)
                ),
            }
        )
        return out

    return (
        df.select(*keys, ts_col, value_col)
        .groupBy(*keys)
        .applyInPandas(one, schema)
    )


def matrix_profile_segments(
    df: DataFrame,
    value_col: str,
    m: int,
    *,
    keys: tuple[str, ...] = ("conv_id",),
    ts_col: str = "bucket_ts",
    exclusion: int | None = None,
    seg_len: int = 4096,
    block: int = 2048,
) -> DataFrame:
    """Segmented matrix profile for series too long for one task.

    Plan: number points per key (one window sort) -> explode each point
    into the <=2 segments that need it (its own, plus the previous
    segment's m-1 overlap tail) -> build the quadratic (seg_a, seg_b)
    pair grid per key relationally -> applyInPandas scores each segment
    pair with the AB-join kernel (exclusion respected via global
    offsets) -> groupBy window max-reduces partial profiles. Equals
    matrix_profile exactly (tested), but no task ever holds more than
    two segments, and the segment-pair grid — not the series — is the
    unit of parallelism.

    At 100 TB: the pair grid for one key is O((n/seg_len)^2) rows, each
    a fixed-size task; the final reduce is an algebraic max on
    (keys, pos). Partial-profile max is associative/commutative, so AQE
    can split or coalesce the grid freely.
    """
    excl = max(1, m // 4) if exclusion is None else exclusion
    keys = tuple(keys)
    from pyspark.sql import Window

    wsort = Window.partitionBy(*keys).orderBy(ts_col)
    pts = df.select(*keys, ts_col, value_col).withColumn(
        "pos", F.row_number().over(wsort) - 1
    )
    # Each segment s owns points [s*seg_len, (s+1)*seg_len + m - 2]:
    # its own span plus the next segment's first m-1 points, so every
    # window whose START lies in the segment is fully local.
    own = pts.withColumn("seg", (F.col("pos") / seg_len).cast("int"))
    tail = pts.where(
        (F.col("pos") % seg_len < m - 1) & (F.col("pos") >= seg_len)
    ).withColumn("seg", (F.col("pos") / seg_len).cast("int") - 1)
    segpts = own.unionByName(tail)

    segs = segpts.groupBy(*keys).agg(
        F.max("seg").alias("max_seg")
    )
    grid = segs.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.col("max_seg"))).alias("seg_a"),
        F.col("max_seg"),
    ).select(
        *keys,
        "seg_a",
        F.explode(F.sequence(F.lit(0), F.col("max_seg"))).alias("seg_b"),
    )
    # Pack each segment's points ONCE (a point row joins by segment id,
    # never by point position), then join the packed segments onto the
    # pair grid — pair rows are O(segments^2), not row-quadratic.
    a_side = segpts.groupBy(*keys, "seg").agg(
        F.sort_array(
            F.collect_list(F.struct("pos", value_col, ts_col))
        ).alias("pts")
    )
    paired = (
        grid.join(
            a_side.select(
                *keys,
                F.col("seg").alias("seg_a"),
                F.col("pts").alias("pts_a"),
            ),
            [*keys, "seg_a"],
        )
        .join(
            a_side.select(
                *keys,
                F.col("seg").alias("seg_b"),
                F.col("pts").alias("pts_b"),
            ),
            [*keys, "seg_b"],
        )
    )

    pair_schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            T.StructField("pos", T.IntegerType()),
            T.StructField(ts_col, df.schema[ts_col].dataType),
            T.StructField("mp_corr", T.DoubleType()),
            T.StructField("mp_idx", T.IntegerType()),
        ]
    )

    def score_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, row in pdf.iterrows():
            pa = sorted(row["pts_a"], key=lambda r: r["pos"])
            pb = sorted(row["pts_b"], key=lambda r: r["pos"])
            xa = np.array([r[value_col] for r in pa], dtype=np.float64)
            xb = np.array([r[value_col] for r in pb], dtype=np.float64)
            off_a = pa[0]["pos"]
            off_b = pb[0]["pos"]
            corr, gidx = profile_ab(
                xa,
                xb,
                m,
                off_a=off_a,
                off_b=off_b,
                exclusion=excl,
                block=block,
            )
            wa = corr.size
            starts = off_a + np.arange(wa)
            own_mask = (starts // seg_len) == row["seg_a"]
            keep = own_mask & np.isfinite(corr)
            if not keep.any():
                continue
            outs.append(
                pd.DataFrame(
                    {
                        **{k: row[k] for k in keys},
                        "pos": starts[keep].astype(np.int32),
                        ts_col: [
                            pa[int(p) - off_a][ts_col]
                            for p in starts[keep]
                        ],
                        "mp_corr": corr[keep],
                        "mp_idx": gidx[keep].astype(np.int32),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=object) for k in keys},
                    "pos": pd.Series([], dtype="int32"),
                    ts_col: pd.Series([], dtype="datetime64[ns]"),
                    "mp_corr": pd.Series([], dtype="float64"),
                    "mp_idx": pd.Series([], dtype="int32"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    partials = paired.groupBy(*keys, "seg_a", "seg_b").applyInPandas(
        score_pair, pair_schema
    )
    best = partials.groupBy(*keys, "pos", ts_col).agg(
        F.max_by(
            F.struct("mp_corr", "mp_idx"), F.struct("mp_corr", -F.col("mp_idx"))
        ).alias("b")
    )
    return best.select(
        *keys,
        "pos",
        ts_col,
        F.col("b.mp_corr").alias("mp_corr"),
        F.col("b.mp_idx").alias("mp_idx"),
        F.sqrt(
            F.greatest(
                F.lit(0.0), 2.0 * m * (1.0 - F.col("b.mp_corr"))
            )
        ).alias("mp_dist"),
    )
