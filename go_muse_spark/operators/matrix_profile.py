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
matrix is NEVER materialized: windows are scored in fixed-size
2-D tiles (block=128 rows x _COL_TILE=1024 cols — a 1 MB score tile
that stays cache-resident no matter how long the series, because DRAM
traffic, not flops, is what saturates first at 32-way task
parallelism), so peak memory is O(block * col_tile) and the arithmetic
stays one BLAS GEMM per tile (exact float64 dot products — no STOMP
recurrence drift, which matters because contract oracles compare
against DuckDB's corr() at 1e-6).

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
    "matrix_profile_ab",
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
    x: np.ndarray, m: int, exclusion: int, block: int = 128
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
    mp, idx = _tiled_profile(
        x, x, m, exclusion=exclusion, off_a=0, off_b=0, block=block
    )
    return mp, idx


# 128 x 1024 x 8B = 1 MB score tile: stays in-cache per worker even at
# 32-way task parallelism — untliled, the w-wide tile made the kernel
# DRAM-bandwidth-bound (measured 0.35 scaling 8->32 at w=3009; tiled,
# the kernel tracks the host's own GEMM scaling). Sweep of 512/1024/
# 2048 showed <3% sensitivity, so this does not need per-host tuning.
_COL_TILE = 1024


def _tiled_profile(
    xa: np.ndarray,
    xb: np.ndarray,
    m: int,
    *,
    exclusion: int,
    off_a: int,
    off_b: int,
    block: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared 2-D-tiled scorer: best pooled-Pearson match (and global
    argmax) of each window of xa against windows of xb. Column tiles
    are scanned in ascending j with a strict-> running max, so exact
    ties resolve to the smallest j — the same first-max-wins rule as
    np.argmax over one full row (and the reference's maxAbsIndex,
    xcorr.go:39-50)."""
    xa = np.asarray(xa, dtype=np.float64)
    xb = np.asarray(xb, dtype=np.float64)
    wa = xa.size - m + 1
    wb = xb.size - m + 1
    if wa < 1 or wb < 1:
        return np.full(max(wa, 0), np.nan), np.full(max(wa, 0), -1)
    sx_a, s_a = _window_stats(xa, m)
    if xb is xa:
        sx_b, s_b = sx_a, s_a
    else:
        sx_b, s_b = _window_stats(xb, m)
    # contiguous copies (w x m, tiny vs the score tiles): BLAS drops to
    # a ~20x-slower strided path on the overlapping sliding-window view
    win_a = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(xa, m)
    )
    win_b = (
        win_a
        if sx_b is sx_a
        else np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(xb, m)
        )
    )
    valid_a = s_a > 0.0
    valid_b = s_b > 0.0
    mp = np.full(wa, -np.inf)
    idx = np.full(wa, -1, dtype=np.int64)
    bs = min(block, wa)
    cw = min(_COL_TILE, wb)
    # reused across tiles: fresh per-tile allocations cost more in page
    # faults than the GEMMs they feed
    c_buf = np.empty((bs, cw))
    o_buf = np.empty((bs, cw))
    rows = np.arange(bs)
    for lo in range(0, wa, block):
        hi = min(lo + block, wa)
        k = hi - lo
        best = np.full(k, -np.inf)
        besti = np.full(k, -1, dtype=np.int64)
        for cl in range(0, wb, _COL_TILE):
            ch = min(cl + _COL_TILE, wb)
            cn = ch - cl
            c = c_buf[:k, :cn]
            o = o_buf[:k, :cn]
            # exact dot products; pooled Pearson
            # (m*G - sx_i*sx_j) / (den_i * den_j) evaluated with the
            # exact expression tree the SQL oracle uses (in-place ops
            # keep the SAME value tree — only temps are avoided)
            np.matmul(win_a[lo:hi], win_b[cl:ch].T, out=c)
            c *= m
            np.multiply(sx_a[lo:hi, None], sx_b[None, cl:ch], out=o)
            c -= o
            np.multiply(s_a[lo:hi, None], s_b[None, cl:ch], out=o)
            with np.errstate(divide="ignore", invalid="ignore"):
                c /= o
            # sigma=0 rows/cols overwrite whatever 0-division produced
            c[~valid_a[lo:hi], :] = -np.inf
            c[:, ~valid_b[cl:ch]] = -np.inf
            if exclusion > 0:
                # |global_i - global_j| < exclusion, clipped to tile
                for r in range(lo, hi):
                    gi = off_a + r
                    a = max(cl, gi - exclusion + 1 - off_b)
                    b = min(ch, gi + exclusion - off_b)
                    if a < b:
                        c[r - lo, a - cl : b - cl] = -np.inf
            am = c.argmax(axis=1)
            vm = c[rows[:k], am]
            upd = vm > best
            best[upd] = vm[upd]
            besti[upd] = am[upd] + cl
        fin = np.isfinite(best)
        mp[lo:hi][fin] = best[fin]
        idx[lo:hi][fin] = besti[fin] + off_b
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
    block: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """AB-join partial profile: best correlation of each window of `xa`
    against windows of `xb`, with global window starts off_a + i /
    off_b + j (the exclusion band applies to GLOBAL positions, so
    segment pairs of one underlying series compose correctly).
    Returns (corr, global_idx) for xa's windows; nan/-1 where no
    admissible partner exists."""
    return _tiled_profile(
        np.asarray(xa, dtype=np.float64),
        np.asarray(xb, dtype=np.float64),
        m,
        exclusion=exclusion,
        off_a=off_a,
        off_b=off_b,
        block=block,
    )


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
    block: int = 128,
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


def matrix_profile_ab(
    df: DataFrame,
    query: np.ndarray,
    value_col: str,
    m: int,
    *,
    keys: tuple[str, ...] = ("conv_id",),
    ts_col: str = "bucket_ts",
    block: int = 128,
) -> DataFrame:
    """AB-join matrix profile: "where does the QUERY series' shape
    appear in each corpus series?" For every length-m window of every
    corpus series (one dense gap-filled series per key group), the max
    z-normalized Pearson correlation against ANY length-m window of
    the driver-side ``query`` array, with the matching query window
    start in mp_idx. No exclusion band — the two series are different
    objects, so the self-join's trivial-match problem doesn't exist
    (reference parity: go-muse scores a query against candidate groups
    the same one-vs-many way; this is its windowed generalization,
    muse with EVERY query alignment instead of one).

    ``query`` is a bounded driver-side pattern (like the muse ref in
    operators/search.py) — the corpus side stays fully distributed:
    one applyInPandas per series over the same conv_id exchange as
    matrix_profile, kernel = the tiled AB GEMM (profile_ab), work
    O(n_windows x q_windows) per series with cache-resident tiles.

    Returns one row per corpus window with a finite profile:
    (keys..., pos, ts, mp_corr, mp_idx, mp_dist).
    """
    q = np.asarray(query, dtype=np.float64)
    if q.size < m:
        raise ValueError("query shorter than window length m")
    keys = tuple(keys)
    schema = _out_schema(df, keys, ts_col)

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(dtype=np.float64)
        corr, gidx = profile_ab(x, q, m, exclusion=0, block=block)
        w = corr.size
        keep = np.isfinite(corr)
        return pd.DataFrame(
            {
                **{k: pdf[k].iloc[0] for k in keys},
                "pos": np.arange(w, dtype=np.int32)[keep],
                ts_col: pdf[ts_col].iloc[:w][keep].to_numpy(),
                "mp_corr": corr[keep],
                "mp_idx": gidx[keep].astype(np.int32),
                "mp_dist": np.sqrt(
                    np.maximum(2.0 * m * (1.0 - corr[keep]), 0.0)
                ),
            }
        )

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
    block: int = 128,
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
    # Packing is position-aligned ARRAY columns (offset + values + ts),
    # ordered JVM-side: sort_array on struct(pos, ...) sorts by the
    # unique pos, and the transform()s peel aligned columns off it —
    # the kernel then receives ready float64/timestamp vectors over
    # Arrow instead of a list of per-point structs to unpack in Python.
    packed = (
        segpts.groupBy(*keys, "seg")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", value_col, ts_col))
            ).alias("__p")
        )
        .select(
            *keys,
            "seg",
            F.element_at("__p", 1)["pos"].alias("off"),
            F.transform("__p", lambda x: x[value_col]).alias("vals"),
            F.transform("__p", lambda x: x[ts_col]).alias("tss"),
        )
    )
    paired = (
        grid.join(
            packed.select(
                *keys,
                F.col("seg").alias("seg_a"),
                F.col("off").alias("off_a"),
                F.col("vals").alias("vals_a"),
                F.col("tss").alias("tss_a"),
            ),
            [*keys, "seg_a"],
        )
        .join(
            packed.select(
                *keys,
                F.col("seg").alias("seg_b"),
                F.col("off").alias("off_b"),
                F.col("vals").alias("vals_b"),
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
        for i in range(len(pdf)):
            # Arrow hands list<double> cells as ready numpy vectors;
            # asarray is a view, not a per-point Python unpack
            xa = np.asarray(pdf["vals_a"].iat[i], dtype=np.float64)
            xb = np.asarray(pdf["vals_b"].iat[i], dtype=np.float64)
            off_a = int(pdf["off_a"].iat[i])
            off_b = int(pdf["off_b"].iat[i])
            corr, gidx = profile_ab(
                xa,
                xb,
                m,
                off_a=off_a,
                off_b=off_b,
                exclusion=excl,
                block=block,
            )
            starts = off_a + np.arange(corr.size)
            own_mask = (starts // seg_len) == pdf["seg_a"].iat[i]
            keep = own_mask & np.isfinite(corr)
            if not keep.any():
                continue
            tsa = np.asarray(pdf["tss_a"].iat[i])
            outs.append(
                pd.DataFrame(
                    {
                        **{k: pdf[k].iat[i] for k in keys},
                        "pos": starts[keep].astype(np.int32),
                        ts_col: tsa[starts[keep] - off_a],
                        "mp_corr": corr[keep],
                        "mp_idx": gidx[keep].astype(np.int32),
                    }
                )
            )
        if not outs:
            # dtypes come from the declared pair_schema at the Arrow
            # boundary — empty object columns coerce to ANY declared
            # type (a hardcoded datetime64 here broke non-timestamp
            # ts_col inputs, e.g. an epoch long bucket column)
            return pd.DataFrame(
                columns=[f.name for f in pair_schema.fields]
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
