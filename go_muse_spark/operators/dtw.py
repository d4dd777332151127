"""Dynamic-time-warping similarity search over rolled-up series.

DTW is the classic "same shape, locally stretched in time" distance —
the complement of the muse FFT path (xcorr sweeps a GLOBAL lag; DTW
lets the alignment warp point-by-point within a band, catching a
conversation that does the same thing 20% slower). The reference's
correlation-search framing (README.md:7-20) is the zero-warp special
case; this operator covers the elastic case dashboards ask for when
rigid-lag correlation misses slowed-down replays of an incident.

Numerics: the per-cell cost is |a_i − b_j| on integer (micro-unit)
values and the DP accumulates in int64, so the distance is EXACT — a
DuckDB oracle replaying the same recurrence (recursive CTE over
anti-diagonals) matches bit-for-bit, no float rounding anywhere.

Scale shape (the corr_pairs discipline): the pair space is quadratic,
so candidates are bounded BEFORE the join — `top_series` keeps the N
most active keys via a broadcast semi-join, then the N-row series
table self-joins (key_a < key_b) broadcast-side. Each pair's DP is
vectorized over ANTI-DIAGONALS (the recurrence's only dependency-free
axis): O(n+m) numpy ops of length ≤ min(n, m), never a Python
per-cell loop. A Sakoe-Chiba `band` caps the warp and cuts work to
O(n·band). For unbounded-N search, prefilter candidates with the
SAX/PAA LSH path (operators/downsample.sax_words +
operators/similarity.py) and verify the survivors here; for long raw
series, run DTW over a rollup tier (the 1d tier caps n at
days-of-retention) — warping below the bucket width is noise anyway.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dtw_distance", "dtw_distance_batch", "dtw_pairs"]

_INF = np.int64(1) << np.int64(62)


def dtw_distance(
    a: np.ndarray, b: np.ndarray, band: int | None = None
) -> int | None:
    """Exact integer DTW distance between two int64 vectors, or None
    when the pair is unreachable under the band (|n−m| > band — a
    Sakoe-Chiba band admits a full path iff the length gap fits inside
    it). None, not an INF sentinel: a sentinel returned as a distance
    poisons any downstream mean/threshold.

    Anti-diagonal vectorization: cells (i, j) with i+j == k form
    diagonal k; D[k] depends only on D[k−1] (up, left) and D[k−2]
    (diagonal), so each of the n+m−1 steps is a handful of numpy
    shift/min ops — and with `band` set, each diagonal's in-band
    i-interval is computed analytically, so the work is O(n·band),
    not O(n·m) with a mask.
    """
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("dtw_distance: empty series")
    if band is not None and abs(n - m) > band:
        return None
    # diag k (0-based k = i+j, i over a, j over b): valid i in
    # [max(0, k-m+1), min(k, n-1)]; store diagonals as full-length-n
    # vectors indexed by i, invalid cells = INF.
    prev2 = np.full(n, _INF, dtype=np.int64)  # diag k-2
    prev1 = np.full(n, _INF, dtype=np.int64)  # diag k-1
    prev1[0] = abs(a[0] - b[0])  # D(0,0), diag k=0
    if n == 1 and m == 1:
        return int(prev1[0])
    for k in range(1, n + m - 1):
        cur = np.full(n, _INF, dtype=np.int64)
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        if band is not None:
            # |i − j| = |2i − k| ≤ band  ⇔  ⌈(k−band)/2⌉ ≤ i ≤ ⌊(k+band)/2⌋
            lo = max(lo, (k - band + 1) // 2)
            hi = min(hi, (k + band) // 2)
            if lo > hi:
                prev2, prev1 = prev1, cur
                continue
        i = np.arange(lo, hi + 1)
        j = k - i
        cost = np.abs(a[i] - b[j])
        up = np.where(i > 0, prev1[np.maximum(i - 1, 0)], _INF)  # (i-1, j)
        left = np.where(j > 0, prev1[i], _INF)  # (i, j-1)
        diag = np.where(
            (i > 0) & (j > 0), prev2[np.maximum(i - 1, 0)], _INF
        )  # (i-1, j-1)
        best = np.minimum(np.minimum(up, left), diag)
        # the k=1 corner cells reach back to D(0,0) only via up/left
        cur[i] = cost + np.minimum(best, _INF)
        prev2, prev1 = prev1, cur
    return int(prev1[n - 1])


def dtw_distance_batch(
    A: np.ndarray, B: np.ndarray, band: int | None = None
) -> np.ndarray:
    """Exact integer DTW for a STACK of same-length pairs: A (P, n) vs
    B (P, m) row-by-row, returning int64[P]. Bit-identical to
    dtw_distance per row — same recurrence, same INF algebra — but the
    per-diagonal numpy ops run once for ALL P pairs, so the ~30 µs/op
    dispatch overhead that dominates a single 128-pt pair (measured
    ~8 ms/pair solo) is amortized P-ways (~0.1 ms/pair at P≈2000).
    dtw_pairs groups its Arrow batch by (n, m) and routes through here.
    """
    A = np.ascontiguousarray(A, dtype=np.int64)
    B = np.ascontiguousarray(B, dtype=np.int64)
    P, n = A.shape
    m = B.shape[1]
    if n == 0 or m == 0:
        raise ValueError("dtw_distance_batch: empty series")
    if band is not None and abs(n - m) > band:
        raise ValueError(
            "dtw_distance_batch: |n-m| > band (unreachable); caller "
            "must drop these pairs first"
        )
    prev2 = np.full((P, n), _INF, dtype=np.int64)
    prev1 = np.full((P, n), _INF, dtype=np.int64)
    prev1[:, 0] = np.abs(A[:, 0] - B[:, 0])
    if n == 1 and m == 1:
        return prev1[:, 0].copy()
    for k in range(1, n + m - 1):
        cur = np.full((P, n), _INF, dtype=np.int64)
        lo = max(0, k - m + 1)
        hi = min(k, n - 1)
        if band is not None:
            lo = max(lo, (k - band + 1) // 2)
            hi = min(hi, (k + band) // 2)
            if lo > hi:
                prev2, prev1 = prev1, cur
                continue
        i = np.arange(lo, hi + 1)
        j = k - i
        cost = np.abs(A[:, i] - B[:, j])
        ishift = np.maximum(i - 1, 0)
        up = np.where(i > 0, prev1[:, ishift], _INF)
        left = np.where(j > 0, prev1[:, i], _INF)
        diag = np.where((i > 0) & (j > 0), prev2[:, ishift], _INF)
        best = np.minimum(np.minimum(up, left), diag)
        cur[:, i] = cost + np.minimum(best, _INF)
        prev2, prev1 = prev1, cur
    return prev1[:, n - 1].copy()



def dtw_pairs(
    series: DataFrame,
    key_col: str = "conv_id",
    idx_col: str = "bucket_ts",
    value_col: str = "turn_cnt",
    top_series: int | None = 12,
    band: int | None = None,
    broadcast_series: bool = False,
    pair_partitions: int | None = None,
) -> DataFrame:
    """All-pairs DTW over per-key series gathered from a long tier
    table — "which conversations trace the same daily shape, allowing
    local time stretch?".

    Input rows (key, idx, value) with integral values; each key's
    series is its values ordered by (idx) — gaps are the caller's
    contract (gap-fill first if a dense grid is wanted). Pairs are
    emitted once with key_a < key_b, with the exact int64 DTW distance
    and the length-normalized double. Under a band, pairs whose length
    gap exceeds it (unreachable) are DROPPED, not emitted with a
    sentinel.

    Plan: ONE exchange gathers each key's series (sorted struct
    collect — same one-pass idiom as the chunk encoder), top-N bounds
    the key set via TakeOrdered + broadcast semi-join, the pair join
    broadcasts the N-row array table, and the DP runs in Arrow batches
    (mapInPandas) with the batched anti-diagonal numpy kernel (one
    diagonal sweep per shape group, not per pair). No shuffle after
    the gather.

    broadcast_series=True switches to the muse-style plan for larger
    N: the gathered arrays (N·n int64 — the caller's top-N contract
    makes this driver-collectable) broadcast ONCE, the pair table
    carries only the two keys, and `pair_partitions` spreads the N²/2
    key pairs evenly over the cluster. This removes the ~N× array
    duplication the join plan ships through Arrow (each series rides
    in N−1 pair rows), turning the stage compute-bound.
    """
    r = series.select(
        F.col(key_col).alias("k"),
        F.col(idx_col).alias("i"),
        F.col(value_col).cast("long").alias("v"),
    )
    if top_series is not None:
        top = (
            r.groupBy("k")
            .agg(F.sum(F.abs(F.col("v"))).alias("__w"))
            .orderBy(F.desc("__w"), "k")
            .limit(int(top_series))
            .select("k")
        )
        r = r.join(F.broadcast(top), "k")
    gathered = r.groupBy("k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))), lambda s: s["v"]
        ).alias("vals")
    )
    spark = series.sparkSession
    if broadcast_series:
        rows = gathered.collect()  # bounded: the top-N contract
        smap = {
            r["k"]: np.asarray(r["vals"], dtype=np.int64) for r in rows
        }
        bser = spark.sparkContext.broadcast(smap)
        keys = spark.createDataFrame(
            [(k,) for k in sorted(smap)], "key_a string"
        )
        kb = keys.select(F.col("key_a").alias("key_b"))
        pairs = keys.join(F.broadcast(kb), F.col("key_a") < F.col("key_b"))
        pairs = pairs.repartition(
            pair_partitions
            or spark.sparkContext.defaultParallelism * 4
        )

        def fetch(pdf):
            sm = bser.value
            return (
                [sm[k] for k in pdf["key_a"]],
                [sm[k] for k in pdf["key_b"]],
            )

    else:
        a = gathered.select(
            F.col("k").alias("key_a"), F.col("vals").alias("va")
        )
        b = gathered.select(
            F.col("k").alias("key_b"), F.col("vals").alias("vb")
        )
        pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))

        def fetch(pdf):
            return pdf["va"].to_numpy(), pdf["vb"].to_numpy()

    band_ = band
    out_schema = (
        "key_a string, key_b string, n_a int, n_b int, "
        "dtw long, dtw_norm double"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "key_a": pd.Series(dtype="str"),
                        "key_b": pd.Series(dtype="str"),
                        "n_a": pd.Series(dtype="int32"),
                        "n_b": pd.Series(dtype="int32"),
                        "dtw": pd.Series(dtype="int64"),
                        "dtw_norm": pd.Series(dtype="float64"),
                    }
                )
                continue
            ka = pdf["key_a"].to_numpy()
            kb = pdf["key_b"].to_numpy()
            va, vb = fetch(pdf)
            lens_a = np.fromiter((len(v) for v in va), dtype=np.int64)
            lens_b = np.fromiter((len(v) for v in vb), dtype=np.int64)
            keep = np.arange(len(pdf))
            if band_ is not None:  # unreachable under the band: drop
                keep = keep[np.abs(lens_a - lens_b) <= band_]
            # group rows by (n, m) and run each group through the
            # batched DP — one diagonal sweep per shape, not per pair
            dists = np.empty(len(pdf), dtype=np.int64)
            shapes = {}
            for x in keep:
                shapes.setdefault((lens_a[x], lens_b[x]), []).append(x)
            for (na, nb), idxs in shapes.items():
                A = np.asarray(
                    [np.asarray(va[x], dtype=np.int64) for x in idxs]
                ).reshape(len(idxs), na)
                B = np.asarray(
                    [np.asarray(vb[x], dtype=np.int64) for x in idxs]
                ).reshape(len(idxs), nb)
                dists[idxs] = dtw_distance_batch(A, B, band=band_)
            n_a = lens_a[keep].astype(np.int32)
            n_b = lens_b[keep].astype(np.int32)
            d = dists[keep]
            out = {"key_a": ka[keep], "key_b": kb[keep]}
            yield pd.DataFrame(
                {
                    "key_a": np.asarray(out["key_a"], dtype=object),
                    "key_b": np.asarray(out["key_b"], dtype=object),
                    "n_a": n_a,
                    "n_b": n_b,
                    "dtw": d,
                    "dtw_norm": d.astype(np.float64)
                    / (n_a.astype(np.float64) + n_b.astype(np.float64)),
                }
            )

    return pairs.mapInPandas(score, schema=out_schema)
