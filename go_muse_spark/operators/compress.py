"""L3 — chunk tables: per-(conv, tier) byte-packed compressed segments.

encode_chunks: dense rolled-up rows -> chunks(conv_id, tier, chunk_start,
n_points, ts_bytes, val_bytes). One grouped-map pandas UDF per conv; the
Gorilla/DoD codecs (functions/codecs.py) run at chunk granularity.

decode_chunks: chunks -> long-form rows, via mapInPandas (each chunk
decodes independently — no shuffle at all; Catalyst prunes val_bytes if
only timestamps are selected and vice versa... it cannot, actually, since
both live in each output row — so select only what you need BEFORE wide
pipelines).

Partitioning note for 10^12-turn scale: chunk rows are small and uniform
(<= chunk_size points each); a hot conversation becomes many chunk rows,
so downstream work over chunks is naturally balanced — this is the L3
answer to skew, complementing the search-stage salting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions.codecs import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)

__all__ = ["encode_chunks", "encode_tiers_fused", "decode_chunks", "CHUNK_SCHEMA"]

CHUNK_SCHEMA = (
    "conv_id string, tier string, chunk_start timestamp, n_points int, "
    "ts_bytes binary, val_bytes binary"
)


def _dense_fill(
    ts: np.ndarray, vals: np.ndarray, step_us: int, fill: str
) -> tuple[np.ndarray, np.ndarray]:
    """Densify one conv's (sorted) sparse buckets over [min, max]."""
    lo, hi = int(ts[0]), int(ts[-1])
    n = (hi - lo) // step_us + 1
    if n == len(ts):  # already dense
        return ts, vals
    dense_ts = lo + np.arange(n, dtype=np.int64) * step_us
    idx = (ts - lo) // step_us
    if fill == "zero":
        out = np.zeros(n, dtype=np.float64)
        out[idx] = vals
    elif fill == "ffill":
        # index of the most recent present bucket at each dense position
        present = np.zeros(n, dtype=np.int64)
        present[idx] = 1
        src = np.cumsum(present) - 1
        out = vals[src]
    elif fill == "linear":
        out = np.interp(dense_ts, ts, vals)  # interior lerp, edge clamp
    else:
        raise ValueError(f"unknown fill {fill!r}")
    return dense_ts, out


def encode_chunks(
    filled: DataFrame,
    tier: str,
    value_col: str = "turn_cnt",
    chunk_size: int = 1024,
    fill: str | None = None,
    tier_secs: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Compress (conv_id, bucket_ts, value) rows into chunk rows.

    fill=None expects already-dense input (gap_fill output); fill=
    "zero"/"ffill"/"linear" densifies inside the same pass (numpy
    scatter/accumulate/interp — fused gap fill, no spine join).

    Shape: repartition by conv_id + sortWithinPartitions + ONE
    mapInPandas over whole partitions. Groups are sliced with numpy
    boundary arithmetic instead of per-group pandas frames — per-group
    overhead is ~microseconds, which matters when millions of small
    conversations each contribute a handful of buckets (the grouped-map
    alternative costs ~ms per group in Arrow/pandas machinery alone).
    """
    if fill is not None and tier_secs is None:
        from go_muse_spark.operators.rollup import TIERS

        tier_secs = TIERS[tier][1]
    step_us = (tier_secs or 0) * 1_000_000
    spark = filled.sparkSession
    n_part = parallelism or spark.sparkContext.defaultParallelism

    def op(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        convs = pdf["conv_id"].to_numpy()
        ts_all = pdf["bucket_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals_all = pdf[value_col].to_numpy(dtype=np.float64)
        change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(convs)]))
        out_conv, out_start, out_n, out_tb, out_vb = [], [], [], [], []
        for s, e in zip(starts, ends):
            ts, vals = ts_all[s:e], vals_all[s:e]
            if fill is not None:
                ts, vals = _dense_fill(ts, vals, step_us, fill)
            for lo in range(0, len(ts), chunk_size):
                hi = min(lo + chunk_size, len(ts))
                out_conv.append(convs[s])
                out_start.append(ts[lo])
                out_n.append(hi - lo)
                out_tb.append(encode_timestamps(ts[lo:hi]))
                out_vb.append(encode_floats(vals[lo:hi]))
        if not out_conv:
            return
        yield pd.DataFrame(
            {
                "conv_id": out_conv,
                "tier": tier,
                "chunk_start": pd.to_datetime(np.asarray(out_start, dtype="datetime64[us]")),
                "n_points": np.asarray(out_n, dtype=np.int32),
                "ts_bytes": out_tb,
                "val_bytes": out_vb,
            }
        )

    return (
        filled.select("conv_id", "bucket_ts", value_col)
        .repartition(n_part, "conv_id")
        .sortWithinPartitions("conv_id", "bucket_ts")
        .mapInPandas(op, CHUNK_SCHEMA)
    )


def encode_tiers_fused(
    rollup_1m: DataFrame,
    value_col: str = "turn_cnt",
    chunk_size: int = 1024,
    parallelism: int | None = None,
) -> DataFrame:
    """All three retention tiers in ONE pass over the 1m continuous
    aggregate: zero-gap-fill the sparse 1m rollup to a dense spine,
    hierarchically re-aggregate 1m -> 1h -> 1d with ``np.add.reduceat``,
    and Gorilla/DoD-encode every tier's chunks — a single shuffle
    (repartition by conv_id) and a single mapInPandas stage for the whole
    L2+L3 pipeline, versus 2 groupBy shuffles + 3 repartition shuffles +
    3 Python stages for the unfused per-tier path.

    Equivalent to ``encode_chunks(tier, fill="zero")`` per tier (count/sum
    aggregates compose exactly across tiers; the zero-filled dense 1m
    series sums hour-by-hour to the sparse 1h rollup because filled
    minutes contribute 0) — asserted by tests/test_compress_spark.py.

    Scale note (10^12 turns): input is the already-shuffled 1m aggregate
    (O(convs x buckets) rows, not O(turns)); the only data movement here
    is one hash exchange on conv_id. Hot conversations emit many uniform
    chunk rows, so downstream stays balanced.
    """
    hour_us = 3_600 * 1_000_000
    day_us = 86_400 * 1_000_000
    spark = rollup_1m.sparkSession
    n_part = parallelism or spark.sparkContext.defaultParallelism

    def _coarsen(ts: np.ndarray, vals: np.ndarray, step_us: int):
        """Dense finer series -> dense coarser sums (bucket = floor/step)."""
        bucket = ts // step_us
        bounds = np.flatnonzero(bucket[1:] != bucket[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        return bucket[starts] * step_us, np.add.reduceat(vals, starts)

    def op(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        convs = pdf["conv_id"].to_numpy()
        ts_all = pdf["bucket_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals_all = pdf[value_col].to_numpy(dtype=np.float64)
        change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(convs)]))
        out: dict[str, list] = {
            "conv_id": [], "tier": [], "chunk_start": [],
            "n_points": [], "ts_bytes": [], "val_bytes": [],
        }
        for s, e in zip(starts, ends):
            ts_1m, v_1m = _dense_fill(ts_all[s:e], vals_all[s:e], 60_000_000, "zero")
            ts_1h, v_1h = _coarsen(ts_1m, v_1m, hour_us)
            ts_1d, v_1d = _coarsen(ts_1h, v_1h, day_us)
            for tier, ts, vals in (
                ("1m", ts_1m, v_1m), ("1h", ts_1h, v_1h), ("1d", ts_1d, v_1d)
            ):
                for lo in range(0, len(ts), chunk_size):
                    hi = min(lo + chunk_size, len(ts))
                    out["conv_id"].append(convs[s])
                    out["tier"].append(tier)
                    out["chunk_start"].append(ts[lo])
                    out["n_points"].append(hi - lo)
                    out["ts_bytes"].append(encode_timestamps(ts[lo:hi]))
                    out["val_bytes"].append(encode_floats(vals[lo:hi]))
        if not out["conv_id"]:
            return
        out["chunk_start"] = pd.to_datetime(
            np.asarray(out["chunk_start"], dtype="datetime64[us]")
        )
        out["n_points"] = np.asarray(out["n_points"], dtype=np.int32)
        yield pd.DataFrame(out)

    return (
        rollup_1m.select("conv_id", "bucket_ts", value_col)
        .repartition(n_part, "conv_id")
        .sortWithinPartitions("conv_id", "bucket_ts")
        .mapInPandas(op, CHUNK_SCHEMA)
    )


def decode_chunks(chunks: DataFrame, value_col: str = "turn_cnt") -> DataFrame:
    """Chunk rows -> long-form (conv_id, tier, bucket_ts, value).

    mapInPandas: embarrassingly parallel, no shuffle; each chunk expands
    to n_points rows.
    """
    out_schema = f"conv_id string, tier string, bucket_ts timestamp, {value_col} double"

    def decode(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                n = int(row.n_points)
                ts = decode_timestamps(bytes(row.ts_bytes), n)
                vals = decode_floats(bytes(row.val_bytes), n)
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "tier": row.tier,
                            "bucket_ts": ts.astype("datetime64[us]"),
                            value_col: vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.mapInPandas(decode, out_schema)
