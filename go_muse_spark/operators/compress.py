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

__all__ = ["encode_chunks", "decode_chunks", "CHUNK_SCHEMA"]

CHUNK_SCHEMA = (
    "conv_id string, tier string, chunk_start timestamp, n_points int, "
    "ts_bytes binary, val_bytes binary"
)


def encode_chunks(
    filled: DataFrame,
    tier: str,
    value_col: str = "turn_cnt",
    chunk_size: int = 1024,
    fill: str | None = None,
    tier_secs: int | None = None,
) -> DataFrame:
    """Compress dense (conv_id, bucket_ts, value) rows into chunk rows.

    fill=None expects already-dense input (gap_fill output). fill=
    "zero"/"ffill"/"linear" fuses the gap fill into this same grouped
    pass (reindex over the conv's bucket range inside the UDF) — one
    shuffle + one Python stage instead of two joins + a shuffle, the
    preferred shape for the ingest pipeline.
    """
    if fill is not None and tier_secs is None:
        from go_muse_spark.operators.rollup import TIERS

        tier_secs = TIERS[tier][1]

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        if fill is not None:
            s = pdf.set_index("bucket_ts")[value_col]
            idx = pd.date_range(
                s.index.min(), s.index.max(), freq=pd.Timedelta(seconds=tier_secs)
            )
            s = s.reindex(idx)
            if fill == "zero":
                s = s.fillna(0.0)
            elif fill == "ffill":
                s = s.ffill()
            elif fill == "linear":
                s = s.interpolate(method="linear", limit_direction="both")
            else:
                raise ValueError(f"unknown fill {fill!r}")
            pdf = pd.DataFrame(
                {"conv_id": pdf["conv_id"].iloc[0], "bucket_ts": idx, value_col: s.to_numpy()}
            )
        ts = pdf["bucket_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        conv = pdf["conv_id"].iloc[0]
        rows = []
        for lo in range(0, len(ts), chunk_size):
            hi = min(lo + chunk_size, len(ts))
            rows.append(
                (
                    conv,
                    tier,
                    pdf["bucket_ts"].iloc[lo],
                    hi - lo,
                    encode_timestamps(ts[lo:hi]),
                    encode_floats(vals[lo:hi]),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id",
                "tier",
                "chunk_start",
                "n_points",
                "ts_bytes",
                "val_bytes",
            ],
        )

    return (
        filled.select("conv_id", "bucket_ts", value_col)
        .groupBy("conv_id")
        .applyInPandas(encode, CHUNK_SCHEMA)
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
