"""Structured Streaming front-end over the incremental-batch engine.

The engine's native cadence is incremental batch (SURVEY.md §2b): tier
maintenance is a MERGE of affected buckets, which maps onto Structured
Streaming via foreachBatch — each micro-batch becomes one
ContinuousAggregates.ingest(delta, run_id) call, giving exactly-once tier
updates on top of the checkpointed source offsets (the run_id is the
epoch id, so a replayed epoch is a committed no-op).

Late data: the watermark here only bounds state for the optional pure-
streaming aggregation; correctness of the tiers does NOT depend on it —
late turns reopen their buckets through the MERGE path, regardless of
how late they arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.plans.continuous import ContinuousAggregates

__all__ = ["stream_ingest", "streaming_rollup_1m"]


def stream_ingest(
    stream: DataFrame,
    ca: ContinuousAggregates,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
):
    """Wire a streaming transcript source into the continuous aggregates.

    stream: a readStream DataFrame with the transcript schema. Returns the
    started StreamingQuery; call .processAllAvailable() in tests.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ca.ingest(batch_df, f"epoch-{epoch_id:012d}")

    writer = (
        stream.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def streaming_rollup_1m(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Pure-streaming 1m rollup (windowed agg + watermark) for callers who
    want append-mode output instead of merged tier tables."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.count(F.when(F.col("role") == "tool", 1)).alias("tool_cnt"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket_ts"),
            "turn_cnt",
            "tool_cnt",
        )
    )
