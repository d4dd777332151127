"""Adapter: the driver's `events` table as a transcript-shaped stream.

events(event_id, ts, user_id, event_type, value, props) maps onto the
engine's input contract (conv_id, turn_idx, role, text, tool, ts): each
user is a conversation, each event a turn. This lets every engine
operator (rollup tiers, gap fill, chunks, muse search) run unchanged on
the driver-provided fixtures, with DuckDB oracles over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["events_as_transcripts", "load_table"]


def load_table(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_as_transcripts(events: DataFrame) -> DataFrame:
    """Rename into the transcript contract; keeps `value` for sum rollups."""
    return events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("long").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit("").alias("tool"),
        F.col("ts"),
        F.col("value"),
    )
