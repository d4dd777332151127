"""SparkSession factory tuned for this engine.

local[N] in-sandbox; the same settings are what we'd ship in
spark-submit --conf for a multi-executor cluster (AQE on, Arrow on,
shuffle partitions sized to parallelism, UTC session time).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CPUS"]

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app: str = "go-muse-spark",
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        # shuffle partitions ~ parallelism, not the 200 default; AQE
        # coalesces down when partitions come out small
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's byte-based coalescing can't see Python/pandas-UDF CPU cost
        # and will collapse a small-but-compute-heavy stage (Gorilla encode,
        # xcorr scoring) to 1-2 partitions. A low floor keeps those stages
        # at full parallelism; at real scale partitions are big and this
        # floor is a no-op.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_mem or os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
