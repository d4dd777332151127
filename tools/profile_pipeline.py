"""Stage-level profile of the headline pipeline at one parallelism level.

Usage: python tools/profile_pipeline.py [cpus] [n_convs]
Prints wall seconds for: corpus load+count, warmup, 1m agg only,
1m+1h+1d aggs, encode(1m), encode(1h), encode(1d), full fused pipeline.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_muse_spark.operators.compress import encode_chunks
from go_muse_spark.operators.rollup import rollup_all_tiers
from go_muse_spark.session import get_bench_spark
from go_muse_spark.sources.transcripts import write_transcripts


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"tx_convs{n_convs}_d64.parquet")
    if not os.path.exists(path):
        write_transcripts(path, n_files=64, n_convs=n_convs, seed=42)
    spark = get_bench_spark(cpus=cpus, app="profile")

    tx = spark.read.parquet(path)
    t = time.time(); n = tx.count(); print(f"count={n} load_count={time.time()-t:.2f}s")
    t = time.time()
    noop(spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long"))
    print(f"warmup={time.time()-t:.2f}s")

    tiers = rollup_all_tiers(tx)
    t = time.time(); noop(tiers["1m"]); print(f"agg_1m={time.time()-t:.2f}s")
    t = time.time()
    for k in ("1m", "1h", "1d"):
        noop(tiers[k])
    print(f"agg_all_seq={time.time()-t:.2f}s")

    # per-tier dense point counts (what the encoder actually processes)
    from pyspark.sql import functions as F
    for k, secs in (("1m", 60), ("1h", 3600), ("1d", 86400)):
        t = time.time()
        row = (
            tiers[k].groupBy("conv_id")
            .agg(((F.unix_timestamp(F.max("bucket_ts")) - F.unix_timestamp(F.min("bucket_ts"))) / secs + 1).alias("d"))
            .agg(F.sum("d")).collect()[0][0]
        )
        print(f"dense_points_{k}={int(row)} ({time.time()-t:.2f}s)")

    tiers = rollup_all_tiers(tx)
    tiers["1m"] = tiers["1m"].persist()
    tiers["1h"] = tiers["1h"].persist()
    noop(tiers["1h"])  # materialize persists
    for k in ("1m", "1h", "1d"):
        t = time.time()
        noop(encode_chunks(tiers[k], k, "turn_cnt", chunk_size=1024, fill="zero"))
        print(f"encode_{k}={time.time()-t:.2f}s")
    tiers["1m"].unpersist(); tiers["1h"].unpersist()

    # full pipeline as bench.py does it
    tiers = rollup_all_tiers(tx)
    tiers["1m"] = tiers["1m"].persist()
    tiers["1h"] = tiers["1h"].persist()
    t = time.time()
    chunked = None
    for k in ("1m", "1h", "1d"):
        c = encode_chunks(tiers[k], k, "turn_cnt", chunk_size=1024, fill="zero")
        chunked = c if chunked is None else chunked.unionByName(c)
    noop(chunked)
    print(f"full_pipeline={time.time()-t:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
