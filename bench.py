"""Benchmark: headline pipeline + query timings at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "pipeline_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <frac>,
   "turns": N, "throughput_turns_per_sec": T, ...}

The headline is the north_rule metric: turns/sec rolled up + compressed
across the 1m/1h/1d retention tiers on the deterministic transcript
corpus (generated once per sf into .cache/, excluded from timing).
Query timings run each __spark_entry__ query with a noop sink (full
compute, no collect).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from go_muse_spark.operators.compress import encode_chunks  # noqa: E402
from go_muse_spark.operators.rollup import rollup_all_tiers  # noqa: E402
from go_muse_spark.session import get_spark  # noqa: E402
from go_muse_spark.sources.transcripts import write_transcripts  # noqa: E402

BENCH_QUERIES = [
    "rollup_1m",
    "rollup_1d",
    "gapfill_zero_1h",
    "gapfill_ffill_1h",
    "chunks_roundtrip_1h",
    "token_stats",
    "dedup_exact",
    "cosine_topk",
    "muse_topk_1h",
    "muse_grouped_1h",
]


def sf_frac(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(frac: float) -> str:
    """Deterministic transcript corpus sized ~proportionally to sf
    (override with SPARK_GRAFT_CONVS for scaling runs)."""
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", "0")) or max(50, int(20_000 * frac))
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"tx_convs{n_convs}_d64.parquet")
    if not os.path.exists(path):
        write_transcripts(path, n_files=64, n_convs=n_convs, seed=42)
    return path


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    frac = sf_frac(sf_dir)
    spark = get_spark(cpus=cpus, app="go-muse-spark-bench")

    # ---------------- headline: turns/sec across 3 tiers + compression
    tx_path = corpus_path(frac)
    tx = spark.read.parquet(tx_path)
    turns = tx.count()
    # spawn the Python UDF workers before the clock starts (one-time cost,
    # irrelevant to steady-state throughput)
    noop_write(
        spark.range(cpus * 4)
        .repartition(cpus)
        .mapInPandas(lambda it: it, "id long")
    )
    t0 = time.time()
    tiers = rollup_all_tiers(tx)
    tiers["1m"] = tiers["1m"].persist()
    tiers["1h"] = tiers["1h"].persist()
    # fused gapfill+encode per tier, one action for all three tiers
    chunked = None
    for tier in ("1m", "1h", "1d"):
        chunks = encode_chunks(
            tiers[tier], tier, "turn_cnt", chunk_size=1024, fill="zero"
        )
        chunked = chunks if chunked is None else chunked.unionByName(chunks)
    noop_write(chunked)
    pipeline_wall = time.time() - t0
    tiers["1m"].unpersist()
    tiers["1h"].unpersist()

    # ---------------- per-query timings on the driver fixtures
    # best-of-2 per query: the second run amortizes Python-worker spawn
    # and JIT noise, which dominate at local bench scale
    qmap = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop_write(qmap[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "pipeline_wall_sec",
        "value": round(pipeline_wall, 3),
        "unit": "sec",
        "queries": timings,
        "sf": frac,
        "turns": turns,
        "throughput_turns_per_sec": round(turns / pipeline_wall, 1),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
