"""Run the headline fused pipeline once with the Spark UI enabled and dump
per-stage wall time + task-time distribution (max vs median = skew).

Usage: python tools/profile_stages.py [cpus] (env corpus knobs as bench.py)
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_muse_spark.operators.compress import encode_tiers_fused
from go_muse_spark.operators.rollup import rollup_transcripts
from go_muse_spark.session import get_bench_spark
from bench import corpus_path, sf_frac


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_bench_spark(cpus=cpus, app="profile-stages",
                      extra={"spark.ui.enabled": "true"})
    tx = spark.read.parquet(corpus_path(sf_frac(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))))
    # warmup python workers
    spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    t0 = time.time()
    chunked = encode_tiers_fused(
        rollup_transcripts(tx, "1m"), "turn_cnt", chunk_size=1024,
        parallelism=4 * spark.sparkContext.defaultParallelism,
    )
    chunked.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"pipeline_wall={wall:.2f}s")

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}/stages"
    stages = json.load(urllib.request.urlopen(base + "?status=complete"))
    stages.sort(key=lambda s: s["stageId"])
    print(f"{'id':>4} {'name':40s} {'tasks':>5} {'stage_s':>8} {'taskSum_s':>9} {'maxTask_s':>9}")
    for s in stages:
        sid = s["stageId"]
        try:
            detail = json.load(urllib.request.urlopen(
                f"{base}/{sid}/0/taskSummary?quantiles=0.5,0.95,1.0"))
            med, p95, mx = [v / 1000 for v in detail["executorRunTime"]]
        except Exception:
            med = p95 = mx = float("nan")
        dur = (s.get("completionTime") and s.get("firstTaskLaunchedTime")) and (
            _ts(s["completionTime"]) - _ts(s["firstTaskLaunchedTime"])) or float("nan")
        print(f"{sid:>4} {s['name'][:40]:40s} {s['numCompleteTasks']:>5} "
              f"{dur:>8.2f} {s['executorRunTime']/1000:>9.1f} {mx:>9.2f}  med={med:.2f} p95={p95:.2f}")
    spark.stop()


def _ts(s):
    import datetime as dt
    return dt.datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


if __name__ == "__main__":
    main()
