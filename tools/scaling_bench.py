"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (BASELINE.md §target): run the identical bench at N and 4N
local cores (fresh JVM each, via subprocess), report throughput at both
and efficiency = (T_N / T_4N) / 4 == (thr_4N / thr_N) / 4.

Usage: python tools/scaling_bench.py [sf_dir] [N] [out_md]
Appends a results section to BENCH.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Scaling-run corpus: sparse long-span conversations (mean inter-turn gap
# 1h) so the gap-fill + hierarchical re-agg + Gorilla encode stage carries
# hundreds of core-seconds of parallel work — at the default sf0.1 corpus
# the whole pipeline finishes in a few seconds of fixed stage latency and
# no parallelism level can differentiate itself. Same corpus for both
# legs, which is what the north_rule's two-cluster-size criterion asks.
SCALING_CORPUS = {
    "SPARK_GRAFT_CONVS": "20000",
    "SPARK_GRAFT_GAP_S": "3600",
    "SPARK_GRAFT_SPAN_D": "30",
}


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    for k, v in SCALING_CORPUS.items():
        env.setdefault(k, v)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_md = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "BENCH.md")

    os.environ["SPARK_GRAFT_SKIP_QUERIES"] = "1"  # lo leg: pipeline only
    lo = run_at(n, sf_dir)
    del os.environ["SPARK_GRAFT_SKIP_QUERIES"]
    hi = run_at(4 * n, sf_dir)
    thr_lo = lo["throughput_turns_per_sec"]
    thr_hi = hi["throughput_turns_per_sec"]
    eff = (thr_hi / thr_lo) / 4.0
    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    section = f"""
## Scaling run {stamp} — {sf_dir}

Same code, same input, two parallelism levels (fresh JVM each):

| cores | pipeline wall (s) | turns | throughput (turns/s) |
|---|---|---|---|
| local[{n}] | {lo['value']} | {lo['turns']} | {thr_lo} |
| local[{4*n}] | {hi['value']} | {hi['turns']} | {thr_hi} |

**Scaling efficiency (N -> 4N) = (thr_4N / thr_N) / 4 = {eff:.3f}**
(north_rule bar: >= 0.8)

Per-query seconds at local[{4*n}]: `{json.dumps(hi['queries'])}`
"""
    with open(out_md, "a") as f:
        f.write(section)
    print(json.dumps({"n": n, "thr_n": thr_lo, "thr_4n": thr_hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
