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
    "SPARK_GRAFT_CONVS": "100000",
    "SPARK_GRAFT_GAP_S": "3600",
    "SPARK_GRAFT_SPAN_D": "30",
}


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    for k, v in SCALING_CORPUS.items():
        env.setdefault(k, v)
    # Pin the process (JVM + Python workers) to exactly `cpus` cores.
    # An unpinned local[N] floats its N task threads over all host cores
    # — with the whole machine's L3, memory bandwidth, and turbo budget —
    # which is NOT what an N-core executor gets on a real cluster. Pinning
    # is the faithful N-core emulation, and it's what makes the N vs 4N
    # comparison honest.
    pin = ["taskset", "-c", f"0-{cpus - 1}"]
    out = subprocess.run(
        pin + [sys.executable, os.path.join(REPO, "bench.py")],
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
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_md = sys.argv[4] if len(sys.argv) > 4 else os.path.join(REPO, "BENCH.md")

    # Interleave the two legs over `pairs` rounds and keep the MIN wall
    # per leg: single-pair runs on this shared host swing from 0.40 to
    # 1.19 "efficiency" purely on which leg a co-tenant burst lands on
    # (superlinear readings are the smoking gun — they are impossible
    # without external interference). The min over interleaved attempts
    # estimates each leg's cost on quiet hardware; both legs get the same
    # number of chances, so the comparison stays symmetric.
    os.environ["SPARK_GRAFT_SKIP_QUERIES"] = "1"
    lo_runs, hi_runs = [], []
    for _ in range(pairs):
        lo_runs.append(run_at(n, sf_dir))
        hi_runs.append(run_at(4 * n, sf_dir))
    del os.environ["SPARK_GRAFT_SKIP_QUERIES"]
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    thr_lo = lo["throughput_turns_per_sec"]
    thr_hi = hi["throughput_turns_per_sec"]
    eff = (thr_hi / thr_lo) / 4.0
    # Same-moment hardware ceiling: the host's OWN 4->16 bandwidth
    # scaling (tools/ceiling_bench.py), measured right after the legs.
    # An efficiency reading is only interpretable against this pair —
    # the 2026-08-18 night runs measured engine 0.733 while the raw
    # bandwidth ceiling was 0.433 on the same machine minutes apart.
    try:
        probe = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ceiling_bench.py"),
             str(n), str(4 * n)],
            capture_output=True, text=True, timeout=600, check=True,
        ).stdout.strip()
    except Exception as e:  # never fail the run for the probe
        probe = f"ceiling probe failed: {e}"
    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    all_lo = [r["value"] for r in lo_runs]
    all_hi = [r["value"] for r in hi_runs]
    section = f"""
## Scaling run {stamp} — {sf_dir}

Same job, same input, both legs pinned to their core count
(`taskset`), {pairs} interleaved attempts per leg (each attempt itself
best-of-3 in-process), min wall per leg:

| cores | pipeline wall (s) | all attempts (s) | turns | throughput (turns/s) |
|---|---|---|---|---|
| local[{n}] pinned 0-{n-1} | {lo['value']} | {all_lo} | {lo['turns']} | {thr_lo} |
| local[{4*n}] pinned 0-{4*n-1} | {hi['value']} | {all_hi} | {hi['turns']} | {thr_hi} |

**Scaling efficiency (N -> 4N) = (thr_4N / thr_N) / 4 = {eff:.3f}**
(north_rule bar: >= 0.8)
Same-moment Spark-free hardware ceiling ({n} vs {4*n} pinned numpy
workers): `{probe}`
"""
    with open(out_md, "a") as f:
        f.write(section)
    print(json.dumps({"n": n, "thr_n": thr_lo, "thr_4n": thr_hi,
                      "efficiency": round(eff, 3),
                      "lo_walls": all_lo, "hi_walls": all_hi,
                      "ceiling_probe": probe}))


if __name__ == "__main__":
    main()
