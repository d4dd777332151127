"""Spark-free scaling ceiling probe: N pinned worker processes each run
an identical memory-bandwidth-heavy numpy loop; aggregate throughput at
4 vs 16 workers bounds what ANY 4->16 scaling on this host can reach."""
import multiprocessing as mp
import os
import time

import numpy as np

WORK_MB = 64
REPS = 60


def worker(core, q, reps=REPS):
    os.sched_setaffinity(0, {core})
    a = np.arange(WORK_MB * 131072, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    t0 = time.time()
    s = 0.0
    for _ in range(reps):
        np.multiply(a, 1.0000001, out=b)
        s += float(b[-1])
    q.put((time.time() - t0, s))


def run(n, reps=REPS):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(c, q, reps)) for c in range(n)]
    for p in ps:
        p.start()
    walls = [q.get()[0] for _ in ps]
    for p in ps:
        p.join()
    # aggregate throughput over the SLOWEST worker's measured loop wall
    # (workers time only the multiply loop, not fork/allocation/queue
    # overhead, which grows with n and would bias the wide leg low)
    work = n * reps * WORK_MB  # MB of multiplies completed
    return work / max(walls)  # MB/s aggregate


if __name__ == "__main__":
    import sys

    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * lo
    best_lo = max(run(lo) for _ in range(3))
    best_hi = max(run(hi) for _ in range(3))
    eff = (best_hi / best_lo) / (hi / lo)
    print(
        f"agg{lo}={best_lo:.0f} MB/s agg{hi}={best_hi:.0f} MB/s "
        f"ceiling_eff={eff:.3f}"
    )
