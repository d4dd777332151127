"""Spark-free scaling ceiling probes: N pinned worker processes each run
an identical numpy loop; aggregate throughput at N vs 4N workers bounds
what ANY N->4N scaling on this host can reach.

Two probe kinds bracket the host:
  * bandwidth (default): streaming multiply over 64 MB arrays — bounds
    shuffle/Arrow/scan-heavy stages. On this VM the bound swings 0.2-0.85
    with co-tenant load (8 pinned vCPUs can burst the whole chip's
    memory bandwidth; 32 cannot).
  * flops (--flops): repeated rfft over an L2-resident array — bounds
    compute-dense stages (the xcorr kernels). Nearly load-invariant.
An engine leg whose efficiency lands between (flops, bandwidth) is
scaling as well as its instruction mix allows on this machine.
"""
import multiprocessing as mp
import os
import time

import numpy as np

WORK_MB = 64
REPS = 60
FFT_N = 32768  # 256 KB array: L2-resident, compute-dominated
FFT_REPS = 2000


def _pin(core):
    """Pin to an absolute core; fall back to no pinning when the
    process's cpuset excludes it (e.g. a bench run under taskset -c
    8-15) — a dead child would otherwise hang the parent's q.get."""
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass


def worker(core, q, reps=REPS):
    _pin(core)
    a = np.arange(WORK_MB * 131072, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    t0 = time.time()
    s = 0.0
    for _ in range(reps):
        np.multiply(a, 1.0000001, out=b)
        s += float(b[-1])
    q.put((time.time() - t0, s))


def fft_worker(core, q, reps=FFT_REPS):
    _pin(core)
    a = np.sin(np.arange(FFT_N, dtype=np.float64))
    t0 = time.time()
    s = 0.0
    for _ in range(reps):
        s += float(np.abs(np.fft.rfft(a)[1]))
    q.put((time.time() - t0, s))


def run(n, reps=REPS, kind="bw"):
    q = mp.Queue()
    target = fft_worker if kind == "fft" else worker
    if kind == "fft" and reps == REPS:
        reps = FFT_REPS
    ps = [mp.Process(target=target, args=(c, q, reps)) for c in range(n)]
    for p in ps:
        p.start()
    walls = [q.get(timeout=300)[0] for _ in ps]  # a dead child must not hang the caller
    for p in ps:
        p.join()
    # aggregate throughput over the SLOWEST worker's measured loop wall
    # (workers time only the inner loop, not fork/allocation/queue
    # overhead, which grows with n and would bias the wide leg low)
    work = n * reps * (WORK_MB if kind == "bw" else 1)
    return work / max(walls)  # MB/s (bw) or kilo-FFTs/s-ish (fft)


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if a != "--flops"]
    kind = "fft" if "--flops" in sys.argv[1:] else "bw"
    lo = int(args[0]) if args else 4
    hi = int(args[1]) if len(args) > 1 else 4 * lo
    best_lo = max(run(lo, kind=kind) for _ in range(3))
    best_hi = max(run(hi, kind=kind) for _ in range(3))
    eff = (best_hi / best_lo) / (hi / lo)
    unit = "MB/s" if kind == "bw" else "fft/s"
    tag = "ceiling_eff" if kind == "bw" else "flops_eff"
    print(
        f"agg{lo}={best_lo:.0f} {unit} agg{hi}={best_hi:.0f} {unit} "
        f"{tag}={eff:.3f}"
    )
