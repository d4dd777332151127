#!/bin/bash
# Wait for a quiet host window (Spark-free bandwidth probe scales >= MIN_EFF
# from 8 to 32 pinned cores), then run the per-path scaling bench.
# The probe IS the gate: per BENCH.md, scaling numbers taken while the
# host's own memory bandwidth doesn't scale are phantoms.
MIN_EFF="${MIN_EFF:-0.70}"
MAX_WAIT_S="${MAX_WAIT_S:-14400}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
start=$(date +%s)
while true; do
  out=$(timeout 300 python3 "$REPO/tools/ceiling_bench.py" 8 32 2>/dev/null | tail -1)
  eff=$(echo "$out" | grep -o 'ceiling_eff=[0-9.]*' | cut -d= -f2)
  echo "$(date -u +%H:%M:%S) probe: $out"
  agg_lo=$(echo "$out" | grep -o 'agg8=[0-9]*' | cut -d= -f2)
  # reject degenerate probes: a co-running job suppressing the 8-core
  # leg fakes a high eff (observed: agg8=6103 -> eff=1.178); a sane
  # idle agg8 on this VM is ~15-40 GB/s
  if [ -n "$eff" ] && [ -n "$agg_lo" ] \
     && awk "BEGIN{exit !($eff >= $MIN_EFF && $eff <= 1.05 && $agg_lo >= 15000)}"; then
    echo "quiet window found (eff=$eff) - launching per-path scaling bench"
    python3 "$REPO/tools/path_scaling_bench.py" 8 3
    exit $?
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT_S" ]; then
    echo "no quiet window within ${MAX_WAIT_S}s - giving up"
    exit 2
  fi
  sleep 420
done
