#!/bin/bash
# Round-5 part D (after r5c, final chip window of the round):
#   1. batched-band inference probe (the one untried 1080p lever —
#      r4 measured batch-1 full-width bands pathological at ~10 TF/s;
#      this asks whether batch=3 bands recover conv throughput:
#      6 bands/frame at 78% useful rows vs 61% useful pixels for the
#      256-px-square incumbent)
#   2. bench.py pre-confirmation so the driver's end-of-round bench
#      finds a warm cache and a free chip (VERDICT r5 item 4)
# Cleanup trap: never exit leaving a chip-holding child behind.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
RC=/tmp/r5_rc.txt
CHILD=""
trap '[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null; wait' EXIT

# Hard deadline (epoch seconds): no stage STARTS after this, and any
# in-flight stage is truncated to the time remaining, so the chip is
# guaranteed free for the driver's end-of-round bench.
DEADLINE=${R5D_DEADLINE:-0}

run_stage() {
  local tag="$1"; shift
  if [ "$DEADLINE" -gt 0 ]; then
    local left=$((DEADLINE - $(date +%s)))
    if [ "$left" -lt 120 ]; then
      echo "$tag rc=SKIPPED-deadline" >> $RC
      echo "[r5d] skip $tag (deadline) $(date +%H:%M:%S)"
      return
    fi
    set -- timeout "$left" "$@"
  fi
  echo "[r5d] start $tag $(date +%H:%M:%S)"
  "$@" &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=""
  echo "$tag rc=$rc" >> $RC
  echo "[r5d] done $tag rc=$rc $(date +%H:%M:%S)"
}

run_stage inf_bands_bs3 timeout 1200 \
  python scripts/bench_inference_1080p.py --device --tile_h 256 --bs 3

run_stage bench_preconfirm timeout 900 python bench.py

echo "[r5d] all done"
