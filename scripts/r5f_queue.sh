#!/bin/bash
# Tall-tile inference probes (fewer row-halos at W=256, the emitter's
# comfort zone) + the inference val-step profile.
set -u
export PYTHONPATH="/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
cd /root/repo
LEDGER=/tmp/r5f_rc.txt
: > "$LEDGER"
CHILD=0
trap '[ "$CHILD" != 0 ] && kill "$CHILD" 2>/dev/null; wait 2>/dev/null' EXIT

run_stage() {
  local tag="$1" tmo="$2"; shift 2
  echo "=== $tag ($(date -u +%H:%M)) ===" >> /tmp/r5f.log
  timeout "$tmo" "$@" >> /tmp/r5f.log 2>&1 &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=0
  echo "$tag rc=$rc" >> "$LEDGER"
}

B=scripts/bench_inference_1080p.py
run_stage inf_328x256_bs8 1800 python "$B" --device --tile_hw 328 256 --bs 8
run_stage inf_416x256_bs6 1800 python "$B" --device --tile_hw 416 256 --bs 6
run_stage prof_inference  1800 python scripts/profile_inference.py 256 256 8
echo "queue done $(date -u +%H:%M)" >> "$LEDGER"
