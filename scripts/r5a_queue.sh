#!/bin/bash
# Round-5 part A: SBMC with the per-pixel-stabilized exp splat, 2 seeds,
# plus LBMC seed 2 (the 3-seed lbmc/lbmc_fmse story, VERDICT r4 item 3).
# Cleanup trap (VERDICT r4 item 4): never exit leaving a chip-holding
# child behind — kill by recorded PID, never by pattern.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
RC=/tmp/r5_rc.txt
: > $RC
CHILD=""
trap '[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null; wait' EXIT

run_stage() {
  local tag="$1"; shift
  echo "[r5a] start $tag $(date +%H:%M:%S)"
  "$@" &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=""
  echo "$tag rc=$rc" >> $RC
  echo "[r5a] done $tag rc=$rc $(date +%H:%M:%S)"
}

run_stage sbmc_exp_2seed python scripts/sample_space_experiment.py \
  --configs sbmc,sbmc_fmse --seeds 2 --epochs 24
run_stage lbmc_seed2 python scripts/sample_space_experiment.py \
  --configs lbmc,lbmc_fmse --seed_base 2 --seeds 1 --epochs 24
echo "[r5a] all done"
