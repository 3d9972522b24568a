#!/bin/bash
# Round-5 part C (after r5b):
#   1. full-frame eval CSVs for the sbmc_fmse_exp checkpoints (r5b's
#      --glob sbmc_exp is a substring match and does not catch them)
#   2. w_manif gradient-parity sweep (VERDICT r5 item 7): FMSE at
#      w_manif {1,10,100} x 2 seeds — at the reference 0.1 the manifold
#      term carries 0.03-0.5% of the PathNet gradient norm
#   3. lbmc_buf control, 3 seeds: LLPM input channels WITHOUT the
#      manifold gradient — separates input-channel effects from
#      FMSE-gradient effects in the LBMC collapse story
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
DEADLINE=${R5C_DEADLINE:-0}

run_stage() {
  local tag="$1"; shift
  if [ "$DEADLINE" -gt 0 ]; then
    local left=$((DEADLINE - $(date +%s)))
    if [ "$left" -lt 120 ]; then
      echo "$tag rc=SKIPPED-deadline" >> $RC
      echo "[r5c] skip $tag (deadline) $(date +%H:%M:%S)"
      return
    fi
    set -- timeout "$left" "$@"
  fi
  echo "[r5c] start $tag $(date +%H:%M:%S)"
  "$@" &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=""
  echo "$tag rc=$rc" >> $RC
  echo "[r5c] done $tag rc=$rc $(date +%H:%M:%S)"
}

# spp 8 ONLY: every committed sample-space eval is spp-8 (cached
# compile); the spp-4 sample-space tile shape stalled r5b's eval
# stage >45 min in remote compile (same pathology family as the
# 512-px KPCN tile). `_exp` catches sbmc_exp_* AND sbmc_fmse_exp_*;
# legacy expr4 tags already have results_8.csv and are skipped.
run_stage eval_exp_ckpts python scripts/eval_experiment_ckpts.py \
  --spps 8 --glob _exp

# lbmc_buf before the w_manif sweep: it is ~6x cheaper (LayerNet
# 24-epoch runs are ~3 min each) and completes the LBMC collapse
# story; the sweep appends per-run so a deadline truncation still
# lands partial results.
run_stage lbmc_buf timeout 7200 python scripts/sample_space_experiment.py \
  --configs lbmc_buf --seeds 3 --epochs 24

run_stage wmanif_sweep timeout 10800 python scripts/manifold_experiment.py \
  --configs fmse_w1,fmse_w10,fmse_w100 --seeds 2

echo "[r5c] all done"
