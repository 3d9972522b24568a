#!/bin/bash
# Round-4 evidence queue, part B (the stages NOT yet run).
#
# Part A of the program already ran / is running:
#   - manifold vanilla x2 seeds: committed (experiments/manifold/)
#   - manifold fmse+grs x2 seeds: running as a single detached process
#     (launched 08:51; shares one staged corpus across both configs).
# This script waits for that process to exit, then drains the rest of
# the chip queue one stage at a time.  Fully detached (setsid) so it
# survives builder-session restarts — the failure mode that killed the
# program in rounds 3 and 4a.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4b_queue.sh <fmse_grs_pid> \
#     > /tmp/r4b_queue.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== waiting for fmse+grs run (pid $WAIT_PID) to free the chip"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== [$(date +%H:%M:%S)] chip free"
fi

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

MANIF="python scripts/manifold_experiment.py --chunks_per_epoch 16"

# --- fmse+grs at the vanilla step budget -------------------------------
# The first round-4 fmse/grs launch used the default chunks_per_epoch 8
# (2,560 steps) while the committed vanilla baseline ran 16 (5,120
# steps); those runs moved to experiments/manifold/r4_chunks8/.  This
# is the like-for-like rerun.
stage manifold_fmse_grs 9000 $MANIF --seeds 2 --configs fmse,grs

# --- vanilla ckpt regen ------------------------------------------------
# The part-A vanilla run's curves + summary rows are committed, but its
# checkpoints (gitignored) did not survive the container restart; the
# eval sweep needs them.  Deterministic corpus (seed 7) + per-seed
# patch keys make this a like-for-like regen; summary.csv gains two
# duplicate-config rows, annotated in the experiment README.
stage manifold_vanilla_ckpts 5400 $MANIF --seeds 2 --configs vanilla

# --- ablation surface (VERDICT item 5) --------------------------------
stage ablate_m10r01    4200 $MANIF --seeds 1 --configs m10r01
stage ablate_kpcn_ref  4200 $MANIF --seeds 1 --configs kpcn_ref
stage ablate_kpcn_pre  4200 $MANIF --seeds 1 --configs kpcn_pre

# --- sample-space program (VERDICT item 3) -----------------------------
SS="python scripts/sample_space_experiment.py --seeds 1"
stage ss_sbmc       7200 $SS --configs sbmc
stage ss_sbmc_fmse  7200 $SS --configs sbmc_fmse
stage ss_lbmc       5400 $SS --configs lbmc
stage ss_lbmc_fmse  5400 $SS --configs lbmc_fmse

# --- checkpoint eval sweep (needs the disk corpus test set) -----------
for i in $(seq 1 240); do
  [ -f /tmp/wcmc_data/r3corpus/.ready ] && break
  sleep 30
done
if [ -f /tmp/wcmc_data/r3corpus/.ready ]; then
  stage eval_ckpts 7200 python scripts/eval_experiment_ckpts.py --spps 4,8
  # --- disk-backed CLI training proof (VERDICT item 4) ----------------
  stage disk_cli 5400 python train_kpcn.py \
    --data_dir /tmp/wcmc_data/r3corpus --desc r4_disk_proof \
    --model_name r4_disk_fmse --use_llpm_buf --manif_learn \
    --manif_loss FMSE --train_branches -b 8 -e 2 -v 1 --visual \
    --save experiments/disk_cli
else
  echo "corpus_wait rc=124" >> $RC
fi

# --- capture a bench preview while the chip is free --------------------
stage bench 2400 python bench.py
echo "ALL DONE $(date)" >> $RC
