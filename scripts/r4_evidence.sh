#!/bin/bash
# Round-4 evidence program (VERDICT r3 items 2-5), designed to run
# fully detached (setsid) so it survives builder-session restarts —
# the failure mode that killed this program in rounds 3 and 4a.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4_evidence.sh > /tmp/r4_evidence.log 2>&1 < /dev/null &
#
# One stage at a time owns the TPU chip.  Each stage is its own python
# invocation (per-config isolation: a crash in one config cannot take
# down the others' runs) with a hard timeout.  Stage results land in
# experiments/ as JSONL + ckpts + summary CSVs; stage return codes in
# /tmp/r4_evidence_rc.txt.
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt
: > $RC

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

MANIF="python scripts/manifold_experiment.py --chunks_per_epoch 16"

# --- Stage 1: manifold separation, full scale (VERDICT item 2) -------
# 40 scenes x 256px, ksize 21, spp 8, batch 8, 5120 steps + 1024 ft.
stage manifold_vanilla 5400 $MANIF --seeds 2 --configs vanilla
stage manifold_fmse    5400 $MANIF --seeds 2 --configs fmse
stage manifold_grs     5400 $MANIF --seeds 2 --configs grs

# --- Stage 2: ablation surface (VERDICT item 5) ----------------------
stage ablate_m10r01    4200 $MANIF --seeds 1 --configs m10r01
stage ablate_kpcn_ref  4200 $MANIF --seeds 1 --configs kpcn_ref
stage ablate_kpcn_pre  4200 $MANIF --seeds 1 --configs kpcn_pre

# --- Stage 3: sample-space program (VERDICT item 3) -------------------
SS="python scripts/sample_space_experiment.py --seeds 1"
stage ss_sbmc       7200 $SS --configs sbmc
stage ss_sbmc_fmse  7200 $SS --configs sbmc_fmse
stage ss_lbmc       5400 $SS --configs lbmc
stage ss_lbmc_fmse  5400 $SS --configs lbmc_fmse

# --- Stage 4: checkpoint eval sweep (needs the disk corpus) ----------
# the corpus finisher (make_disk_corpus.py, CPU job) touches .ready
for i in $(seq 1 240); do
  [ -f /tmp/wcmc_data/r3corpus/.ready ] && break
  sleep 30
done
if [ -f /tmp/wcmc_data/r3corpus/.ready ]; then
  stage eval_ckpts 7200 python scripts/eval_experiment_ckpts.py --spps 4,8
  # --- Stage 5: disk-backed CLI training proof (VERDICT item 4) ------
  stage disk_cli 5400 python train_kpcn.py \
    --data_dir /tmp/wcmc_data/r3corpus --desc r4_disk_proof \
    --model_name r4_disk_fmse --use_llpm_buf --manif_learn \
    --manif_loss FMSE --train_branches -b 8 -e 2 -v 1 --visual \
    --save experiments/disk_cli
else
  echo "corpus_wait rc=124" >> $RC
fi

# --- Final: capture a bench preview while the chip is free -----------
stage bench 2400 python bench.py
echo "ALL DONE $(date)" >> $RC
