#!/bin/bash
# Round-4 part G: sample-space program rerun + disk-CLI proof.
#
# Reruns the sample-space program with two fixes over part B/D:
#   * BEST-val checkpoints (the final-epoch snapshots made the
#     full-frame eval measure post-minimum regression — lbmc_fmse best
#     388 vs final 550);
#   * 24 epochs (3,072 steps; epochs cost 3-10 s on the device corpus,
#     and the 8-epoch runs were still descending at their final val);
#   * SBMC at lr 1e-4 (suffix _lr1e4): the reference lr 5e-4 collapses
#     the kernel-softmax head to delta kernels on the toy corpus;
#   * LBMC pair at 2 seeds to put the FMSE separation beyond seed
#     spread.
# Then re-evals all sample-space checkpoints full-frame, and finally
# retries the disk-backed CLI proof after the loader view-pinning fix,
# with an RSS watcher logging to /tmp/disk_cli_rss.log.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4g_queue.sh > /tmp/r4g_queue.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

# fresh curves for the rerun (git keeps the 8-epoch originals; sbmc
# 5e-4 collapse curves stay as committed evidence)
rm -f experiments/sample_space/lbmc_s*.jsonl \
      experiments/sample_space/lbmc_fmse_s*.jsonl \
      experiments/sample_space/lbmc*.ckpt
rm -rf experiments/sample_space/eval

SS="python scripts/sample_space_experiment.py --epochs 24"
stage ss_lbmc_best       7200 $SS --seeds 2 --configs lbmc,lbmc_fmse
stage ss_sbmc_lr1e4      7200 $SS --seeds 1 --lr_dncnn 1e-4 --suffix _lr1e4 --configs sbmc,sbmc_fmse
stage eval_ss            7200 python scripts/eval_experiment_ckpts.py --spps 4,8 --dirs sample_space

# --- disk-backed CLI proof with RSS watcher ----------------------------
rm -rf experiments/disk_cli
( while true; do
    ps -o rss= -C python 2>/dev/null | sort -rn | head -1 | \
      awk -v t="$(date +%H:%M:%S)" '{printf "%s %.1f GB\n", t, $1/1048576}'
    sleep 10
  done ) >> /tmp/disk_cli_rss.log 2>/dev/null &
WATCH=$!
stage disk_cli 5400 python train_kpcn.py \
  --data_dir /tmp/wcmc_data/r3corpus --desc r4_disk_proof \
  --model_name r4_disk_fmse --use_llpm_buf --manif_learn \
  --manif_loss FMSE --train_branches -b 8 -e 2 -v 1 --visual \
  --save experiments/disk_cli
kill $WATCH 2>/dev/null
echo "PART G DONE $(date)" >> $RC
