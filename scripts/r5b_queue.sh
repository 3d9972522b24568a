#!/bin/bash
# Round-5 part B: after the sample-space runs —
#   1. full-frame eval CSVs for the new sbmc_exp checkpoints
#   2. disk-CLI loader-sustain proof: train_kpcn.py on the 33 GB
#      corpus, 2 epochs, with per-step time dumps + RSS watch
#      (VERDICT r5 item 2: step within 2x of 53 ms, RSS < 16 GB)
# Cleanup trap: never exit leaving a chip-holding child behind.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
RC=/tmp/r5_rc.txt
CHILD=""
trap '[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null; wait' EXIT

run_stage() {
  local tag="$1"; shift
  echo "[r5b] start $tag $(date +%H:%M:%S)"
  "$@" &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=""
  echo "$tag rc=$rc" >> $RC
  echo "[r5b] done $tag rc=$rc $(date +%H:%M:%S)"
}

run_stage eval_sbmc_exp python scripts/eval_experiment_ckpts.py \
  --spps 4,8 --glob sbmc_exp

( while true; do
    ps -o rss= -C python 2>/dev/null | sort -rn | head -1 | \
      awk -v t="$(date +%H:%M:%S)" '{printf "%s %.1f GB\n", t, $1/1048576}'
    sleep 15
  done ) >> /tmp/r5_disk_rss.log 2>/dev/null &
WATCH=$!
rm -rf experiments/disk_cli/logs/r5_disk_fmse
run_stage disk_cli timeout 7200 python train_kpcn.py \
  --data_dir /tmp/wcmc_data/r3corpus --desc r5_disk_proof \
  --model_name r5_disk_fmse --use_llpm_buf --manif_learn \
  --manif_loss FMSE --train_branches -b 8 -e 2 -v 1 --visual \
  --serve_bf16 --save experiments/disk_cli
kill $WATCH 2>/dev/null
run_stage step_hist python scripts/step_time_hist.py \
  experiments/disk_cli/logs/r5_disk_fmse --device_ms 53.3
echo "[r5b] all done"
