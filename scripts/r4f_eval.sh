#!/bin/bash
# Round-4 part F: full checkpoint re-eval on the rebuilt (sentinel-free)
# caches.  The first eval pass ran against caches carrying the 1e38
# NaN sentinel (NaN frames in every LLPM config + meaningless linear
# metrics); part E rebuilt the caches, so every manifold/lbmc tag is
# re-evaluated here.  Part D's sbmc eval already ran on clean caches
# and is kept.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4f_eval.sh > /tmp/r4f_eval.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

for i in $(seq 1 720); do
  grep -q "PART C DONE" $RC 2>/dev/null && break
  sleep 30
done
grep -q "PART C DONE" $RC || { echo "part-C never finished; abort"; exit 1; }

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

rm -rf experiments/manifold/eval \
       experiments/sample_space/eval/lbmc_s0 \
       experiments/sample_space/eval/lbmc_fmse_s0
stage eval_full 10800 python scripts/eval_experiment_ckpts.py --spps 4,8
echo "PART F DONE $(date)" >> $RC
