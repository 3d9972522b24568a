#!/bin/bash
# Round-4 part H: post-evidence chip work.
#
# Chains after part G (waits for its DONE marker):
#   1. bench.py — confirm the driver perf artifact is green and get the
#      current step time on record.
#   2. SBMC rerun with the exp splat weighting (models/sbmc.py): the
#      per-sample softmax pinned every sample's kernel mass to 1, which
#      forbids outlier rejection and collapsed to identity at every lr
#      tried (experiments/sample_space/README.md).  exp restores the
#      upstream KernelWeighting semantics.  Reference lr 5e-4 first
#      (the reference recipe), lr 1e-4 as the backup.
#   3. Full-frame eval of the new checkpoints.
#   4. Inference probes at square tiles with the fused conv5 path
#      (the band probe never engaged the kernel — VMEM fallback at
#      W=1984; at 256/320 square the dy-packed K=500 GEMM applies).
#   5. Fresh per-family profile for the glue harvest.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4h_queue.sh > /tmp/r4h_queue.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

for i in $(seq 1 960); do
  grep -q "PART G DONE" $RC 2>/dev/null && break
  sleep 30
done
grep -q "PART G DONE" $RC || { echo "part-G never finished; abort"; exit 1; }

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

stage bench           3600 python bench.py
SS="python scripts/sample_space_experiment.py --epochs 24"
stage ss_sbmc_exp     7200 $SS --seeds 1 --suffix _exp --configs sbmc,sbmc_fmse
stage ss_sbmc_exp1e4  7200 $SS --seeds 1 --lr_dncnn 1e-4 --suffix _exp1e4 --configs sbmc
stage eval_ss_exp     5400 python scripts/eval_experiment_ckpts.py --spps 4,8 --dirs sample_space
stage inf_sq256_conv5 2400 env WCMC_FUSED_INFERENCE=1 python scripts/bench_inference_1080p.py --device
stage inf_sq320_xla   2400 python scripts/bench_inference_1080p.py --device --tile 320 --bs 6
stage inf_sq320_conv5 2400 env WCMC_FUSED_INFERENCE=1 python scripts/bench_inference_1080p.py --device --tile 320 --bs 6
stage profile_fam     3600 python scripts/profile_families.py
echo "PART H DONE $(date)" >> $RC
