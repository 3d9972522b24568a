#!/bin/bash
# Round-4 part D: rerun the SBMC sample-space stages that OOMed
# (pathnet_embed bwd scoped-VMEM stack 17.06M > 16M at Multisteps
# shapes with compute_dx=True; fixed by halving the embed row tile on
# that path — ops/pathnet_fused.py::_embed_geometry), then eval their
# checkpoints.  Waits for the part-B queue to drain.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4d_sbmc.sh > /tmp/r4d_sbmc.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

for i in $(seq 1 720); do
  grep -q "ALL DONE" $RC 2>/dev/null && break
  sleep 30
done
grep -q "ALL DONE" $RC || { echo "part-B never finished; abort"; exit 1; }

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

SS="python scripts/sample_space_experiment.py --seeds 1"
stage ss_sbmc_retry      7200 $SS --configs sbmc
stage ss_sbmc_fmse_retry 7200 $SS --configs sbmc_fmse
stage eval_sbmc          3600 python scripts/eval_experiment_ckpts.py --spps 4,8 --glob sbmc
echo "PART D DONE $(date)" >> $RC
