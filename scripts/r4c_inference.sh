#!/bin/bash
# Round-4 part C: inference-throughput probe (VERDICT r3 item 7).
# Waits for the part-B queue to drain (ALL DONE marker), then measures
# the batched full-width-band tiling — the shape regime conv5.py was
# designed for — with and without the fused Pallas conv path.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4c_inference.sh > /tmp/r4c_inference.log 2>&1 < /dev/null &
set -u
cd /root/repo
RC=/tmp/r4_evidence_rc.txt

for i in $(seq 1 720); do
  grep -q "PART D DONE" $RC 2>/dev/null && break
  sleep 30
done
grep -q "PART D DONE" $RC || { echo "part-D never finished; abort"; exit 1; }

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "$name rc=$rc" >> $RC
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc"
}

# batched full-width bands: 6 bands/frame at 256 rows, 78% useful rows
stage inf_bands_xla   2400 python scripts/bench_inference_1080p.py --device --tile_h 256 --bs 3
stage inf_bands_conv5 2400 env WCMC_FUSED_INFERENCE=1 python scripts/bench_inference_1080p.py --device --tile_h 256 --bs 3
# reference point: the 256-px square default
stage inf_sq256       2400 python scripts/bench_inference_1080p.py --device
echo "PART C DONE $(date)" >> $RC
