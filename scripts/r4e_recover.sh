#!/bin/bash
# Round-4 part E: recovery after the corrupt-sample finding.
#
# The disk corpus's offline caches were built with the reference's
# 1e38 NaN sentinel, which poisons the LLPM polynomial channels
# (~5e36 features -> PathNet saturation -> NaN frames) and turned the
# first eval_ckpts + disk_cli attempts red.  Ingestion now zeroes
# non-finite samples (wcmc_tpu/data/preprocess.py::sanitize); this
# script rebuilds every cache, reruns the disk-CLI proof, and
# re-evaluates all checkpoints, then hands off to part D (sbmc) via
# the ALL DONE marker.
#
# Launch:
#   setsid nohup env PYTHONPATH=/root/.axon_site \
#     bash scripts/r4e_recover.sh > /tmp/r4e_recover.log 2>&1 < /dev/null &
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

# --- rebuild the poisoned caches (CPU job) -----------------------------
stage cache_rebuild 5400 env JAX_PLATFORMS=cpu python - <<'PY'
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
from wcmc_tpu.data.dataset import offline_preprocess
ROOT = "/tmp/wcmc_data/r3corpus"
for mode in ("train", "val", "test"):
    offline_preprocess(ROOT, mode=mode, spp=8, test_spps=(4, 8),
                       overwrite=True)
    print("rebuilt", mode, flush=True)
PY

# --- disk-backed CLI training proof, retry (VERDICT item 4) ------------
stage disk_cli 5400 python train_kpcn.py \
  --data_dir /tmp/wcmc_data/r3corpus --desc r4_disk_proof \
  --model_name r4_disk_fmse --use_llpm_buf --manif_learn \
  --manif_loss FMSE --train_branches -b 8 -e 2 -v 1 --visual \
  --save experiments/disk_cli

# full checkpoint re-eval happens in part F (scripts/r4f_eval.sh),
# after the sbmc reruns (part D) and the inference probes (part C),
# so the chip-critical stages land inside the round budget.
echo "ALL DONE $(date)" >> $RC
