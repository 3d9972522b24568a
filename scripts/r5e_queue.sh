#!/bin/bash
# Round-5 continuation chip queue (session 2).
#
# Order (single chip — strictly serialized):
#   A. inference geometry probes (open item 2: 416 -> <=300 ms/frame):
#      batch growth past 8 at the 256-px sweet spot, and modest-aspect
#      rectangles (256x512) that cut halo redundancy 61% -> 70% useful
#      pixels without entering the wide-band conv pathology (957 ms at
#      full-width bands, retired in r5).
#   B. manifold w_manif sweep holes: fmse_w100 seed 1 (never ran,
#      r5 deadline) + fmse_w10 seed 1 (truncated at epoch 7).
#
# Every stage appends "<tag> rc=<rc>" to /tmp/r5e_rc.txt. Deadline
# guard: no new stage starts after DEADLINE_UTC (chip must be free for
# the driver's end-of-round bench). EXIT trap kills the running child.
set -u
export PYTHONPATH="/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
cd /root/repo
LEDGER=/tmp/r5e_rc.txt
DEADLINE_UTC="${DEADLINE_UTC:-15:30}"
: > "$LEDGER"

CHILD=0
trap '[ "$CHILD" != 0 ] && kill "$CHILD" 2>/dev/null; wait 2>/dev/null' EXIT

past_deadline() {
  [ "$(date -u +%H%M)" -ge "$(echo "$DEADLINE_UTC" | tr -d :)" ]
}

run_stage() { # tag timeout_s cmd...
  local tag="$1" tmo="$2"; shift 2
  if past_deadline; then
    echo "$tag SKIPPED (past $DEADLINE_UTC UTC)" >> "$LEDGER"
    return 1
  fi
  echo "=== $tag ($(date -u +%H:%M)) ===" >> /tmp/r5e.log
  timeout "$tmo" "$@" >> /tmp/r5e.log 2>&1 &
  CHILD=$!
  wait "$CHILD"; local rc=$?
  CHILD=0
  echo "$tag rc=$rc" >> "$LEDGER"
  return 0
}

# wait for any running bench to release the chip (detect only — never
# pattern-kill; see CLAUDE.md)
while ps aux | grep -q "[b]ench\.py"; do
  sleep 30
done

B=scripts/bench_inference_1080p.py
run_stage inf_256_bs16    1800 python "$B" --device --tile 256 --bs 16
run_stage inf_256_bs32    1800 python "$B" --device --tile 256 --bs 32
run_stage inf_256x512_bs8 1800 python "$B" --device --tile_hw 256 512 --bs 8
run_stage inf_192x512_bs8 1800 python "$B" --device --tile_hw 192 512 --bs 8

run_stage manif_w_seed1 10800 python scripts/manifold_experiment.py \
  --configs fmse_w10,fmse_w100 --seeds 2 --seed_start 1

echo "queue done $(date -u +%H:%M)" >> "$LEDGER"
