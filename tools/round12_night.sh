#!/bin/bash
# Round-12 detached generation orchestrator. Chains the night's three
# remaining sf10/sf1 label-harvest windows with an artifact bank after
# each, so the sequence survives the driver session dying mid-window
# (which killed two sessions earlier this round). Launch ONCE, detached:
#
#   setsid nohup tools/round12_night.sh > .data/night12.log 2>&1 &
#
# Sequence (each window refuses to start if a generator is running, so
# the orchestrator simply waits for the previous one to drain):
#   1. wait for the live window-2 mid-band generator to finish; bank
#   2. ceil-band 7-8 @ 520 s cap, 3300 s — fills estimator round-bucket
#      7 ([90.5, 181) s: 1 corpus row) and un-censors overshoots; bank
#   3. bucket-8-only @ 520 s cap, 2700 s — r11 verdict ask #4
#      ([330, 512) tail); bank
#   4. sf1 dual-generator band 3-7, 3600 s — r11 verdict asks #3/#6; bank
# Training/staging/hint-report phases are interactive (round12_harvest.sh)
# and NOT chained here: they need the corpus assessment in between.
# An optional phase argument resumes the chain mid-sequence (used when
# the band-7/8 window was restarted to pick up the seed-hygiene fix):
#   round12_night.sh [all|b78|b8|sf1]
set -u
cd /root/repo || exit 1
PHASE=${1:-all}

log() { echo "[night12 $(date +%H:%M:%S)] $*"; }
drain() {
  while pgrep -f gen_workload.py >/dev/null; do sleep 30; done
}
bank() {
  python tools/persist_artifacts.py save 2>&1 | tail -1
}

if [ "$PHASE" = all ]; then
  log "waiting for the live mid-band window to finish"
  drain
  bank
  log "window 2 drained and banked"
fi

if [ "$PHASE" = all ] || [ "$PHASE" = b78 ]; then
  log "starting ceil-band 7-8 window (520s cap, 2700s)"
  bash tools/round12_gen_sf10_b8.sh 2700 7 8
  drain
  bank
  log "band 7-8 window done"
fi

if [ "$PHASE" != sf1 ]; then
  log "starting bucket-8 un-censor window (520s cap, 2400s)"
  bash tools/round12_gen_sf10_b8.sh 2400 8 8
  drain
  bank
  log "bucket-8 window done"
fi

log "starting sf1 dual-generator window (3600s)"
bash tools/round12_gen_sf1.sh 3600
sleep 60   # let both generators come up before polling
drain
bank
log "sf1 window done — generation complete; run round12_harvest.sh next"
touch .data/night12.done
