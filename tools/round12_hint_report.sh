#!/bin/bash
# Round-12 sf10 hint report — same protocol and query band as r11
# (reports/learned_hints_sf10_slow_r11.json: the six curated 27-87 s
# multi-join corpus queries in .data/hint_band_sf10.csv, per-bucket
# margins from the staged calibration, interleaved-median timing).
# The r11 gate abstained on 4 of the 6 (~259 s of a 332 s suite) purely
# for missing mid-band calibration rows; this re-run is the measured
# "done" check for r11 verdict ask #1 after the mid-band harvest.
#
# Needs a QUIET box (hint_report holds the sentinel itself, but don't
# run it while generators/trainers own the machine).
set -u
cd /root/repo || exit 1

if pgrep -f "gen_workload.py|train_estimator.py|train_parallel.py|finetune_estimator.py" >/dev/null; then
  echo "[hint-r12] generators/trainers running — timings would be contention, refusing" >&2
  exit 1
fi

DQO_HINT_FROM_CSV=.data/hint_band_sf10.csv:20 \
DQO_HINT_CALIB=.data/est_sf10_best/calibration.json \
DQO_TIMEOUT_S=200 \
  python tools/hint_report.py .data/sf10 .data/est_sf10_best gru 6 \
  reports/learned_hints_sf10_slow_r12.json
