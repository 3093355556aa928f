#!/bin/bash
# Round-10 sf1 harvest: run AFTER the generators have exited — serial
# prep, cache warm, parallel trainers, serial pick/report. The sf10
# serving chain (pipeline10 sf10_split..sf10_ft + stage_sf10 + the
# hint report) runs SEPARATELY and FIRST this round, on a quiet box.
#
# Guards (VERDICT r9 ask #4): refuses to start while a generator OR a
# bench/measurement window is active — r9's committed bench was taken
# while this script's trainers ran, poisoning the round's headline.
set -u
cd /root/repo
mkdir -p .data/harvest10

for proc in gen_workload.py bench.py hint_report.py; do
  if pgrep -f "$proc" >/dev/null; then
    echo "[harvest10] $proc running — refusing to start (measurement/generation window)" >&2
    exit 1
  fi
done

python tools/pipeline10.py --only split,seed_cache_sf1,freeze_init \
  > .data/harvest10/prep.log 2>&1 \
  || { echo "[harvest10] prep FAILED (see .data/harvest10/prep.log)"; exit 1; }
echo "[harvest10] prep done at $(date +%H:%M:%S); warming sf1 enc cache"

python tools/pipeline10.py --only warm_cache > .data/harvest10/warm.log 2>&1 \
  || { echo "[harvest10] cache warm FAILED"; exit 1; }
echo "[harvest10] cache warm at $(date +%H:%M:%S); spawning trainers"

pids=""
for ph in ft_gru gru_64x128 gru_rebal; do
  python tools/pipeline10.py --only "$ph" > ".data/harvest10/$ph.log" 2>&1 &
  pid=$!
  pids="$pids $pid"
  echo "[harvest10] spawned $ph (pid $pid)"
done
rc=0
for p in $pids; do wait "$p" || rc=1; done
echo "[harvest10] trainers done at $(date +%H:%M:%S) rc=$rc"

python tools/pipeline10.py --only pick_best,calibration,models_report \
  > .data/harvest10/pick.log 2>&1 \
  || echo "[harvest10] pick/report FAILED (see .data/harvest10/pick.log)"
echo "[harvest10] ALL DONE at $(date +%H:%M:%S)"
