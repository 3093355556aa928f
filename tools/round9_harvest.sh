#!/bin/bash
# Round-9 harvest: run AFTER both generators (sf1 gen_r9, sf10 upper
# buckets) have exited — serial prep, parallel cache warms, parallel
# trainers, serial pick/report/stage. Measured phases (sf10 hint
# report, bench) need a quiet box and run interactively afterwards.
set -u
cd /root/repo
mkdir -p .data/harvest9

if pgrep -f gen_workload.py >/dev/null; then
  echo "[harvest9] generator still running — refusing to start" >&2
  exit 1
fi

python tools/pipeline9.py --only split,sf10_split,freeze_init,seed_cache \
  > .data/harvest9/prep.log 2>&1 \
  || { echo "[harvest9] prep FAILED (see .data/harvest9/prep.log)"; exit 1; }
echo "[harvest9] prep done at $(date +%H:%M:%S); warming enc caches"

python tools/pipeline9.py --only warm_cache > .data/harvest9/warm_sf1.log 2>&1 &
w1=$!
python tools/pipeline9.py --only warm_cache_sf10 > .data/harvest9/warm_sf10.log 2>&1 &
w2=$!
wait $w1 || { echo "[harvest9] sf1 cache warm FAILED"; exit 1; }
wait $w2 || echo "[harvest9] sf10 cache warm FAILED (sf10_ft will re-encode)"
echo "[harvest9] caches warm at $(date +%H:%M:%S); spawning trainers"

pids=()
for ph in train9 ft_gru ft_gru_aug gerelt4_ft gru_rebal sf10_ft; do
  python tools/pipeline9.py --only "$ph" > ".data/harvest9/$ph.log" 2>&1 &
  pids+=($!)
  echo "[harvest9] spawned $ph (pid ${pids[-1]})"
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done
echo "[harvest9] trainers done at $(date +%H:%M:%S) rc=$rc"

python tools/pipeline9.py --only pick_best,calibration,models_report \
  > .data/harvest9/pick.log 2>&1 \
  || echo "[harvest9] pick/report FAILED"
python tools/stage_sf10.py > .data/harvest9/sf10.log 2>&1 \
  || echo "[harvest9] stage_sf10 FAILED"
echo "[harvest9] ALL DONE at $(date +%H:%M:%S)"
