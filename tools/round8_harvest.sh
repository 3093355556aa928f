#!/bin/bash
# Round-8 harvest: waits for the corpus generator to exit, then runs
# the training pipeline — serial prep, concurrent training phases,
# serial pick/report — and stages the sf10 serving dir.
# Measured phases (hint report at sf10, bench) are NOT here: they need
# a quiet box and run interactively after the trainers.
set -u
cd /root/repo

echo "[harvest] waiting for gen_workload.py to exit..."
while pgrep -f gen_workload.py >/dev/null; do sleep 30; done
echo "[harvest] generator gone at $(date +%H:%M:%S); final corpus:"
python - <<'EOF'
import sys
sys.path.insert(0, '.')
from collections import Counter
from deep_query_optimization_spark.estimator import QueriesDataset
ds = QueriesDataset.load('.data/gen_r8/workload.csv')
print(len(ds.rows), dict(sorted(Counter(ds.buckets()).items())))
EOF

mkdir -p .data/harvest
python tools/pipeline8.py --only split,seed_cache,warm_cache > .data/harvest/prep.log 2>&1 \
  || { echo "[harvest] prep FAILED (see .data/harvest/prep.log)"; exit 1; }
echo "[harvest] prep done at $(date +%H:%M:%S); spawning trainers"

pids=()
for ph in train8 ft_gru ft_gru_aug gerelt4_aug gru_64x128 gru_rebal joint; do
  python tools/pipeline8.py --only "$ph" > ".data/harvest/$ph.log" 2>&1 &
  pids+=($!)
  echo "[harvest] spawned $ph (pid ${pids[-1]})"
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done
echo "[harvest] trainers done at $(date +%H:%M:%S) rc=$rc"

python tools/pipeline8.py --only pick_best,calibration,models_report > .data/harvest/pick.log 2>&1 \
  || echo "[harvest] pick/report FAILED"
python tools/stage_sf10.py > .data/harvest/sf10.log 2>&1 \
  || echo "[harvest] stage_sf10 FAILED"
echo "[harvest] ALL DONE at $(date +%H:%M:%S)"
