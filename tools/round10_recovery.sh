#!/bin/bash
# Round-10 from-scratch results chain — runs AFTER the reset-recovery
# generators (tools/gen_workload.py into .data/gen_r10_{a,b}) exit.
#
# Unlike round10_harvest.sh (written pre-reset, warm-start shaped),
# nothing here assumes r9 state: the split is cut fresh with
# stratified per-bucket test floors, every model trains from scratch,
# and each phase ends with a persist_artifacts save so a mid-chain
# crash (or another box reset) costs one phase, not the round.
set -u
cd /root/repo || exit 1
H=.data/harvest10
mkdir -p "$H"

for proc in gen_workload.py bench.py; do
  if pgrep -f "$proc" >/dev/null; then
    echo "[recovery10] $proc running — refusing to start (measurement/generation window)" >&2
    exit 1
  fi
done

step() { echo "[recovery10] $1 at $(date +%H:%M:%S)"; }

step "merge generator corpora"
python tools/merge_workloads.py .data/gen_r10 .data/gen_r10_a .data/gen_r10_b \
  > "$H/merge.log" 2>&1 || { echo "[recovery10] merge FAILED"; exit 1; }
python tools/persist_artifacts.py save >/dev/null

step "fresh stratified split (test floor 8/bucket)"
python tools/split_workload.py .data/gen_r10 .data/est_r10 0.15 0.05 8 \
  > "$H/split.log" 2>&1 || { echo "[recovery10] split FAILED"; exit 1; }
python tools/persist_artifacts.py save >/dev/null

export DQO_TEST_CSV=/root/repo/.data/est_r10/test.csv
export DQO_CALIB_CSV=/root/repo/.data/est_r10/calib.csv
export DQO_ENC_CACHE=/root/repo/.data/est_r10/enc_cache.pkl
export DQO_BATCH=64 DQO_EMBED=64 DQO_HIDDEN=64

step "warm encoding cache (augmented, encode-only)"
DQO_ENCODE_ONLY=1 DQO_AUG=2 python tools/train_estimator.py .data/sf1 0 .data/est_r10 \
  > "$H/warm.log" 2>&1 || { echo "[recovery10] cache warm FAILED"; exit 1; }

step "tournament (parallel families, from scratch)"
# gerelt4's 8 GRU directions dominate wall-clock — cap its epochs
DQO_EPOCHS=100 DQO_AUG=2 DQO_EPOCHS_GERELT4=60 DQO_EPOCHS_TREELSTM=80 \
  python tools/train_parallel.py .data/est_r10 .data/sf1 .data/est_r10_out \
  linear,mlp,gru,cnn,treelstm,gerelt4,mscn,neo \
  > "$H/tournament.log" 2>&1 || echo "[recovery10] some families FAILED (see log)"
python tools/persist_artifacts.py save >/dev/null

step "capacity point gru 64x128 + rebalanced sampler"
mkdir -p .data/est_r10_sweep/gru_64x128 .data/est_r10_sweep/gru_64x64rebal
for d in gru_64x128 gru_64x64rebal; do
  cp -n .data/est_r10/workload.csv .data/est_r10/schema.json ".data/est_r10_sweep/$d/" 2>/dev/null || true
done
DQO_FAMILIES=gru DQO_AUG=0 DQO_EMBED=64 DQO_HIDDEN=128 DQO_EPOCHS=100 \
  OMP_NUM_THREADS=8 OPENBLAS_NUM_THREADS=8 \
  python tools/train_estimator.py .data/sf1 0 .data/est_r10_sweep/gru_64x128 \
  > "$H/gru_64x128.log" 2>&1 &
P1=$!
DQO_FAMILIES=gru DQO_AUG=2 DQO_REBALANCE=200:400 DQO_EPOCHS=40 \
  OMP_NUM_THREADS=8 OPENBLAS_NUM_THREADS=8 \
  python tools/train_estimator.py .data/sf1 0 .data/est_r10_sweep/gru_64x64rebal \
  > "$H/gru_rebal.log" 2>&1 &
P2=$!
wait $P1 || echo "[recovery10] gru_64x128 FAILED"
wait $P2 || echo "[recovery10] gru_rebal FAILED"
python tools/persist_artifacts.py save >/dev/null

step "pick best -> .data/est_best"
DQO_SWEEP_DIRS=.data/est_r10_sweep \
  python tools/pick_best_model.py .data/est_r10_out /nonexistent .data/est_best \
  .data/est_r10/schema.json .data/est_r10/test.csv gru,treelstm,gerelt4,cnn \
  > "$H/pick.log" 2>&1 || { echo "[recovery10] pick_best FAILED"; exit 1; }

step "calibration report"
FAMILY=$(python -c "import json;print(json.load(open('.data/est_best/choice.json'))['family'])")
python tools/calibration_report.py .data/est_best "$FAMILY" \
  reports/estimator_calibration_sf1.json .data/sf1 \
  > "$H/calibration.log" 2>&1 || echo "[recovery10] calibration FAILED"
python tools/persist_artifacts.py save >/dev/null

step "ALL DONE"
