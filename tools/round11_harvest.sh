#!/bin/bash
# Round-11 harvest — two tracks, each run AFTER its generator exits:
#
#   round11_harvest.sh sf10   # split + warm + fine-tune + stage the
#                             # rebuilt sf10 corpus (verdict r10 ask #1)
#   round11_harvest.sh sf1    # merge grown sf1 corpus, leak-preserving
#                             # split r10->r11, fine-tune + scratch GRU,
#                             # pick best, refresh sf1 calibration
#
# Measured phases (sf10 hint report, BENCH_r11) need a quiet box and
# run interactively afterwards. Every phase ends with a
# persist_artifacts save (round-10 postmortem discipline).
set -u
cd /root/repo || exit 1
H=.data/harvest11
mkdir -p "$H"

if pgrep -f gen_workload.py >/dev/null; then
  echo "[harvest11] generator still running — refusing to start" >&2
  exit 1
fi

step() { echo "[harvest11] $1 at $(date +%H:%M:%S)"; }
save() { python tools/persist_artifacts.py save | tail -1; }

sf10_track() {
  step "sf10: split (fresh — the reset left no prior sf10 split to extend)"
  python tools/split_workload.py .data/gen_sf10_r11 .data/est_sf10_r11 0.15 0.20 5 \
    > "$H/sf10_split.log" 2>&1 || { echo "[harvest11] sf10 split FAILED"; exit 1; }
  save

  step "sf10: warm encode cache"
  DQO_ENCODE_ONLY=1 DQO_AUG=0 \
  DQO_TEST_CSV=/root/repo/.data/est_sf10_r11/test.csv \
  DQO_CALIB_CSV=/root/repo/.data/est_sf10_r11/calib.csv \
  DQO_ENC_CACHE=/root/repo/.data/est_sf10_r11/enc_cache.pkl \
    python tools/train_estimator.py .data/sf10 0 .data/est_sf10_r11 \
    > "$H/sf10_warm.log" 2>&1 || echo "[harvest11] sf10 cache warm FAILED (ft will re-encode)"

  step "sf10: fine-tune GRU from the r10 sf1 winner (frozen init, not the
        mutable est_best — r11 ADVICE: if the sf1 track's pick has already
        run, est_best holds the r11 winner and the provenance is wrong)"
  SF10_FT_SRC=.data/est_r11_init/model_gru.json
  [ -f "$SF10_FT_SRC" ] || SF10_FT_SRC=.data/est_best/model_gru.json
  DQO_EPOCHS=120 DQO_LR=1e-3 DQO_BATCH=32 \
  DQO_ENC_CACHE=/root/repo/.data/est_sf10_r11/enc_cache.pkl \
    python tools/finetune_estimator.py \
    .data/est_sf10_r11/workload.csv "$SF10_FT_SRC" gru \
    .data/ft_sf10_r11 .data/sf10 \
    .data/est_sf10_r11/test.csv .data/est_sf10_r11/calib.csv \
    > "$H/sf10_ft.log" 2>&1 || { echo "[harvest11] sf10 ft FAILED"; tail -5 "$H/sf10_ft.log"; exit 1; }
  tail -2 "$H/sf10_ft.log"
  save

  step "sf10: stage serving dir + calibration (atomic)"
  python tools/stage_sf10.py > "$H/sf10_stage.log" 2>&1 \
    || { echo "[harvest11] stage_sf10 FAILED"; tail -5 "$H/sf10_stage.log"; exit 1; }
  tail -1 "$H/sf10_stage.log"
  save
  step "sf10 track DONE — run the hint report in a quiet window next"
}

sf1_track() {
  step "sf1: merge grown corpus (r10 base + r11 generators)"
  python tools/merge_workloads.py .data/gen_r11 .data/gen_r11_a .data/gen_r11_b \
    > "$H/sf1_merge.log" 2>&1 || { echo "[harvest11] sf1 merge FAILED"; exit 1; }
  tail -2 "$H/sf1_merge.log"
  save

  step "sf1: leak-preserving split est_r10 -> est_r11"
  python tools/pipeline11.py split > "$H/sf1_split.log" 2>&1 \
    || { echo "[harvest11] sf1 split FAILED"; tail -5 "$H/sf1_split.log"; exit 1; }
  tail -3 "$H/sf1_split.log"
  # seed the encode cache from r10's (same schema snapshot)
  [ -f .data/est_r11/enc_cache.pkl ] || cp .data/est_r10/enc_cache.pkl .data/est_r11/enc_cache.pkl 2>/dev/null || true
  save

  export DQO_TEST_CSV=/root/repo/.data/est_r11/test.csv
  export DQO_CALIB_CSV=/root/repo/.data/est_r11/calib.csv
  export DQO_ENC_CACHE=/root/repo/.data/est_r11/enc_cache.pkl
  export DQO_BATCH=64 DQO_EMBED=64 DQO_HIDDEN=64

  step "sf1: fine-tune GRU from the r10 winner on the grown corpus"
  DQO_EPOCHS=80 DQO_LR=5e-4 DQO_BATCH=64 \
    python tools/finetune_estimator.py \
    .data/est_r11/workload.csv .data/est_best/model_gru.json gru \
    .data/ft_r11 .data/sf1 .data/est_r11/test.csv .data/est_r11/calib.csv \
    > "$H/sf1_ft.log" 2>&1 || echo "[harvest11] sf1 ft FAILED"
  tail -2 "$H/sf1_ft.log"

  step "sf1: scratch GRU on the grown corpus (r10's winning recipe)"
  DQO_AUG=0 DQO_EPOCHS=100 \
    python tools/train_parallel.py .data/est_r11 .data/sf1 .data/est_r11_out gru \
    > "$H/sf1_scratch.log" 2>&1 || echo "[harvest11] sf1 scratch FAILED"
  save

  step "sf1: pick best + refresh calibration"
  python tools/pipeline11.py pick > "$H/sf1_pick.log" 2>&1 \
    || { echo "[harvest11] pick FAILED"; tail -5 "$H/sf1_pick.log"; exit 1; }
  tail -3 "$H/sf1_pick.log"
  python tools/calibration_report.py .data/est_best gru \
    reports/estimator_calibration_sf1.json .data/sf1 \
    > "$H/sf1_calib.log" 2>&1 || echo "[harvest11] sf1 calibration FAILED"
  save
  step "sf1 track DONE"
}

case "${1:-}" in
  sf10) sf10_track ;;
  sf1)  sf1_track ;;
  *) echo "usage: $0 {sf10|sf1}"; exit 2 ;;
esac
