#!/bin/bash
# Round-12 harvest — two tracks, each run AFTER its generator exits:
#
#   round12_harvest.sh sf10   # split (bigger disjoint calib carve) +
#                             # warm + TWO fine-tunes (from the r11 sf10
#                             # winner AND from the frozen sf1 winner) +
#                             # stage with selection-disjoint margins
#                             # (r11 verdict asks #1-2)
#   round12_harvest.sh sf1    # merge grown sf1 corpus, leak-preserving
#                             # split r11->r12, fine-tune + scratch GRU,
#                             # pick best, refresh sf1 calibration
#
# Both tracks fine-tune from FROZEN init checkpoints (r11 ADVICE:
# est_best mutates when the sf1 pick runs, so sourcing it makes the
# result depend on track ordering). `freeze` runs first in either
# track and is idempotent.
#
# Measured phases (sf10 hint report, BENCH) need a quiet box and run
# interactively afterwards. Every phase ends with a
# persist_artifacts save (round-10 postmortem discipline).
set -u
cd /root/repo || exit 1
H=.data/harvest12
mkdir -p "$H"

if pgrep -f gen_workload.py >/dev/null; then
  echo "[harvest12] generator still running — refusing to start" >&2
  exit 1
fi

step() { echo "[harvest12] $1 at $(date +%H:%M:%S)"; }
save() { python tools/persist_artifacts.py save | tail -1; }

freeze() {
  # sf1 winner (r11) -> est_r12_init; sf10 winner (r11) -> est_sf10_r12_init
  python tools/pipeline12.py freeze
  mkdir -p .data/est_sf10_r12_init
  for f in model_gru.json choice.json schema.json; do
    [ -f ".data/est_sf10_r12_init/$f" ] || cp ".data/est_sf10_best/$f" ".data/est_sf10_r12_init/$f" 2>/dev/null || true
  done
  echo "[harvest12] frozen inits: est_r12_init (sf1), est_sf10_r12_init (sf10)"
}

sf10_track() {
  freeze
  step "sf10: split gen_sf10_r12 (calib 0.30 with a 5-row/bucket floor —
        the disjoint margin carve needs n>=5 per mid-band bucket, r11
        verdict ask #2; the floor is half-capped so scarce buckets keep
        a training majority)"
  python tools/split_workload.py .data/gen_sf10_r12 .data/est_sf10_r12 0.15 0.30 5 5 \
    > "$H/sf10_split.log" 2>&1 || { echo "[harvest12] sf10 split FAILED"; exit 1; }
  tail -1 "$H/sf10_split.log"
  save

  step "sf10: warm encode cache"
  DQO_ENCODE_ONLY=1 DQO_AUG=0 \
  DQO_TEST_CSV=/root/repo/.data/est_sf10_r12/test.csv \
  DQO_CALIB_CSV=/root/repo/.data/est_sf10_r12/calib.csv \
  DQO_ENC_CACHE=/root/repo/.data/est_sf10_r12/enc_cache.pkl \
    python tools/train_estimator.py .data/sf10 0 .data/est_sf10_r12 \
    > "$H/sf10_warm.log" 2>&1 || echo "[harvest12] sf10 cache warm FAILED (ft will re-encode)"

  step "sf10: fine-tune A — continue the r11 sf10 winner on the grown corpus"
  DQO_EPOCHS=120 DQO_LR=1e-3 DQO_BATCH=32 \
  DQO_ENC_CACHE=/root/repo/.data/est_sf10_r12/enc_cache.pkl \
    python tools/finetune_estimator.py \
    .data/est_sf10_r12/workload.csv .data/est_sf10_r12_init/model_gru.json gru \
    .data/ft_sf10_r12 .data/sf10 \
    .data/est_sf10_r12/test.csv .data/est_sf10_r12/calib.csv \
    > "$H/sf10_ft.log" 2>&1 || { echo "[harvest12] sf10 ft A FAILED"; tail -5 "$H/sf10_ft.log"; exit 1; }
  tail -2 "$H/sf10_ft.log"
  save

  step "sf10: fine-tune B — re-adapt the frozen sf1 winner (r11's recipe)"
  DQO_EPOCHS=120 DQO_LR=1e-3 DQO_BATCH=32 \
  DQO_ENC_CACHE=/root/repo/.data/est_sf10_r12/enc_cache.pkl \
    python tools/finetune_estimator.py \
    .data/est_sf10_r12/workload.csv .data/est_r12_init/model_gru.json gru \
    .data/ft_sf10_r12_sf1src .data/sf10 \
    .data/est_sf10_r12/test.csv .data/est_sf10_r12/calib.csv \
    > "$H/sf10_ft_b.log" 2>&1 || echo "[harvest12] sf10 ft B FAILED (A alone can stage)"
  tail -2 "$H/sf10_ft_b.log"
  save

  step "sf10: stage serving dir + disjoint-margin calibration (atomic)"
  python tools/stage_sf10.py > "$H/sf10_stage.log" 2>&1 \
    || { echo "[harvest12] stage_sf10 FAILED"; tail -5 "$H/sf10_stage.log"; exit 1; }
  tail -1 "$H/sf10_stage.log"
  python - <<'EOF'
import json
c = json.load(open(".data/est_sf10_best/choice.json"))
print(f"[harvest12] staged {c['label']} acc={c['accuracy']} "
      f"disjoint_margins={c['calibration_disjoint_from_selection']}")
EOF
  save
  step "sf10 track DONE — run the hint report in a quiet window next"
}

sf1_track() {
  freeze
  step "sf1: merge grown corpus (r11 base + r12 generators)"
  python tools/merge_workloads.py .data/gen_r12 .data/gen_r11 .data/gen_r12_a .data/gen_r12_b \
    > "$H/sf1_merge.log" 2>&1 || { echo "[harvest12] sf1 merge FAILED"; exit 1; }
  tail -2 "$H/sf1_merge.log"
  save

  step "sf1: leak-preserving split est_r11 -> est_r12"
  python tools/pipeline12.py split > "$H/sf1_split.log" 2>&1 \
    || { echo "[harvest12] sf1 split FAILED"; tail -5 "$H/sf1_split.log"; exit 1; }
  tail -3 "$H/sf1_split.log"
  # seed the encode cache from r11's (same schema snapshot)
  [ -f .data/est_r12/enc_cache.pkl ] || cp .data/est_r11/enc_cache.pkl .data/est_r12/enc_cache.pkl 2>/dev/null || true
  save

  export DQO_TEST_CSV=/root/repo/.data/est_r12/test.csv
  export DQO_CALIB_CSV=/root/repo/.data/est_r12/calib.csv
  export DQO_ENC_CACHE=/root/repo/.data/est_r12/enc_cache.pkl
  export DQO_BATCH=64 DQO_EMBED=64 DQO_HIDDEN=64

  step "sf1: fine-tune GRU from the frozen r11 winner on the grown corpus"
  DQO_EPOCHS=80 DQO_LR=5e-4 DQO_BATCH=64 \
    python tools/finetune_estimator.py \
    .data/est_r12/workload.csv .data/est_r12_init/model_gru.json gru \
    .data/ft_r12 .data/sf1 .data/est_r12/test.csv .data/est_r12/calib.csv \
    > "$H/sf1_ft.log" 2>&1 || echo "[harvest12] sf1 ft FAILED"
  tail -2 "$H/sf1_ft.log"

  step "sf1: scratch GRU on the grown corpus"
  DQO_AUG=0 DQO_EPOCHS=100 \
    python tools/train_parallel.py .data/est_r12 .data/sf1 .data/est_r12_out gru \
    > "$H/sf1_scratch.log" 2>&1 || echo "[harvest12] sf1 scratch FAILED"
  save

  step "sf1: pick best + refresh calibration"
  python tools/pipeline12.py pick > "$H/sf1_pick.log" 2>&1 \
    || { echo "[harvest12] pick FAILED"; tail -5 "$H/sf1_pick.log"; exit 1; }
  tail -4 "$H/sf1_pick.log"
  python tools/calibration_report.py .data/est_best gru \
    reports/estimator_calibration_sf1.json .data/sf1 \
    > "$H/sf1_calib.log" 2>&1 || echo "[harvest12] sf1 calibration FAILED"
  save
  step "sf1 track DONE"
}

case "${1:-}" in
  sf10) sf10_track ;;
  sf1)  sf1_track ;;
  *) echo "usage: $0 {sf10|sf1}"; exit 2 ;;
esac
