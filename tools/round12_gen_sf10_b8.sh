#!/bin/bash
# Round-12 sf10 bucket-8 un-censoring window (r11 verdict ask #4).
#
# The ten r11 bucket-8 rows were measured under a 330 s watchdog, so
# the [330, 512) tail of the bucket is censored out of the corpus (the
# reference ran a 600 s statement_timeout,
# /root/reference/dqo/db/clients/postgres.py:244). This window re-runs
# the balancer pinned to bucket 8 ONLY, with a 520 s cap so the whole
# (256, 512] range is reachable. Double-run: one row costs up to
# ~17 min — budget accordingly (default 45 min ≈ 3-5 rows).
#
# The band is overridable so the same 520 s-cap window can also chase
# ceil-bucket 7 (the estimator's round-bucket 7, [90.5, 181) s, had 1
# corpus row after window 2 — overshoots into (128, 181) land there
# instead of being censored at the old 185 s cap):
#
# Usage: tools/round12_gen_sf10_b8.sh [budget_s] [lo] [hi]  (default 2700 8 8)
set -u
cd /root/repo || exit 1
BUDGET=${1:-2700}
LO=${2:-8}
HI=${3:-8}

if pgrep -f gen_workload.py >/dev/null; then
  echo "[gen-b8] another generator is running — refusing to start" >&2
  exit 1
fi

# same corpus dir as the mid-band window: bucket-8 rows extend the
# r12 corpus, and the balancer's band view (lo=hi=8) sees only them
env "DQO_BUCKET_LO=$LO" "DQO_BUCKET_HI=$HI" DQO_TIMEOUT_S=520 DQO_PATIENCE=6 \
    DQO_SEED_BELOW_ONLY=1 \
    DQO_DOUBLE_RUN=1 DQO_RESTORE_DROP_OOB=1 DQO_CHECKPOINT_EVERY=1 \
    "DQO_BUDGET_S=$BUDGET" DQO_HOLD_QUIET=1 DQO_GEN_SEED=307 \
  python tools/gen_workload.py .data/sf10 9000 .data/gen_sf10_r12 \
  > ".data/gen_sf10_r12/gen_b${LO}${HI}.log" 2>&1
echo "[gen-b8] exit=$? — bank with: python tools/persist_artifacts.py save"
