#!/bin/bash
# Round-12 sf1 generation window: two parallel generators (seeds 43/107)
# pinned to the starved mid/upper band (buckets 3..7 by the ceil-log2
# partitioner — r11 verdict asks #3 and #6: bucket 4 accuracy stuck at
# 0.125 on n=8 test rows, corpus target 6,000). Both resume from the
# full r11 corpus (dedup + near-target seed candidates) but the
# balancer's fill view drops out-of-band mass (DQO_RESTORE_DROP_OOB)
# so rargmin targets the band's true single/double-digit fills.
#
# Usage: tools/round12_gen_sf1.sh [budget_s]   (default 3900)
set -u
cd /root/repo || exit 1
BUDGET=${1:-3900}

if pgrep -f gen_workload.py >/dev/null; then
  echo "[gen-sf1] another generator is running — refusing to start" >&2
  exit 1
fi

for d in a b; do
  mkdir -p ".data/gen_r12_$d"
  [ -f ".data/gen_r12_$d/workload.csv" ] || cp .data/gen_r11/workload.csv ".data/gen_r12_$d/workload.csv"
  [ -f ".data/gen_r12_$d/schema.json" ] || cp .data/gen_r11/schema.json ".data/gen_r12_$d/schema.json"
done

common=(DQO_BUCKET_LO=3 DQO_BUCKET_HI=7 DQO_TIMEOUT_S=150 DQO_DOUBLE_RUN=1
        DQO_RESTORE_DROP_OOB=1 DQO_CHECKPOINT_EVERY=5 "DQO_BUDGET_S=$BUDGET")

env "${common[@]}" DQO_GEN_SEED=43 DQO_HOLD_QUIET=1 \
  python tools/gen_workload.py .data/sf1 9000 .data/gen_r12_a \
  > .data/gen_r12_a/gen.log 2>&1 &
A=$!
# only generator A holds the quiet sentinel (one holder is enough to
# pause sentinel-honoring background jobs; the generators themselves
# are the window's intended co-located load, as in r11)
env "${common[@]}" DQO_GEN_SEED=107 \
  python tools/gen_workload.py .data/sf1 9000 .data/gen_r12_b \
  > .data/gen_r12_b/gen.log 2>&1 &
B=$!
echo "[gen-sf1] launched A=$A (seed 43) B=$B (seed 107), budget ${BUDGET}s"
