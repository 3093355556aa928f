"""Carve a labeled workload into train / test / calibration CSVs.

The trainer's internal split re-derives membership from runtime buckets,
so relabeling held-out rows afterwards would silently re-deal the split
and leak test rows into train. Splitting *first* into physically
separate files freezes membership; the test and calibration files can
then be relabeled (tools/relabel_workload.py) without touching train.

Calibration exists because train labels (timed under generator
contention) are systematically slower than quiet-machine labels: a
scalar affine fit on the small calibration set removes that shift from
predictions before they are scored against the clean test labels.

Usage:
    python tools/split_workload.py in_dir out_dir [test_frac] [calib_frac] [min_test_per_bucket] [min_calib_per_bucket]

``min_test_per_bucket`` > 0 switches the test carve to
``stratified_split_min``: every bucket contributes at least that many
test rows (capped at half the bucket), so per-bucket metrics on scarce
upper buckets are measurable instead of resting on single-digit n.

``min_calib_per_bucket`` > 0 does the same for the calibration carve
(r11 verdict ask #2: per-bucket override margins are only fit where the
selection-DISJOINT calib rows reach n >= 5, so a proportional carve
that gives a 14-row bucket ~3 calib rows silently forfeits the
disjoint margin exactly where the hint gate needs it).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402


def main() -> None:
    in_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2])
    test_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    calib_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.04
    out_dir.mkdir(parents=True, exist_ok=True)

    min_test = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    min_calib = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    ds = QueriesDataset.load(str(in_dir / "workload.csv"))
    if min_test > 0:
        rest, test = ds.stratified_split_min(test_frac, min_test_per_bucket=min_test, seed=0)
    else:
        rest, test = ds.stratified_split(test_frac, seed=0)
    # denominator from the ACTUAL remainder, not (1 - test_frac): with
    # min_test_per_bucket > 0 the test carve takes more than test_frac
    # of the rows (bucket floors), and dividing by the nominal fraction
    # would inflate calib and shrink train correspondingly
    calib_frac_rest = calib_frac * len(ds.rows) / max(len(rest.rows), 1)
    if min_calib > 0:
        train, calib = rest.stratified_split_min(
            calib_frac_rest, min_test_per_bucket=min_calib, seed=1
        )
    else:
        train, calib = rest.stratified_split(calib_frac_rest, seed=1)

    train.save(str(out_dir / "workload.csv"))  # trainer reads this name
    test.save(str(out_dir / "test.csv"))
    calib.save(str(out_dir / "calib.csv"))
    if (in_dir / "schema.json").exists():
        shutil.copy(in_dir / "schema.json", out_dir / "schema.json")
    print(f"train {len(train.rows)} / test {len(test.rows)} / calib {len(calib.rows)} -> {out_dir}")


if __name__ == "__main__":
    main()
