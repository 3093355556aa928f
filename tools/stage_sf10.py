"""Stage the best sf10-capable cost model for the sf10 hint report.

Round-7's cross-scale finding: cost models are scale-local — the sf1
model is useless on sf10 (0.175). Two sf10-capable candidates exist
after pipeline8: the sf10 fine-tune (.data/ft_sf10, round 7) and the
joint sf1+sf10 checkpoint (.data/est_r8_joint). This compares their
held-out sf10 test accuracy from their own reports, stages the winner
as .data/est_sf10_best/{model_gru.json,schema.json,workload.csv}
(the layout calibration_report.py and hint_report.py consume), and
runs the sf10 calibration report the hint gates need.

Usage:
    python tools/stage_sf10.py [out_dir]
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def candidate_acc() -> list[tuple[float, str, str]]:
    cands: list[tuple[float, str, str]] = []
    for root, label in (
        (".data/ft_sf10_r9", "sf10-finetune-r9"),  # trained on the full extended corpus
        (".data/ft_sf10", "sf10-finetune-r7"),
    ):
        ft = REPO / root / "finetune_gru.json"
        if ft.exists():
            r = json.loads(ft.read_text())
            acc = max(
                r.get("after", {}).get("accuracy", 0.0),
                r.get("after_calibrated", {}).get("accuracy", 0.0),
            )
            cands.append((acc, str(REPO / root / "model_gru_finetuned.json"), label))
    joint = REPO / ".data/est_r8_joint/report.json"
    if joint.exists():
        r = json.loads(joint.read_text())
        m = r.get("models", {}).get("gru", {})
        acc = m.get("test_sf10", {}).get("accuracy", 0.0)
        cands.append((acc, str(REPO / ".data/est_r8_joint/model_gru.json"), "joint-sf1-sf10"))
    return [c for c in cands if Path(c[1]).exists()]


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / ".data/est_sf10_best"
    cands = candidate_acc()
    if not cands:
        raise SystemExit("no sf10-capable model found (run pipeline9 sf10_ft phase first)")
    # candidates report accuracy on the test split they were trained
    # against; the r9 re-split changed the sf10 test set, so r7/r8-era
    # numbers are not comparable to r9 numbers. When an r9 candidate
    # exists, restrict the tournament to r9 candidates and keep the old
    # ones only as recorded also-rans.
    r9 = [c for c in cands if c[2].endswith("-r9")]
    pool = r9 if r9 else cands
    pool.sort(reverse=True)
    acc, path, label = pool[0]
    out.mkdir(parents=True, exist_ok=True)
    shutil.copy(path, out / "model_gru.json")
    split_dir = REPO / ".data/est_sf10_r9"
    if not (split_dir / "calib.csv").exists():  # pre-round-9 layout
        split_dir = REPO / ".data/est_sf10_split"
    shutil.copy(split_dir / "schema.json", out / "schema.json")
    # Calibration-source tradeoff (ADVICE r8): the winner is chosen by
    # its accuracy on test.csv, so margins fit on test alone are
    # optimistically biased. But the disjoint calib carve alone (~58
    # rows) leaves nearly every bucket under the n>=5 floor
    # margins_from_calibration demands — and the abstain gate would
    # then keep the canonical order on ALL slow queries, silently
    # disabling the measured 3x win. Stage the calib+test UNION for
    # statistical power and record the composition: margins on
    # test-covered buckets may be optimistic, which the per-bucket
    # reliability scaling and the abstain floor both bound.
    from deep_query_optimization_spark.estimator import QueriesDataset

    calib_p, test_p = split_dir / "calib.csv", split_dir / "test.csv"
    if calib_p.exists():
        union = QueriesDataset.load(str(calib_p))
        seen = {s for s, *_ in union.rows}
        for s, rt, plan in QueriesDataset.load(str(test_p)).rows:
            if s not in seen:
                union.add(s, rt, plan)
        union.save(str(out / "workload.csv"))
        calib_note = "calib.csv+test.csv union (test also selected the winner; margins on test-covered buckets may be optimistic)"
    else:
        shutil.copy(test_p, out / "workload.csv")
        calib_note = "test.csv (selection set — biased; no calib carve found)"
    (out / "choice.json").write_text(
        json.dumps(
            {
                "family": "gru",
                "label": label,
                "accuracy": round(acc, 4),
                "source": path,
                "calibration_source": calib_note,
                "calibration_disjoint_from_selection": False,
                "candidates": [{"label": lb, "accuracy": round(a, 4)} for a, _, lb in cands],
            },
            indent=1,
        )
    )
    print(f"staged {label} (sf10 test acc {acc:.3f}) -> {out}")
    subprocess.run(
        [
            sys.executable,
            "tools/calibration_report.py",
            str(out),
            "gru",
            "reports/estimator_calibration_sf10.json",
            ".data/sf10",
        ],
        cwd=REPO,
        check=True,
    )


if __name__ == "__main__":
    main()
