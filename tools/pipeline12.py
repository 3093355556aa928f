"""Round-12 sf1 split/pick helpers driven by tools/round12_harvest.sh.

Same shape as pipeline11 (r12 dirs, r11 base):

``split``  — leak-preserving extension of the round-11 split
             (.data/est_r11) onto the grown corpus (.data/gen_r12):
             old train rows never move to test/calib, surplus old test
             rows rebalance into train, and new rows top starved test
             buckets up to the floor (pipeline9._rebalanced_split — the
             same membership rules every round since r9).

``pick``   — tournament between (a) the r11 winner as-is (accuracy
             re-measured on the NEW test set by the fine-tune's
             "before" pass), (b) the r11 winner fine-tuned on the grown
             corpus (.data/ft_r12), and (c) a scratch GRU
             (.data/est_r12_out). Winner staged into .data/est_best.
             Carries the r11 ADVICE fix: if the keep-old candidate
             wins, the schema identity between the frozen snapshot and
             the newly staged one is checked and recorded (serving uses
             the NEW schema — the one the keep-old score was measured
             through — but divergence is surfaced, not silent).

Usage:
    python tools/pipeline12.py {split|pick|freeze}
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from pipeline9 import _rebalanced_split  # noqa: E402

GEN = REPO / ".data/gen_r12"
OLD = REPO / ".data/est_r11"
SPLIT = REPO / ".data/est_r12"
FT = REPO / ".data/ft_r12"
SCRATCH = REPO / ".data/est_r12_out"
INIT = REPO / ".data/est_r12_init"  # frozen copy of the r11 winner
BEST = REPO / ".data/est_best"


def split() -> None:
    _rebalanced_split(
        GEN / "workload.csv",
        OLD,
        SPLIT,
        test_floor=8,
        calib_frac_new=0.05,
        calib_cap=10,
    )


def freeze_init() -> None:
    """Copy the r11 winner out of est_best BEFORE any track references
    it — both the keep-old candidate and the sf10 track's sf1-source
    fine-tune must read a frozen file, not a dir the sf1 tournament
    mutates (r11 ADVICE: track-order-dependent provenance)."""
    INIT.mkdir(parents=True, exist_ok=True)
    for f in ("model_gru.json", "choice.json", "schema.json"):
        src = BEST / f
        if src.exists() and not (INIT / f).exists():
            shutil.copy(src, INIT / f)
    print(f"frozen r11 winner -> {INIT}")


def pick() -> None:
    from pick_best_model import pick as _pick

    freeze_init()
    choice = _pick(
        SCRATCH,
        FT,
        BEST,
        SPLIT / "schema.json",
        SPLIT / "test.csv",
        families=("gru",),
    )
    # keep-old candidate: the frozen r11 winner scored on the NEW test
    # set (finetune report's "before" pass — same rows, same encoder)
    ft_rep = FT / "finetune_gru.json"
    if ft_rep.exists():
        r = json.loads(ft_rep.read_text())
        old_acc = max(
            r.get("before", {}).get("accuracy", 0.0),
            r.get("before_calibrated", {}).get("accuracy", 0.0),
        )
        choice["candidates"].append(
            {"family": "gru", "label": "r11-winner-unchanged", "accuracy": round(old_acc, 4)}
        )
        if old_acc > choice["accuracy"]:
            shutil.copy(INIT / "model_gru.json", BEST / "model_gru.json")
            # schema check (r11 ADVICE): _pick staged the NEW split's
            # schema.json into BEST. The keep-old score was measured
            # through the NEW encoder, so the new schema is the
            # consistent one to serve — but a divergence from the frozen
            # snapshot means the kept weights were TRAINED against a
            # different feature encoding; surface it in choice.json.
            old_schema = INIT / "schema.json"
            new_schema = BEST / "schema.json"
            if old_schema.exists() and new_schema.exists():
                same = old_schema.read_text() == new_schema.read_text()
                choice["keep_old_schema_identical"] = same
                if not same:
                    print(
                        "WARNING: schema snapshot changed since the kept "
                        "weights were trained — serving with the NEW schema "
                        "(matches how the keep-old candidate was scored), "
                        "but retraining is overdue"
                    )
            choice.update(
                family="gru",
                label="r11-winner-unchanged",
                accuracy=round(old_acc, 4),
                source=str(INIT / "model_gru.json"),
            )
        (BEST / "choice.json").write_text(json.dumps(choice, indent=1))
    print(json.dumps({k: v for k, v in choice.items() if k != "candidates"}, indent=1))
    for c in choice["candidates"]:
        print(f"  candidate {c['label']}: {c['accuracy']}")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "split":
        split()
    elif cmd == "pick":
        pick()
    elif cmd == "freeze":
        freeze_init()
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
