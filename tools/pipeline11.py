"""Round-11 sf1 split/pick helpers driven by tools/round11_harvest.sh.

Two subcommands:

``split``  — leak-preserving extension of the round-10 split
             (.data/est_r10) onto the grown corpus (.data/gen_r11):
             old train rows never move to test/calib, surplus old test
             rows rebalance into train, and new rows top starved test
             buckets up to the floor (pipeline9._rebalanced_split — the
             same membership rules every round since r9).

``pick``   — tournament between (a) the r10 winner as-is (its accuracy
             re-measured on the NEW test set by the fine-tune's
             "before" pass — the only cross-era-comparable number),
             (b) the r10 winner fine-tuned on the grown corpus
             (.data/ft_r11), and (c) a scratch GRU on the grown corpus
             (.data/est_r11_out). Winner is staged into .data/est_best
             (the dir engine.load_best serves).

Usage:
    python tools/pipeline11.py {split|pick}
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

GEN = REPO / ".data/gen_r11"
OLD = REPO / ".data/est_r10"
SPLIT = REPO / ".data/est_r11"
FT = REPO / ".data/ft_r11"
SCRATCH = REPO / ".data/est_r11_out"
INIT = REPO / ".data/est_r11_init"  # frozen copy of the r10 winner
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
    """Copy the r10 winner out of est_best before pick overwrites it —
    the keep-old candidate and any later fine-tune must reference a
    frozen file, not a dir the tournament mutates."""
    INIT.mkdir(parents=True, exist_ok=True)
    for f in ("model_gru.json", "choice.json", "schema.json"):
        src = BEST / f
        if src.exists() and not (INIT / f).exists():
            shutil.copy(src, INIT / f)
    print(f"frozen r10 winner -> {INIT}")


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
    # keep-old candidate: the frozen r10 winner scored on the NEW test
    # set (finetune report's "before" pass — same rows, same encoder)
    ft_rep = FT / "finetune_gru.json"
    if ft_rep.exists():
        r = json.loads(ft_rep.read_text())
        old_acc = max(
            r.get("before", {}).get("accuracy", 0.0),
            r.get("before_calibrated", {}).get("accuracy", 0.0),
        )
        choice["candidates"].append(
            {"family": "gru", "label": "r10-winner-unchanged", "accuracy": round(old_acc, 4)}
        )
        if old_acc > choice["accuracy"]:
            shutil.copy(INIT / "model_gru.json", BEST / "model_gru.json")
            # schema check (r11 ADVICE): _pick staged the NEW split's
            # schema.json into BEST. The keep-old score itself was
            # measured through the NEW encoder, so the new schema is the
            # consistent one to serve — but a silent divergence from the
            # frozen snapshot means the weights were TRAINED against a
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
                label="r10-winner-unchanged",
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
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
