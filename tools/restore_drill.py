"""Disaster-recovery drill for the artifacts/ persistence chain
(round-10 verdict ask #6: the save path ran all round, the restore
path had only pytest coverage — prove a fresh box reaches serving
parity from git alone).

The drill simulates a container reset WITHOUT destroying anything:

1. move ``.data/`` aside to ``.data.drill/`` (the "reset"),
2. run ``persist_artifacts restore`` against the empty tree,
3. verify serving parity from the restored files alone:
   - ``est_best/choice.json`` names a family whose ``model_<fam>.json``
     exists and deserializes (numpy-side, no Spark needed),
   - every corpus CSV restored byte-for-byte vs the artifact,
4. move the original ``.data/`` back (merging the restored tree in —
   restore never produces files the original lacked unless the
   original itself was behind ``artifacts/``).

Exit 0 = parity; nonzero = the reset would have cost us something.

Usage: python tools/restore_drill.py
"""

from __future__ import annotations

import filecmp
import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

DATA = REPO / ".data"
ART = REPO / "artifacts"
ASIDE = REPO / ".data.drill"


# processes that write into .data/ — a drill while any of these runs
# would rmtree their in-flight appends (r11 ADVICE, medium)
WRITER_PATTERNS = (
    "gen_workload.py",
    "train_estimator.py",
    "train_parallel.py",
    "train_joint.py",
    "finetune_estimator.py",
    "relabel_workload.py",
)


def _writers_running() -> list[str]:
    hits = []
    for pat in WRITER_PATTERNS:
        if subprocess.run(["pgrep", "-f", pat], capture_output=True).returncode == 0:
            hits.append(pat)
    return hits


def main() -> int:
    import persist_artifacts

    if ASIDE.exists():
        print(f"refusing to run: {ASIDE} exists (previous drill crashed?)")
        return 2
    if not ART.is_dir():
        print("no artifacts/ directory — nothing to drill against")
        return 2
    writers = _writers_running()
    if writers:
        print(
            "refusing to run: .data writers alive "
            f"({', '.join(writers)}) — their mid-drill appends would land "
            "in the restored tree and be destroyed by the merge-back"
        )
        return 2

    had_data = DATA.exists()
    if had_data:
        DATA.rename(ASIDE)
    failures: list[str] = []
    try:
        n = persist_artifacts.restore()
        print(f"drill: restored {n} files onto an empty .data/")

        # serving chain: choice.json -> model_<family>.json loads
        choice_p = DATA / "est_best" / "choice.json"
        if not choice_p.exists():
            failures.append("est_best/choice.json missing after restore")
        else:
            choice = json.loads(choice_p.read_text())
            fam = choice["family"]
            model_p = DATA / "est_best" / f"model_{fam}.json"
            if not model_p.exists():
                failures.append(f"est_best/model_{fam}.json missing after restore")
            else:
                blob = json.loads(model_p.read_text())
                n_arr = sum(1 for v in blob.values() if isinstance(v, list))
                print(
                    f"drill: serving checkpoint model_{fam}.json loads "
                    f"({len(blob)} keys, {n_arr} array fields)"
                )

        # corpus labels: every artifact CSV restored byte-identical
        n_csv = 0
        for src in sorted(ART.rglob("*.csv")):
            dst = DATA / src.relative_to(ART)
            if not dst.exists():
                failures.append(f"{dst.relative_to(DATA)} not restored")
            elif not filecmp.cmp(src, dst, shallow=False):
                failures.append(f"{dst.relative_to(DATA)} differs from artifact")
            else:
                n_csv += 1
        print(f"drill: {n_csv} corpus CSVs byte-identical to artifacts/")
    finally:
        # merge the drill tree back under the original: original wins.
        # Guarded so a restore() that raised before .data was recreated
        # doesn't mask the real error with FileNotFoundError and strand
        # the original at .data.drill (r11 ADVICE, medium).
        if had_data:
            if DATA.exists():
                for p in sorted(DATA.rglob("*")):
                    if not p.is_file():
                        continue
                    dst = ASIDE / p.relative_to(DATA)
                    if not dst.exists():
                        dst.parent.mkdir(parents=True, exist_ok=True)
                        shutil.copy2(p, dst)
                    elif p.stat().st_mtime > dst.stat().st_mtime + 1:
                        # something wrote into .data mid-drill despite the
                        # pgrep guard — preserve it beside the original
                        # instead of rmtree'ing the only copy
                        kept = dst.with_name(dst.name + ".drill-new")
                        shutil.copy2(p, kept)
                        print(
                            f"WARNING: {p.relative_to(DATA)} changed during "
                            f"the drill — preserved as {kept.name}"
                        )
                shutil.rmtree(DATA)
            ASIDE.rename(DATA)

    if failures:
        print("DRILL FAILED:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("DRILL PASSED: a fresh box reaches serving parity from git alone")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
