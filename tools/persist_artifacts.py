"""Sync the small irreplaceable harvest artifacts between the
gitignored ``.data/`` working tree and the git-tracked ``artifacts/``
directory.

Round-10 postmortem: the container was reset between rounds 9 and 10
and ``.data/`` — four rounds of timed-query corpus (4,119 sf1 + 608
sf10 labeled rows, ~12 h of measured wall-clock) plus every trained
checkpoint — was lost, because only the git tree survives a reset.
The parquet data and encoder caches are cheap to regenerate; the
LABELS are not (each row is a timed Spark execution, double-run).

This tool makes the loss impossible to repeat: ``save`` copies every
corpus CSV, split carve, trained checkpoint, choice record and staged
calibration into ``artifacts/`` (tracked, committed per milestone);
``restore`` rebuilds the ``.data/`` layout from ``artifacts/`` on a
fresh box without overwriting anything newer.

What is NOT persisted (regenerable, large): scaled parquet
(``tools/make_scaled_sf.py``, ~1 min/sf1), ``enc_cache.pkl`` (encoder
featurization over the parquet), logs.

Usage:
    python tools/persist_artifacts.py save
    python tools/persist_artifacts.py restore
"""

from __future__ import annotations

import filecmp
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / ".data"
ART = REPO / "artifacts"

# glob patterns relative to .data/ — small files whose loss costs
# measured hours (corpus labels) or breaks the serving chain
# (checkpoints, choice.json, staged calibration)
PATTERNS = [
    "gen_*/workload.csv",
    "gen_*/schema.json",
    "est_*/workload.csv",
    "est_*/test.csv",
    "est_*/calib.csv",
    "est_*/schema.json",
    "est_*/choice.json",
    "est_*/model_*.json",
    "est_*/calibration.json",
    "est_best/*.json",
    "est_sf10_best/*.json",
    "ft_*/finetune_*.json",
    "ft_*/model_*.json",
    "est_*_out/report.json",
    "est_*_out/*/model_*.json",
    "est_*_out/*/report.json",
    "est_*_sweep/*/report.json",
    "est_*_sweep/*/model_*.json",
    # curated measurement bands (tiny, hand-picked — losing one breaks
    # round-over-round comparability of the hint reports)
    "hint_band_*.csv",
]


def _copy_if_newer(src: Path, dst: Path) -> bool:
    # The git-tracked mirror is the durable copy: never let an older
    # .data file (stale box, interrupted run, git pull from elsewhere)
    # overwrite a newer artifact.  mtime alone decides — size equality
    # is NOT a skip criterion (a newer-but-different-size dst must
    # still win).
    if dst.exists():
        if dst.stat().st_mtime >= src.stat().st_mtime:
            # content compare, not just size: a git pull/clone resets
            # artifact mtimes, so a diverged same-size .data file would
            # otherwise be dropped silently (r11 ADVICE)
            if not filecmp.cmp(src, dst, shallow=False):
                print(
                    f"WARNING: artifacts/{dst.relative_to(ART)} is newer than "
                    f".data copy but content DIFFERS — keeping artifact"
                )
            return False
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(src, dst)
    return True


def save() -> int:
    n = 0
    for pat in PATTERNS:
        for src in sorted(DATA.glob(pat)):
            if _copy_if_newer(src, ART / src.relative_to(DATA)):
                print(f"saved .data/{src.relative_to(DATA)}")
                n += 1
    return n


def restore(force: bool = False) -> int:
    n = 0
    if not ART.is_dir():
        print("no artifacts/ directory — nothing to restore")
        return 0
    for src in sorted(ART.rglob("*")):
        if src.is_file():
            dst = DATA / src.relative_to(ART)
            if dst.exists():
                # A fresher working file wins EVEN UNDER --force: the
                # skip message promises force replaces stale files, not
                # unsaved-newer work (r11 ADVICE — an operator following
                # the prompt must not lose fresh labels).
                if dst.stat().st_mtime > src.stat().st_mtime:
                    if force:
                        print(
                            f"NOT replacing .data/{dst.relative_to(DATA)} "
                            f"despite --force: it is NEWER than the artifact "
                            f"(run persist_artifacts save first if it should win)"
                        )
                    continue
                if not force:
                    if dst.stat().st_mtime >= src.stat().st_mtime:
                        continue
                    print(
                        f"skipped .data/{dst.relative_to(DATA)}: exists but is "
                        f"OLDER than the artifact — rerun with --force to replace"
                    )
                    continue
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
            print(f"restored .data/{dst.relative_to(DATA)}")
            n += 1
    return n


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    mode = argv[0] if argv else "save"
    if mode not in ("save", "restore"):
        print(__doc__)
        return 2
    n = save() if mode == "save" else restore(force=force)
    print(f"{mode}: {n} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
