"""Fan out estimator training: one process per model family.

The numpy training loops are single-core (manual BPTT over per-sample
Python loops), so on a 32-core box training the eight families
sequentially wastes 7/8 of the machine. This driver runs
``tools/train_estimator.py`` once per family in parallel subprocesses —
each against the SAME saved workload (symlinked into a per-family out
dir, so the stratified split and test rows are identical across
families — the comparison stays apples-to-apples) — then merges the
per-family reports into one combined report.

Wall-clock becomes max(family) instead of sum(family); the slowest
family (gerelt4's 8 GRU directions) dominates.

Usage:
    python tools/train_parallel.py <workload_dir> <sf_dir> <out_root> \
        [fam1,fam2,...]

``workload_dir`` must hold ``workload.csv`` (tools/gen_workload.py
output) and ideally ``schema.json`` (else the first process recollects
stats). Env knobs (DQO_EPOCHS/DQO_BATCH/DQO_LR/DQO_AUG) pass through to
every subprocess; per-family overrides via DQO_EPOCHS_<FAM> etc.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ALL_FAMILIES = ("linear", "mlp", "gru", "cnn", "treelstm", "gerelt4", "mscn", "neo")


def main() -> None:
    workload_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2]
    out_root = Path(sys.argv[3])
    fams = sys.argv[4].split(",") if len(sys.argv) > 4 else list(ALL_FAMILIES)
    out_root.mkdir(parents=True, exist_ok=True)

    procs: dict[str, subprocess.Popen] = {}
    t0 = time.time()
    for fam in fams:
        fam_dir = out_root / fam
        fam_dir.mkdir(exist_ok=True)
        for name in ("workload.csv", "schema.json"):
            src, dst = workload_dir / name, fam_dir / name
            if src.exists() and not dst.exists():
                dst.symlink_to(src.resolve())
        env = dict(os.environ, DQO_FAMILIES=fam)
        # cap per-process BLAS threads — an 8-process fleet of
        # free-threading BLAS oversubscribes the box (see sweep_capacity)
        for knob in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            env.setdefault(knob, "4")
        for knob in ("EPOCHS", "BATCH", "LR", "AUG", "EMBED", "HIDDEN"):
            per_fam = os.environ.get(f"DQO_{knob}_{fam.upper()}")
            if per_fam is not None:
                env[f"DQO_{knob}"] = per_fam
        log = open(fam_dir / "train.log", "w")
        procs[fam] = subprocess.Popen(
            [sys.executable, str(Path(__file__).parent / "train_estimator.py"), sf_dir, "0", str(fam_dir)],
            env=env,
            stdout=log,
            stderr=subprocess.STDOUT,
        )
        print(f"spawned {fam} (pid {procs[fam].pid})", flush=True)

    merged: dict = {"models": {}}
    failures = []
    for fam, p in procs.items():
        rc = p.wait()
        rep_path = out_root / fam / "report.json"
        if rc != 0 or not rep_path.exists():
            failures.append(fam)
            print(f"{fam}: FAILED rc={rc} (see {out_root / fam / 'train.log'})", flush=True)
            continue
        with open(rep_path) as f:
            rep = json.load(f)
        for k, v in rep.items():
            if k != "models":
                merged.setdefault(k, v)
        merged["models"].update(rep["models"])
        te = rep["models"][fam].get("test", {})
        print(
            f"{fam}: done in {time.time() - t0:.0f}s, "
            f"test acc {te.get('accuracy', float('nan')):.3f} mae {te.get('mae', float('nan')):.3f}",
            flush=True,
        )

    with open(out_root / "report.json", "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged report -> {out_root / 'report.json'} ({len(merged['models'])} families)", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
