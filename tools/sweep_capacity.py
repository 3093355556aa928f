"""Capacity sweep for one estimator family on the clean corpus.

The round-6 hypothesis (tools/train_estimator.py capacity-knob note):
with label noise gone, the 32/32 embed/hidden defaults — sized to the
reference's smallest gerelt configs — may be the binding constraint.
This driver tests it: train the SAME family at several (embed, hidden)
sizes against the SAME frozen clean test/calib sets, in parallel
subprocesses (each fit is single-core numpy), sharing the on-disk
encoding cache so only the first run pays the Spark plan-analysis.

Usage:
    python tools/sweep_capacity.py <workload_dir> <sf_dir> <out_root> \
        <family> [cfg1,cfg2,...] [out_json]

Configs are ``<embed>x<hidden>`` (e.g. ``32x32,64x64,96x96``), with an
optional ``a<N>`` augmentation suffix (``64x64a4`` = DQO_AUG=4).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_CFGS = "32x32,64x64,96x96,64x128"


def parse_cfg(tok: str) -> dict:
    m = re.fullmatch(r"(\d+)x(\d+)(?:a(\d+))?", tok)
    if not m:
        raise SystemExit(f"bad config {tok!r} (want <embed>x<hidden>[a<aug>])")
    return {"embed": int(m.group(1)), "hidden": int(m.group(2)), "aug": int(m.group(3) or 0)}


def main() -> None:
    workload_dir = Path(sys.argv[1] if len(sys.argv) > 1 else ".data/est_clean_full")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".data/sf1"
    out_root = Path(sys.argv[3] if len(sys.argv) > 3 else ".data/est_sweep")
    family = sys.argv[4] if len(sys.argv) > 4 else "gru"
    cfgs = [parse_cfg(t) for t in (sys.argv[5] if len(sys.argv) > 5 else DEFAULT_CFGS).split(",")]
    out_json = sys.argv[6] if len(sys.argv) > 6 else "reports/estimator_capacity_sweep.json"
    out_root.mkdir(parents=True, exist_ok=True)

    procs: list[tuple[dict, Path, subprocess.Popen]] = []
    t0 = time.time()
    for cfg in cfgs:
        tag = f"{family}_{cfg['embed']}x{cfg['hidden']}" + (f"a{cfg['aug']}" if cfg["aug"] else "")
        d = out_root / tag
        d.mkdir(exist_ok=True)
        for name in ("workload.csv", "schema.json"):
            dst = d / name
            if not dst.exists():
                dst.symlink_to((workload_dir / name).resolve())
        env = dict(
            os.environ,
            DQO_FAMILIES=family,
            DQO_EMBED=str(cfg["embed"]),
            DQO_HIDDEN=str(cfg["hidden"]),
        )
        env.setdefault("DQO_ENC_CACHE", str((workload_dir / "enc_cache.pkl").resolve()))
        # cap per-process BLAS threads: at >=64x64 numpy's BLAS spawns a
        # thread per core, and a fleet of such processes oversubscribes
        # the box ~4x (observed loadavg >120 on 32 cores), slowing every
        # member; explicit env still wins
        for knob in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            env.setdefault(knob, "4")
        if cfg["aug"]:
            env["DQO_AUG"] = str(cfg["aug"])
        log = open(d / "train.log", "w")
        p = subprocess.Popen(
            [sys.executable, "tools/train_estimator.py", sf_dir, "0", str(d)],
            cwd=REPO,
            env=env,
            stdout=log,
            stderr=subprocess.STDOUT,
        )
        procs.append((cfg, d, p))
        print(f"spawned {tag} (pid {p.pid})", flush=True)

    results = []
    for cfg, d, p in procs:
        rc = p.wait()
        row = {**cfg, "dir": str(d)}
        rep = d / "report.json"
        if rc == 0 and rep.exists():
            models = json.loads(rep.read_text())["models"]
            m = models.get(family, {})
            row["test"] = m.get("test", {})
            row["test_calibrated"] = m.get("test_calibrated", {})
            row["fit_seconds"] = m.get("fit_seconds")
            acc = max(
                row["test"].get("accuracy", 0.0),
                (row["test_calibrated"] or {}).get("accuracy", 0.0),
            )
            print(f"{d.name}: acc {acc:.3f} ({time.time() - t0:.0f}s elapsed)", flush=True)
        else:
            row["error"] = f"rc={rc}"
            print(f"{d.name}: FAILED rc={rc}", flush=True)
        results.append(row)

    results.sort(
        key=lambda r: max(
            r.get("test", {}).get("accuracy", 0.0),
            (r.get("test_calibrated") or {}).get("accuracy", 0.0),
        ),
        reverse=True,
    )
    report = {"family": family, "configs": results, "generated_at": time.strftime("%Y-%m-%d %H:%M")}
    Path(out_json).parent.mkdir(parents=True, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {out_json}")


if __name__ == "__main__":
    main()
