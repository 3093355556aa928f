"""Round-10 results pipeline (reuses pipeline7's Phase machinery).

Round-9 postmortem (VERDICT r9): the library work landed but the
measured chain was left inconsistent — stage_sf10 crashed mid-copy and
the abstain-aware sf10 hint report never ran. Round 10 inverts the
order: the sf10 serving chain (re-split on the grown corpus -> warm ->
fine-tune -> atomic stage + discounted calibration -> hint report) runs
FIRST on a quiet box, and only then does the long sf1 generation +
retrain occupy the machine, so a budget overrun can no longer cut the
highest-leverage artifact.

sf1 track (after generation extends .data/gen_r10):
  split_r10   leak-safe rebalanced split (same rules as r9: old TRAIN
              never enters test; per-bucket test cap 40%)
  ft_gru      warm-start the r9 tournament winner on the grown corpus
  gru_64x128  the capacity point VERDICT r9 asked for, from scratch
  gru_rebal   bucket-rebalanced sampler variant
  pick_best   tournament on the NEW test set -> .data/est_best
  calibration + models_report

Usage:
    python tools/pipeline10.py [--dry-run] [--only p1,p2] [--list]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pipeline7 import REPO, Phase  # noqa: E402
from pipeline9 import _rebalanced_split  # noqa: E402

GEN = ".data/gen_r10"
GEN_SF10 = ".data/gen_sf10_hi"
OLD = ".data/est_r9"
SPLIT = ".data/est_r10"
SWEEP = ".data/est_r10_sweep"
FT = ".data/ft_r10"
FT_SF10 = ".data/ft_sf10_r10"
INIT = ".data/est_r10_init"  # frozen copy of the r9 winner (pick_best overwrites est_best)
BEST = ".data/est_best"
SF10_OLD = ".data/est_sf10_r9"
SF10_SPLIT = ".data/est_sf10_r10"
TEST_FLOOR = 25


def split_r10() -> None:
    _rebalanced_split(
        REPO / GEN / "workload.csv",
        REPO / OLD,
        REPO / SPLIT,
        test_floor=TEST_FLOOR,
        calib_frac_new=0.05,
        calib_cap=10,
    )


def split_sf10_r10() -> None:
    # the sf10 corpus grew ~40% after the r9 split was cut (608 vs 433
    # rows, including the first bucket-6/7/8 coverage); keep growing the
    # DISJOINT calib carve so the union fallback can eventually retire
    _rebalanced_split(
        REPO / GEN_SF10 / "workload.csv",
        REPO / SF10_OLD,
        REPO / SF10_SPLIT,
        test_floor=12,
        calib_frac_new=0.20,
        calib_cap=10,
    )


def freeze_init() -> None:
    """Copy the round-9 winner out of est_best before pick_best
    overwrites it — fine-tunes must warm-start from a frozen file."""
    dst = REPO / INIT
    dst.mkdir(parents=True, exist_ok=True)
    for f in ("model_gru.json", "choice.json", "schema.json"):
        src = REPO / BEST / f
        if src.exists() and not (dst / f).exists():
            shutil.copy(src, dst / f)
    print(f"frozen r9 winner -> {dst}")


def seed_caches() -> None:
    for split, src in (
        (SPLIT, f"{OLD}/enc_cache.pkl"),
        (SF10_SPLIT, f"{SF10_OLD}/enc_cache.pkl"),
    ):
        dst = REPO / split / "enc_cache.pkl"
        s = REPO / src
        # the two tracks run at different times: skip a split dir that
        # has not been cut yet instead of dying on the copy
        if not dst.parent.is_dir():
            continue
        if not dst.exists() and s.exists():
            shutil.copy(s, dst)
            print(f"seeded {dst} from {src} ({dst.stat().st_size >> 20} MiB)")


def build_phases() -> list[Phase]:
    env = {
        "DQO_TEST_CSV": str(REPO / SPLIT / "test.csv"),
        "DQO_CALIB_CSV": str(REPO / SPLIT / "calib.csv"),
        "DQO_ENC_CACHE": str(REPO / SPLIT / "enc_cache.pkl"),
        "DQO_BATCH": "64",
        "DQO_EMBED": "64",
        "DQO_HIDDEN": "64",
    }
    env_sf10 = {
        "DQO_TEST_CSV": str(REPO / SF10_SPLIT / "test.csv"),
        "DQO_CALIB_CSV": str(REPO / SF10_SPLIT / "calib.csv"),
        "DQO_ENC_CACHE": str(REPO / SF10_SPLIT / "enc_cache.pkl"),
        "DQO_BATCH": "64",
    }
    return [
        # ---- sf10 track (runs FIRST, before sf1 generation) ----------
        Phase(
            "sf10_split",
            outputs=[f"{SF10_SPLIT}/workload.csv", f"{SF10_SPLIT}/test.csv", f"{SF10_SPLIT}/calib.csv"],
            inputs=[f"{GEN_SF10}/workload.csv"],
            cmd=None,
            fn=split_sf10_r10,
            requires=[f"{GEN_SF10}/workload.csv", f"{SF10_OLD}/test.csv"],
        ),
        Phase(
            "freeze_init",
            outputs=[f"{INIT}/model_gru.json"],
            cmd=None,
            fn=freeze_init,
            requires=[f"{BEST}/model_gru.json"],
        ),
        Phase(
            "seed_cache",
            outputs=[f"{SF10_SPLIT}/enc_cache.pkl"],
            cmd=None,
            fn=seed_caches,
            deps=["sf10_split"],
        ),
        Phase(
            "warm_cache_sf10",
            outputs=[f"{SF10_SPLIT}/.cache_warm"],
            inputs=[f"{SF10_SPLIT}/workload.csv"],
            cmd=[
                "bash",
                "-c",
                f"{sys.executable} tools/train_estimator.py .data/sf10 0 {SF10_SPLIT} && touch {SF10_SPLIT}/.cache_warm",
            ],
            env={**env_sf10, "DQO_ENCODE_ONLY": "1", "DQO_AUG": "0"},
            deps=["seed_cache"],
        ),
        # warm-start the R9 SF10 FINE-TUNE itself (not the sf1 winner:
        # cross-scale transfer was measured useless in r7) on the grown
        # sf10 corpus — the 175 new rows include the first real bucket
        # 6-8 coverage
        Phase(
            "sf10_ft",
            outputs=[f"{FT_SF10}/finetune_gru.json"],
            inputs=[f"{SF10_SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SF10_SPLIT}/workload.csv",
                ".data/ft_sf10_r9/model_gru_finetuned.json",
                "gru",
                FT_SF10,
                ".data/sf10",
                f"{SF10_SPLIT}/test.csv",
                f"{SF10_SPLIT}/calib.csv",
            ],
            env={**env_sf10, "DQO_EPOCHS": "50", "DQO_LR": "1e-3"},
            requires=[".data/ft_sf10_r9/model_gru_finetuned.json"],
            deps=["warm_cache_sf10"],
        ),
        # ---- sf1 track (after tools/gen_workload.py extends GEN) ------
        Phase(
            "split",
            outputs=[f"{SPLIT}/workload.csv", f"{SPLIT}/test.csv", f"{SPLIT}/calib.csv"],
            inputs=[f"{GEN}/workload.csv"],
            cmd=None,
            fn=split_r10,
            requires=[f"{GEN}/workload.csv", f"{OLD}/test.csv"],
        ),
        Phase(
            "seed_cache_sf1",
            outputs=[f"{SPLIT}/enc_cache.pkl"],
            cmd=None,
            fn=seed_caches,
            deps=["split"],
        ),
        Phase(
            "warm_cache",
            outputs=[f"{SPLIT}/.cache_warm"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                "bash",
                "-c",
                f"{sys.executable} tools/train_estimator.py .data/sf1 0 {SPLIT} && touch {SPLIT}/.cache_warm",
            ],
            env={**env, "DQO_ENCODE_ONLY": "1", "DQO_AUG": "2"},
            deps=["seed_cache_sf1"],
        ),
        Phase(
            "ft_gru",
            outputs=[f"{FT}/finetune_gru.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SPLIT}/workload.csv",
                f"{INIT}/model_gru.json",
                "gru",
                FT,
                ".data/sf1",
                f"{SPLIT}/test.csv",
                f"{SPLIT}/calib.csv",
            ],
            env={**env, "DQO_EPOCHS": "60", "DQO_LR": "1e-3"},
            requires=[f"{INIT}/model_gru.json"],
            deps=["warm_cache", "freeze_init"],
        ),
        # the 64x128 capacity point VERDICT r9 asked for, from scratch
        # on the grown corpus (the r8 capacity sweep plateaued at 64x64
        # on the SMALLER corpus; more upper-bucket rows may move it)
        Phase(
            "gru_64x128",
            outputs=[f"{SWEEP}/gru_64x128/report.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                "bash",
                "-c",
                f"mkdir -p {SWEEP}/gru_64x128 && "
                f"cp -n {SPLIT}/workload.csv {SPLIT}/schema.json {SWEEP}/gru_64x128/ 2>/dev/null; "
                f"{sys.executable} tools/train_estimator.py .data/sf1 0 {SWEEP}/gru_64x128",
            ],
            env={
                **env,
                "DQO_FAMILIES": "gru",
                "DQO_AUG": "0",
                "DQO_EMBED": "64",
                "DQO_HIDDEN": "128",
                "DQO_EPOCHS": "100",
                "OMP_NUM_THREADS": "4",
                "OPENBLAS_NUM_THREADS": "4",
            },
            deps=["warm_cache"],
        ),
        Phase(
            "gru_rebal",
            outputs=[f"{SWEEP}/gru_64x64rebal/report.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                "bash",
                "-c",
                f"mkdir -p {SWEEP}/gru_64x64rebal && "
                f"cp -n {SPLIT}/workload.csv {SPLIT}/schema.json {SWEEP}/gru_64x64rebal/ 2>/dev/null; "
                f"{sys.executable} tools/train_estimator.py .data/sf1 0 {SWEEP}/gru_64x64rebal",
            ],
            env={
                **env,
                "DQO_FAMILIES": "gru",
                "DQO_AUG": "2",
                "DQO_REBALANCE": "200:400",
                "DQO_EPOCHS": "40",
                "OMP_NUM_THREADS": "4",
                "OPENBLAS_NUM_THREADS": "4",
            },
            deps=["warm_cache"],
        ),
        Phase(
            "pick_best",
            outputs=[f"{BEST}/choice.json"],
            inputs=[f"{FT}/finetune_gru.json"],
            cmd=[
                sys.executable,
                "tools/pick_best_model.py",
                # no scratch table this round: r9's 8-family numbers are
                # vs the r9 test set and would not be comparable — only
                # candidates evaluated on the r10 test compete (the
                # warm-started ft records the incumbent's r10-test score
                # as its "before" for the models report)
                ".data/est_r10_out",
                FT,
                BEST,
                f"{SPLIT}/schema.json",
                f"{SPLIT}/test.csv",
                "gru,treelstm,gerelt4,cnn",
            ],
            env={"DQO_SWEEP_DIRS": SWEEP, "DQO_ENC_CACHE": str(REPO / SPLIT / "enc_cache.pkl")},
            deps=["ft_gru", "gru_64x128", "gru_rebal"],
        ),
        Phase(
            "calibration",
            outputs=["reports/estimator_calibration_sf1.json"],
            inputs=[f"{BEST}/choice.json"],
            cmd=None,
            fn=run_calibration,
            deps=["pick_best"],
        ),
        Phase(
            "models_report",
            outputs=["reports/estimator_models_sf1.json"],
            inputs=[f"{BEST}/choice.json"],
            cmd=None,
            fn=write_models_report,
            deps=["pick_best"],
        ),
    ]


def _best_family() -> str:
    return json.loads((REPO / BEST / "choice.json").read_text())["family"]


def run_calibration() -> None:
    subprocess.run(
        [
            sys.executable,
            "tools/calibration_report.py",
            BEST,
            _best_family(),
            "reports/estimator_calibration_sf1.json",
            ".data/sf1",
        ],
        cwd=REPO,
        check=True,
        env=dict(os.environ, DQO_ENC_CACHE=str(REPO / SPLIT / "enc_cache.pkl")),
    )


def write_models_report() -> None:
    from collections import Counter

    from deep_query_optimization_spark.estimator import QueriesDataset

    choice = json.loads((REPO / BEST / "choice.json").read_text())
    ft = {}
    for tag, root, fam in (
        ("gru_ft60_warm_r9", FT, "gru"),
        ("gru_sf10_ft50_warm_r9sf10", FT_SF10, "gru"),
    ):
        p = REPO / root / f"finetune_{fam}.json"
        if p.exists():
            r = json.loads(p.read_text())
            ft[tag] = {
                "before": r.get("before", {}),
                "after": r.get("after", {}),
                "after_calibrated": r.get("after_calibrated", {}),
                "clean_rows": r.get("clean_rows"),
            }
    sweeps = {}
    for d in sorted((REPO / SWEEP).iterdir()) if (REPO / SWEEP).is_dir() else []:
        rep_p = d / "report.json"
        if not rep_p.exists():
            continue
        fam = d.name.split("_", 1)[0]
        m = json.loads(rep_p.read_text()).get("models", {}).get(fam)
        if m:
            sweeps[d.name] = {
                "test": m.get("test", {}),
                "test_calibrated": m.get("test_calibrated", {}),
                "fit_seconds": m.get("fit_seconds"),
            }
    hists = {}
    for tag, p in (("test", "test.csv"), ("train", "workload.csv")):
        hists[tag] = dict(
            sorted(Counter(QueriesDataset.load(str(REPO / SPLIT / p)).buckets()).items())
        )
    out = {
        "protocol": (
            "round-10: corpus extended with a dedicated quiet double-run "
            "pass into buckets 2-5 (the 4-64s region VERDICT r9 flagged at "
            "0.143/0.087 accuracy); leak-safe rebalanced split (old TRAIN "
            "never enters test, per-bucket test cap 40%); warm-started GRU "
            "+ 64x128 capacity point + rebalanced-sampler variant."
        ),
        "train_bucket_histogram": {str(k): v for k, v in hists["train"].items()},
        "test_bucket_histogram": {str(k): v for k, v in hists["test"].items()},
        "finetune": ft,
        "sweeps": sweeps,
        "best": choice,
    }
    (REPO / "reports/estimator_models_sf1.json").write_text(json.dumps(out, indent=1))
    print(f"models report refreshed: best={choice['family']} ({choice['label']}) acc={choice['accuracy']}")


def main(argv: list[str] | None = None) -> int:
    import pipeline7

    pipeline7.build_phases = build_phases
    return pipeline7.main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
