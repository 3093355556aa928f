"""Round-8 results pipeline (reuses pipeline7's Phase machinery).

Sequencing: tools/gen_workload.py extends the clean sf1 corpus into
``.data/gen_r8`` (upper-bucket targeting); this pipeline then

  1. splits it leak-preservingly — the round-7 test/calib rows KEEP
     their membership (warm-start candidates were trained on the old
     train rows; re-dealing the split would leak them into test), and
     only genuinely NEW rows are carved, with a per-bucket floor so
     upper-bucket metrics rest on n >= ~25, not single digits;
  2. seeds the encoding cache from round 7's (same schema -> same
     signature; 3k of the rows are already encoded);
  3. trains: the 8-family scratch table (per-family epoch budgets),
     warm-start fine-tunes of the round-7 best GRU (with and without
     augmentation), a gerelt4 fine-tune from its noisy pretrain with
     augmentation (the reference's tpch_aug recipe), and the joint
     sf1+sf10 model (tools/train_joint.py);
  4. tournament-picks the best into ``.data/est_best`` (the dir
     ``engine.load_best`` now prefers) and refreshes the calibration +
     models reports.

Measured phases (hints at sf10, bench) are NOT here — they need a
quiet box and run after the trainers, from the round driver.

Usage:
    python tools/pipeline8.py [--dry-run] [--only p1,p2] [--list]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pipeline7 import REPO, Phase  # noqa: E402

GEN = ".data/gen_r8"
SWEEP = ".data/est_r8_sweep"
SPLIT = ".data/est_r8"
OUT = ".data/est_r8_out"
FT = ".data/ft_r8"
FT_AUG = ".data/ft_r8_aug"
JOINT = ".data/est_r8_joint"
BEST = ".data/est_best"
SF10 = ".data/est_sf10_split"
TEST_FLOOR = 25


def split_r8() -> None:
    """Leak-preserving split of the extended corpus.

    Old rows keep their round-7 membership verbatim; new rows are
    carved per bucket with a floor chosen so old+new test reaches
    TEST_FLOOR (capped at 60 % of the bucket's new rows), plus a 10 %
    proportional carve so dense buckets stay represented."""
    import random

    from deep_query_optimization_spark.estimator import QueriesDataset
    from deep_query_optimization_spark.estimator.metrics import bucketize

    gen = QueriesDataset.load(str(REPO / GEN / "workload.csv"))
    old_train = QueriesDataset.load(str(REPO / ".data/est_clean_full/workload.csv"))
    old_test = QueriesDataset.load(str(REPO / ".data/est_clean_full/test.csv"))
    old_calib = QueriesDataset.load(str(REPO / ".data/est_clean_full/calib.csv"))
    old_sqls = {s for ds in (old_train, old_test, old_calib) for s, _, _ in ds.rows}
    new_rows = [r for r in gen.rows if r[0] not in old_sqls]

    by_bucket: dict[int, list] = {}
    for r in new_rows:
        by_bucket.setdefault(bucketize(r[1]), []).append(r)
    old_test_hist: dict[int, int] = {}
    for b in old_test.buckets():
        old_test_hist[b] = old_test_hist.get(b, 0) + 1

    rng = random.Random(0)
    test_rows, calib_rows, train_rows = list(old_test.rows), list(old_calib.rows), list(old_train.rows)
    for b, rows in sorted(by_bucket.items()):
        rng.shuffle(rows)
        need = max(0, TEST_FLOOR - old_test_hist.get(b, 0))
        n_test = max(math.ceil(0.10 * len(rows)), min(need, int(0.60 * len(rows))))
        n_calib = min(max(1, round(0.05 * len(rows))), 10)
        test_rows += rows[:n_test]
        calib_rows += rows[n_test : n_test + n_calib]
        train_rows += rows[n_test + n_calib :]
        print(
            f"bucket {b:3d}: {len(rows)} new -> test +{n_test} "
            f"(old {old_test_hist.get(b, 0)}), calib +{n_calib}, train +{len(rows) - n_test - n_calib}"
        )

    out = REPO / SPLIT
    out.mkdir(parents=True, exist_ok=True)
    QueriesDataset(train_rows).save(str(out / "workload.csv"))
    QueriesDataset(test_rows).save(str(out / "test.csv"))
    QueriesDataset(calib_rows).save(str(out / "calib.csv"))
    shutil.copy(REPO / GEN / "schema.json", out / "schema.json")
    from collections import Counter

    print(
        f"train {len(train_rows)} / test {len(test_rows)} / calib {len(calib_rows)}; "
        f"test hist {dict(sorted(Counter(QueriesDataset(test_rows).buckets()).items()))}"
    )


def seed_cache() -> None:
    dst = REPO / SPLIT / "enc_cache.pkl"
    src = REPO / ".data/est_clean_full/enc_cache.pkl"
    if not dst.exists() and src.exists():
        shutil.copy(src, dst)
        print(f"seeded {dst} from round-7 cache ({dst.stat().st_size >> 20} MiB)")


def build_phases() -> list[Phase]:
    env = {
        "DQO_TEST_CSV": str(REPO / SPLIT / "test.csv"),
        "DQO_CALIB_CSV": str(REPO / SPLIT / "calib.csv"),
        "DQO_ENC_CACHE": str(REPO / SPLIT / "enc_cache.pkl"),
        "DQO_BATCH": "64",
        "DQO_EMBED": "64",
        "DQO_HIDDEN": "64",
    }
    phases = [
        Phase(
            "split",
            outputs=[f"{SPLIT}/workload.csv", f"{SPLIT}/test.csv", f"{SPLIT}/calib.csv"],
            inputs=[f"{GEN}/workload.csv"],
            cmd=None,
            fn=split_r8,
            requires=[f"{GEN}/workload.csv", ".data/est_clean_full/test.csv"],
        ),
        Phase(
            "seed_cache",
            outputs=[f"{SPLIT}/enc_cache.pkl"],
            cmd=None,
            fn=seed_cache,
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
            deps=["seed_cache"],
        ),
        # 8-family scratch table. Budgets (measured r7 s/row-epoch):
        # GRU 64x64 aug0 100 ep ~= 60 min; gerelt4 is the fine-tune
        # below, here it gets a short scratch run for the table row.
        Phase(
            "train8",
            outputs=[f"{OUT}/report.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[sys.executable, "tools/train_parallel.py", SPLIT, ".data/sf1", OUT],
            env={
                **env,
                "DQO_AUG": "2",
                "DQO_EPOCHS": "150",
                "DQO_AUG_GRU": "0",
                "DQO_EPOCHS_GRU": "100",
                "DQO_AUG_TREELSTM": "0",
                "DQO_EPOCHS_TREELSTM": "60",
                # gerelt4 runs 4-5x GRU's per-epoch cost (8 GRU
                # directions); 32x32 keeps a from-scratch run inside
                # the round budget — no checkpoint of it exists to
                # warm-start from (the r6/r7 attempts were killed)
                "DQO_AUG_GERELT4": "0",
                "DQO_EPOCHS_GERELT4": "40",
                "DQO_EMBED_GERELT4": "32",
                "DQO_HIDDEN_GERELT4": "32",
            },
            deps=["warm_cache"],
        ),
        # warm-start fine-tunes of the r7 tournament winner (GRU 64x64)
        Phase(
            "ft_gru",
            outputs=[f"{FT}/finetune_gru.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SPLIT}/workload.csv",
                ".data/est_r7_best/model_gru.json",
                "gru",
                FT,
                ".data/sf1",
                f"{SPLIT}/test.csv",
                f"{SPLIT}/calib.csv",
            ],
            env={**env, "DQO_EPOCHS": "60", "DQO_LR": "1e-3"},
            requires=[".data/est_r7_best/model_gru.json"],
            deps=["warm_cache"],
        ),
        Phase(
            "ft_gru_aug",
            outputs=[f"{FT_AUG}/finetune_gru.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SPLIT}/workload.csv",
                ".data/est_r7_best/model_gru.json",
                "gru",
                FT_AUG,
                ".data/sf1",
                f"{SPLIT}/test.csv",
                f"{SPLIT}/calib.csv",
            ],
            env={**env, "DQO_EPOCHS": "30", "DQO_LR": "1e-3", "DQO_AUG": "2"},
            requires=[".data/est_r7_best/model_gru.json"],
            deps=["warm_cache"],
        ),
        # gerelt4 scratch WITH augmentation — the reference's tpch_aug
        # recipe on its headline architecture (no pretrained gerelt4
        # checkpoint exists; the r6/r7 runs were killed for time).
        # Sweep-dir layout so pick_best scans it via DQO_SWEEP_DIRS.
        Phase(
            "gerelt4_aug",
            outputs=[f"{SWEEP}/gerelt4_32x32a2/report.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                "bash",
                "-c",
                f"mkdir -p {SWEEP}/gerelt4_32x32a2 && "
                f"cp -n {SPLIT}/workload.csv {SPLIT}/schema.json {SWEEP}/gerelt4_32x32a2/ 2>/dev/null; "
                f"{sys.executable} tools/train_estimator.py .data/sf1 0 {SWEEP}/gerelt4_32x32a2",
            ],
            env={
                **env,
                "DQO_FAMILIES": "gerelt4",
                "DQO_AUG": "2",
                "DQO_EPOCHS": "30",
                "DQO_EMBED": "32",
                "DQO_HIDDEN": "32",
                "OMP_NUM_THREADS": "4",
                "OPENBLAS_NUM_THREADS": "4",
            },
            deps=["warm_cache"],
        ),
        # bucket-rebalanced GRU: cap the dominant fast buckets, repeat
        # scarce slow ones — aims the regression loss at the upper
        # buckets macro-F1 measures
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
        # the capacity point the r7 sweep never finished (64x128 was
        # killed for time twice) — 50 epochs fits the round budget
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
                "DQO_EPOCHS": "50",
                "DQO_EMBED": "64",
                "DQO_HIDDEN": "128",
                "OMP_NUM_THREADS": "4",
                "OPENBLAS_NUM_THREADS": "4",
            },
            deps=["warm_cache"],
        ),
        # joint sf1+sf10: one checkpoint, sf10 train rows oversampled
        Phase(
            "joint",
            outputs=[f"{JOINT}/report.json"],
            inputs=[f"{SPLIT}/workload.csv", f"{SF10}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/train_joint.py",
                JOINT,
                f"sf1:{SPLIT}:.data/sf1:1",
                f"sf10:{SF10}:.data/sf10:6",
            ],
            env={
                "DQO_FAMILIES": "gru",
                "DQO_EPOCHS": "45",
                "DQO_BATCH": "64",
                "DQO_LR": "1e-3",
                "DQO_EMBED": "64",
                "DQO_HIDDEN": "64",
                "DQO_INIT": str(REPO / ".data/est_r7_best/model_gru.json"),
            },
            requires=[f"{SF10}/workload.csv", ".data/est_r7_best/model_gru.json"],
            deps=["warm_cache"],
        ),
        Phase(
            "pick_best",
            outputs=[f"{BEST}/choice.json"],
            inputs=[f"{OUT}/report.json", f"{FT}/finetune_gru.json", f"{FT_AUG}/finetune_gru.json"],
            cmd=[
                sys.executable,
                "tools/pick_best_model.py",
                OUT,
                FT,
                BEST,
                f"{SPLIT}/schema.json",
                f"{SPLIT}/test.csv",
                "gru,treelstm,gerelt4,cnn",
            ],
            env={"DQO_FT_DIRS_EXTRA": FT_AUG, "DQO_SWEEP_DIRS": SWEEP},
            deps=["train8", "ft_gru", "ft_gru_aug", "gerelt4_aug"],
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
            inputs=[f"{OUT}/report.json", f"{BEST}/choice.json"],
            cmd=None,
            fn=write_models_report,
            deps=["pick_best"],
        ),
    ]
    return phases


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
    rep = json.loads((REPO / OUT / "report.json").read_text())
    choice = json.loads((REPO / BEST / "choice.json").read_text())
    ft = {}
    for tag, root, fam in (
        ("gru_ft60", FT, "gru"),
        ("gru_ft30_aug2", FT_AUG, "gru"),
        ("gerelt4_ft25_aug2", FT_AUG, "gerelt4"),
    ):
        p = REPO / root / f"finetune_{fam}.json"
        if p.exists():
            r = json.loads(p.read_text())
            ft[tag] = {
                "before": r.get("before", {}),
                "after": r.get("after", {}),
                "after_calibrated": r.get("after_calibrated", {}),
                "clean_rows": r.get("clean_rows"),
                "aug": r.get("aug"),
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
    joint = {}
    for tag, root in (("warm_from_sf1_best", JOINT), ("warm_from_sf10_ft", ".data/est_r8_joint_b")):
        jp = REPO / root / "report.json"
        if jp.exists():
            joint[tag] = json.loads(jp.read_text())
    from collections import Counter

    from deep_query_optimization_spark.estimator import QueriesDataset

    test_hist = dict(
        sorted(Counter(QueriesDataset.load(str(REPO / SPLIT / "test.csv")).buckets()).items())
    )
    out = {
        "protocol": (
            "round-8 extended clean corpus: round-7's fully-clean sf1 rows "
            "plus upper-bucket rows generated with the same quiet-window + "
            "run-twice-keep-second protocol (seed-pool guided spawns, 70 s "
            "watchdog). Split preserves round-7 test/calib membership "
            "verbatim (warm-start candidates trained on old train rows); "
            "new rows carved with a per-bucket test floor."
        ),
        "corpus": {k: rep.get(k) for k in ("n", "bucket_histogram", "augmented_rows") if k in rep},
        "test_bucket_histogram": {str(k): v for k, v in test_hist.items()},
        "models": rep.get("models", {}),
        "finetune": ft,
        "sweeps": sweeps,
        "joint_sf1_sf10": joint,
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
