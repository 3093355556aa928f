"""Round-9 results pipeline (reuses pipeline7's Phase machinery).

Round-8 postmortem (VERDICT r8): buckets 4-5 scored 0.00 because the
split's per-bucket TEST floor consumed nearly all scarce upper-bucket
rows (bucket 6 ended with MORE test than train rows). Round 9 fixes the
allocation, not just the data volume:

  1. ``split_r9`` rebalances leak-safely — no bucket's test set may
     exceed 40 % of that bucket's TOTAL rows. Excess old test rows move
     to TRAIN (safe direction: warm-started models never trained on
     them); the deficit is topped up from NEW rows only. Old TRAIN rows
     never enter test (that direction IS the leak).
  2. tools/gen_workload.py extends the corpus into ``.data/gen_r9``
     with partitioner buckets 3-6 (4-64 s) targeted — the starved
     11-45 s region — under the quiet double-run protocol.
  3. trainers: the 8-family scratch table on the new split, warm-start
     GRU fine-tunes of the round-8 winner, a gerelt4 fine-tune from its
     round-8 aug0 checkpoint (60 ep — VERDICT item 7), a bucket-
     rebalanced GRU, and the sf10 fine-tune re-trained on the full
     extended sf10 corpus (VERDICT item 4) with a leak-preserving sf10
     re-split that enlarges the DISJOINT calibration carve the hint
     gates consume (ADVICE r8).
  4. tournament pick into ``.data/est_best`` + calibration & models
     reports; ``tools/stage_sf10.py`` stages the sf10 winner.

Measured phases (hints at sf10, bench) need a quiet box and run from
the round driver after the trainers.

Usage:
    python tools/pipeline9.py [--dry-run] [--only p1,p2] [--list]
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

GEN = ".data/gen_r9"
GEN_SF10 = ".data/gen_sf10_hi"
OLD = ".data/est_r8"
SPLIT = ".data/est_r9"
SWEEP = ".data/est_r9_sweep"
OUT = ".data/est_r9_out"
FT = ".data/ft_r9"
FT_AUG = ".data/ft_r9_aug"
FT_G4 = ".data/ft_r9_gerelt4"
FT_SF10 = ".data/ft_sf10_r9"
INIT = ".data/est_r9_init"  # frozen copy of the r8 winner (pick_best overwrites est_best)
BEST = ".data/est_best"
SF10_OLD = ".data/est_sf10_split"
SF10_SPLIT = ".data/est_sf10_r9"
TEST_FLOOR = 25
TEST_CAP_FRAC = 0.40  # no bucket's test set may exceed this share of its total rows


def _rebalanced_split(
    gen_csv: Path,
    old_dir: Path,
    out_dir: Path,
    test_floor: int,
    calib_frac_new: float,
    calib_cap: int,
) -> None:
    """Leak-aware rebalanced split shared by sf1 and sf10.

    Membership rules, in the order they matter:
    - old TRAIN rows never move to test/calib (warm-started candidates
      trained on them — that direction is the leak);
    - old TEST rows above the per-bucket cap move to TRAIN (safe: no
      candidate ever trained on them, and test shrinking to the cap is
      the whole point);
    - NEW rows top test up to ``min(test_floor, 40% of bucket total)``,
      feed calib a small carve, and the rest — the majority — go to
      TRAIN, which is what the starved buckets actually need."""
    import random

    from deep_query_optimization_spark.estimator import QueriesDataset
    from deep_query_optimization_spark.estimator.metrics import bucketize

    gen = QueriesDataset.load(str(gen_csv))
    old_train = QueriesDataset.load(str(old_dir / "workload.csv"))
    old_test = QueriesDataset.load(str(old_dir / "test.csv"))
    old_calib = QueriesDataset.load(str(old_dir / "calib.csv"))
    old_sqls = {s for ds in (old_train, old_test, old_calib) for s, _, _ in ds.rows}
    new_rows = [r for r in gen.rows if r[0] not in old_sqls]

    def by_bucket(rows):
        d: dict[int, list] = {}
        for r in rows:
            d.setdefault(bucketize(r[1]), []).append(r)
        return d

    nb, tb, trb, cb = by_bucket(new_rows), by_bucket(old_test.rows), by_bucket(old_train.rows), by_bucket(old_calib.rows)
    rng = random.Random(0)
    train_rows, test_rows, calib_rows = [], [], []
    for b in sorted(set(nb) | set(tb) | set(trb) | set(cb)):
        new_b, test_b = list(nb.get(b, [])), list(tb.get(b, []))
        train_b, calib_b = list(trb.get(b, [])), list(cb.get(b, []))
        rng.shuffle(new_b)
        rng.shuffle(test_b)
        total = len(new_b) + len(test_b) + len(train_b) + len(calib_b)
        target = min(test_floor, int(TEST_CAP_FRAC * total))
        if len(test_b) > target:
            # excess test -> TRAIN (the r8 inversion, undone)
            train_b += test_b[target:]
            test_b = test_b[:target]
        else:
            take = min(target - len(test_b), len(new_b))
            test_b += new_b[:take]
            new_b = new_b[take:]
        n_calib = min(max(1, round(calib_frac_new * len(new_b))), calib_cap) if new_b else 0
        calib_b += new_b[:n_calib]
        train_b += new_b[n_calib:]
        print(
            f"bucket {b:3d}: total {total:4d} -> train {len(train_b):4d} / "
            f"test {len(test_b):3d} (cap {target}) / calib {len(calib_b):3d}"
        )
        train_rows += train_b
        test_rows += test_b
        calib_rows += calib_b

    out_dir.mkdir(parents=True, exist_ok=True)
    QueriesDataset(train_rows).save(str(out_dir / "workload.csv"))
    QueriesDataset(test_rows).save(str(out_dir / "test.csv"))
    QueriesDataset(calib_rows).save(str(out_dir / "calib.csv"))
    shutil.copy(gen_csv.parent / "schema.json", out_dir / "schema.json")
    print(f"train {len(train_rows)} / test {len(test_rows)} / calib {len(calib_rows)} -> {out_dir}")


def split_r9() -> None:
    _rebalanced_split(
        REPO / GEN / "workload.csv",
        REPO / OLD,
        REPO / SPLIT,
        test_floor=TEST_FLOOR,
        calib_frac_new=0.05,
        calib_cap=10,
    )


def split_sf10_r9() -> None:
    # smaller floor (the sf10 corpus is ~7x smaller) and a BIGGER calib
    # carve: the sf10 calibration set is what the hint gates' per-bucket
    # margins are fit on, and ADVICE r8 flagged the old 30-row carve as
    # too thin to be the only disjoint source
    _rebalanced_split(
        REPO / GEN_SF10 / "workload.csv",
        REPO / SF10_OLD,
        REPO / SF10_SPLIT,
        test_floor=12,
        calib_frac_new=0.15,
        calib_cap=8,
    )


def freeze_init() -> None:
    """Copy the round-8 winner out of est_best before pick_best
    overwrites it — fine-tune phases must warm-start from a frozen
    file, not whatever the tournament later stages."""
    dst = REPO / INIT
    dst.mkdir(parents=True, exist_ok=True)
    for f in ("model_gru.json", "choice.json", "schema.json"):
        src = REPO / BEST / f
        if src.exists() and not (dst / f).exists():
            shutil.copy(src, dst / f)
    print(f"frozen r8 winner -> {dst}")


def seed_caches() -> None:
    for split, src in ((SPLIT, ".data/est_r8/enc_cache.pkl"), (SF10_SPLIT, ".data/est_sf10_split/enc_cache.pkl")):
        dst = REPO / split / "enc_cache.pkl"
        s = REPO / src
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
    phases = [
        Phase(
            "split",
            outputs=[f"{SPLIT}/workload.csv", f"{SPLIT}/test.csv", f"{SPLIT}/calib.csv"],
            inputs=[f"{GEN}/workload.csv"],
            cmd=None,
            fn=split_r9,
            requires=[f"{GEN}/workload.csv", f"{OLD}/test.csv"],
        ),
        Phase(
            "sf10_split",
            outputs=[f"{SF10_SPLIT}/workload.csv", f"{SF10_SPLIT}/test.csv", f"{SF10_SPLIT}/calib.csv"],
            inputs=[f"{GEN_SF10}/workload.csv"],
            cmd=None,
            fn=split_sf10_r9,
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
            outputs=[f"{SPLIT}/enc_cache.pkl"],
            cmd=None,
            fn=seed_caches,
            deps=["split", "sf10_split"],
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
        # 8-family scratch table on the new split (same budgets as r8:
        # every candidate's report accuracy must come from the SAME
        # test set for the tournament to mean anything)
        Phase(
            "train9",
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
                "DQO_AUG_GERELT4": "0",
                "DQO_EPOCHS_GERELT4": "40",
                "DQO_EMBED_GERELT4": "32",
                "DQO_HIDDEN_GERELT4": "32",
            },
            deps=["warm_cache"],
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
        Phase(
            "ft_gru_aug",
            outputs=[f"{FT_AUG}/finetune_gru.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SPLIT}/workload.csv",
                f"{INIT}/model_gru.json",
                "gru",
                FT_AUG,
                ".data/sf1",
                f"{SPLIT}/test.csv",
                f"{SPLIT}/calib.csv",
            ],
            env={**env, "DQO_EPOCHS": "30", "DQO_LR": "1e-3", "DQO_AUG": "2"},
            requires=[f"{INIT}/model_gru.json"],
            deps=["warm_cache", "freeze_init"],
        ),
        # gerelt4 warm-start (VERDICT r8 item 7): continue the round-8
        # aug0 checkpoint — the first time a completed gerelt4 can be
        # warm-started — for 60 more epochs on the bigger corpus
        Phase(
            "gerelt4_ft",
            outputs=[f"{FT_G4}/finetune_gerelt4.json"],
            inputs=[f"{SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SPLIT}/workload.csv",
                ".data/est_r8_out/gerelt4/model_gerelt4.json",
                "gerelt4",
                FT_G4,
                ".data/sf1",
                f"{SPLIT}/test.csv",
                f"{SPLIT}/calib.csv",
            ],
            env={
                **env,
                "DQO_EPOCHS": "60",
                "DQO_LR": "1e-3",
                "OMP_NUM_THREADS": "4",
                "OPENBLAS_NUM_THREADS": "4",
            },
            requires=[".data/est_r8_out/gerelt4/model_gerelt4.json"],
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
        # sf10 fine-tune on the FULL extended sf10 corpus (VERDICT r8
        # item 4), warm from the frozen r8 sf1 winner — the measured
        # per-scale-fine-tune protocol (joint training lost twice in r8
        # and is retired)
        Phase(
            "sf10_ft",
            outputs=[f"{FT_SF10}/finetune_gru.json"],
            inputs=[f"{SF10_SPLIT}/workload.csv"],
            cmd=[
                sys.executable,
                "tools/finetune_estimator.py",
                f"{SF10_SPLIT}/workload.csv",
                f"{INIT}/model_gru.json",
                "gru",
                FT_SF10,
                ".data/sf10",
                f"{SF10_SPLIT}/test.csv",
                f"{SF10_SPLIT}/calib.csv",
            ],
            env={**env_sf10, "DQO_EPOCHS": "60", "DQO_LR": "1e-3"},
            requires=[f"{INIT}/model_gru.json", f"{SF10_SPLIT}/workload.csv"],
            deps=["warm_cache_sf10", "freeze_init"],
        ),
        Phase(
            "pick_best",
            outputs=[f"{BEST}/choice.json"],
            inputs=[f"{OUT}/report.json", f"{FT}/finetune_gru.json"],
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
            env={"DQO_FT_DIRS_EXTRA": f"{FT_AUG},{FT_G4}", "DQO_SWEEP_DIRS": SWEEP},
            deps=["train9", "ft_gru", "ft_gru_aug", "gerelt4_ft", "gru_rebal"],
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
        ("gerelt4_ft60_warm_r8", FT_G4, "gerelt4"),
        ("gru_sf10_ft60", FT_SF10, "gru"),
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
    from collections import Counter

    from deep_query_optimization_spark.estimator import QueriesDataset

    hists = {}
    for tag, p in (("test", "test.csv"), ("train", "workload.csv")):
        hists[tag] = dict(
            sorted(Counter(QueriesDataset.load(str(REPO / SPLIT / p)).buckets()).items())
        )
    out = {
        "protocol": (
            "round-9 rebalanced split: no bucket's test set exceeds 40% of "
            "its total rows (the r8 floor left bucket 6 with more test than "
            "train rows and buckets 4-5 at 0.00 accuracy); excess old test "
            "rows moved to TRAIN (leak-safe direction), new 4-64s rows from "
            "the quiet double-run generator allocated mostly to TRAIN."
        ),
        "corpus": {k: rep.get(k) for k in ("n", "bucket_histogram", "augmented_rows") if k in rep},
        "train_bucket_histogram": {str(k): v for k, v in hists["train"].items()},
        "test_bucket_histogram": {str(k): v for k, v in hists["test"].items()},
        "models": rep.get("models", {}),
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
