"""Average the continuous predictions of several trained cost models.

The families err differently (sequence GRUs on deep plan chains,
TreeLSTM on wide ones, set-based models on join-count regimes), so the
mean of their log2-runtime predictions is lower-variance than any
member — the usual bagging argument. Buckets are assigned after
averaging, not before (majority vote over rounded buckets throws away
the sub-bucket signal that makes averaging work).

Usage:
    python tools/ensemble_eval.py out_json member [member ...] \
        [--test csv] [--calib csv] [--sf sf_dir]

where member = family:path_to_model_json (family in mlp/cnn/gru/
treelstm/gerelt4).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.engine import DQOEngine  # noqa: E402
from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402
from deep_query_optimization_spark.estimator.metrics import bucketize, mae, mcc_metrics  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402
from tools.finetune_estimator import LOADERS, TREE_FAMILIES  # noqa: E402
from tools.train_estimator import fit_affine  # noqa: E402


def metrics(preds, rows) -> dict:
    buckets = [bucketize(r) for _, r, _ in rows]
    pred_buckets = [int(np.clip(round(p), -3, 8)) for p in preds]
    m = mcc_metrics(buckets, pred_buckets)
    m["mae"] = mae(buckets, pred_buckets)
    return m


def main() -> None:
    args = sys.argv[1:]
    test_csv = "/root/repo/.data/est_split/test_clean.csv"
    calib_csv = None
    sf_dir = "/root/repo/.data/sf1"
    if "--test" in args:
        i = args.index("--test")
        test_csv = args[i + 1]
        del args[i : i + 2]
    if "--calib" in args:
        i = args.index("--calib")
        calib_csv = args[i + 1]
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    out_json, members = args[0], args[1:]

    spark = get_spark("dqo-ensemble")
    spark.sparkContext.setLogLevel("ERROR")
    engine = DQOEngine(
        spark, sf_dir, snapshot_path=str(Path(test_csv).parent / "schema.json")
    )
    engine.snapshot()
    test = QueriesDataset.load(test_csv)
    calib = QueriesDataset.load(calib_csv) if calib_csv else None

    enc_cache: dict[bool, list] = {}
    calib_cache: dict[bool, list] = {}
    per_member = {}
    all_preds = []
    for spec in members:
        fam, path = spec.split(":", 1)
        model = LOADERS[fam].load(path)
        is_tree = fam in TREE_FAMILIES
        if is_tree not in enc_cache:
            encode = engine.encode_sql_tree if is_tree else engine.encode_sql
            enc_cache[is_tree] = [encode(sql) for sql, _, _ in test.rows]
            if calib is not None:
                calib_cache[is_tree] = [encode(sql) for sql, _, _ in calib.rows]
        preds = np.asarray(model.predict(enc_cache[is_tree]), dtype=float)
        if calib is not None:
            # remove each member's systematic loaded-vs-quiet shift before
            # averaging, so the ensemble mixes comparable scales
            a, b = fit_affine(model, calib_cache[is_tree], calib.rows)
            preds = a * preds + b
        all_preds.append(preds)
        per_member[spec] = metrics(preds, test.rows)
        print(f"{spec}: acc {per_member[spec]['accuracy']:.3f}")

    mean_preds = np.mean(all_preds, axis=0)
    report = {
        "members": per_member,
        "ensemble": metrics(mean_preds, test.rows),
        "test_rows": len(test.rows),
    }
    print(f"ensemble: acc {report['ensemble']['accuracy']:.3f} mae {report['ensemble']['mae']:.3f}")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
