"""Estimator harness tests: datasets, metrics, model training, and the
full reference pipeline (generate → execute → encode → train → eval)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from deep_query_optimization_spark.estimator import MLPCostModel, QueriesDataset, bucketize, mae, mcc_metrics
from deep_query_optimization_spark.estimator.metrics import (
    confusion_matrix,
    maximize_binary_split,
    per_bucket_errors,
)


def test_bucketize_matches_reference_formula():
    assert bucketize(1.0) == 0
    assert bucketize(0.125) == -3
    assert bucketize(0.01) == -3  # clipped
    assert bucketize(300) == 8  # clipped
    assert bucketize(5.0) == round(math.log2(5.0))


def test_dataset_csv_roundtrip(tmp_path):
    ds = QueriesDataset()
    ds.add("SELECT 1", 0.5, '{"plan": true}')
    ds.add('SELECT "q,uote"', 2.0)
    p = tmp_path / "d.csv"
    ds.save(str(p))
    ds2 = QueriesDataset.load(str(p))
    assert ds2.rows == ds.rows


def test_stratified_split_covers_buckets():
    ds = QueriesDataset()
    for i in range(40):
        ds.add(f"SELECT {i}", 0.1)  # bucket -3
    for i in range(40):
        ds.add(f"SELECT {i + 100}", 4.0)  # bucket 2
    train, test = ds.stratified_split(0.25, seed=1)
    assert len(train.rows) + len(test.rows) == 80
    assert set(train.buckets()) == set(test.buckets()) == {-3, 2}
    assert 15 <= len(test.rows) <= 25


def test_uniform_split_balances():
    ds = QueriesDataset()
    for i in range(100):
        ds.add(f"a{i}", 0.1)
    for i in range(10):
        ds.add(f"b{i}", 4.0)
    bal = ds.uniform_split(per_bucket=10, seed=0)
    buckets = bal.buckets()
    assert buckets.count(-3) == 10
    assert buckets.count(2) == 10


def test_metrics_perfect_and_degenerate():
    y = [0, 1, 2, -3, 8]
    m = mcc_metrics(y, y)
    assert m["accuracy"] == 1.0
    assert m["macro_f1"] == 1.0
    assert m["kappa"] == pytest.approx(1.0)
    m2 = mcc_metrics(y, [8, 8, 8, 8, 8])
    assert m2["accuracy"] == 0.2
    assert mae(y, y) == 0.0
    assert mae([0, 0], [1, -1]) == 1.0


def test_confusion_and_binary_split():
    y_true = [-3, -3, 0, 0, 4, 4]
    y_pred = [-3, -2, 0, 1, 4, 4]
    cm = confusion_matrix(y_true, y_pred)
    assert cm.sum() == 6
    t, acc = maximize_binary_split(y_true, y_pred)
    assert acc == 1.0  # a threshold separating -3s from 0s/4s exists
    pb = per_bucket_errors(y_true, y_pred)
    assert pb[-3]["exact"] == 0.5 and pb[-3]["over"] == 0.5


def test_mlp_learns_synthetic_cost():
    """Plans with more join nodes → longer runtime; the model must
    learn the monotone relation from pooled node vectors."""
    rng = np.random.default_rng(0)
    width = 20
    plans, runtimes = [], []
    for _ in range(120):
        n_joins = rng.integers(0, 5)
        ids = np.array([2] * n_joins + [0, 5], dtype=np.int64)  # joins + relation + other
        mat = rng.normal(0, 0.1, (len(ids), width))
        mat[:n_joins, 0] = 1.0  # join marker feature
        plans.append((ids, mat))
        runtimes.append(float(2.0**n_joins * 0.5))
    model = MLPCostModel(in_dim=width, embed_dim=16, hidden=16, seed=1)
    losses = model.fit(plans, runtimes, epochs=300, lr=3e-3)
    assert losses[-1] < losses[0] * 0.3
    preds = model.predict(plans)
    targets = np.array([math.log2(t) for t in runtimes])
    corr = np.corrcoef(preds, targets)[0, 1]
    assert corr > 0.8


def test_mlp_save_load_roundtrip(tmp_path):
    model = MLPCostModel(in_dim=8, embed_dim=4, hidden=4, seed=0)
    ids = np.array([0, 1], dtype=np.int64)
    mat = np.ones((2, 8))
    before = model.forward(ids, mat)
    p = tmp_path / "m.json"
    model.save(str(p))
    model2 = MLPCostModel.load(str(p))
    assert model2.forward(ids, mat) == pytest.approx(before)


@pytest.mark.slow
def test_reference_pipeline_end_to_end(spark, tables):
    """The whole dqo loop on live Spark: generate workload → execute+
    analyze → parse plans → encode → train → evaluate (SURVEY §3)."""
    from pathlib import Path

    from deep_query_optimization_spark.catalog import Database
    from deep_query_optimization_spark.generator import RandomQueryGen
    from deep_query_optimization_spark.lab.executor import SparkQueryRunner
    from deep_query_optimization_spark.plans import PlanEncoder
    from deep_query_optimization_spark.plans.parser import parse_plan_json

    root = Path(__file__).resolve().parent.parent
    db = Database.load(str(root / "deep_query_optimization_spark/snapshots/sf0.01_schema.json"))
    runner = SparkQueryRunner(spark, clear_cache=False)
    enc = PlanEncoder(db)

    ds = QueriesDataset()
    plans = []
    for seed in range(12):
        gen = RandomQueryGen(db, seed=seed, max_tables=2, max_conditions=4)
        sql = gen.randomize().to_sql()
        runtime, plan_json, _ = runner.analyze(sql)
        ds.add(sql, runtime, plan_json)
        ids, mat = enc.encode_plan(parse_plan_json(plan_json))
        plans.append((ids, mat))

    assert len(ds.rows) == 12
    model = MLPCostModel(in_dim=enc.width, embed_dim=12, hidden=12, seed=0)
    losses = model.fit(plans, [r for _, r, _ in ds.rows], epochs=50, lr=3e-3)
    assert losses[-1] <= losses[0]
    preds = model.predict(plans)
    pred_buckets = [int(np.clip(round(p), -3, 8)) for p in preds]
    m = mcc_metrics(ds.buckets(), pred_buckets)
    assert 0.0 <= m["accuracy"] <= 1.0  # harness runs end-to-end


def test_evaluate_report_and_artifacts(tmp_path):
    from deep_query_optimization_spark.estimator.evaluate import (
        compare_reports,
        confusion_text,
        evaluation_report,
        save_results,
    )

    y_true = [-3, -3, -2, -2, 0, 0, 1]
    y_pred = [-3, -2, -2, -2, 0, 1, 1]
    rep = evaluation_report(y_true, y_pred)
    assert 0 < rep["metrics"]["accuracy"] < 1
    assert rep["binary_split"]["accuracy"] >= rep["metrics"]["accuracy"]
    txt = confusion_text(y_true, y_pred)
    assert "true\\pred" in txt and "-3" in txt
    p = save_results(str(tmp_path), epoch=7, y_true=y_true, y_pred=y_pred)
    assert p.name.startswith("val_results_7_acc_0.7") and p.suffix == ".json"
    table = compare_reports({"mlp": rep, "baseline": rep})
    assert "mlp" in table and "acc" in table


def test_linear_baseline_learns_join_count():
    from deep_query_optimization_spark.estimator.model import LinearCostModel

    rng = np.random.default_rng(1)
    plans, runtimes = [], []
    for _ in range(80):
        n_joins = int(rng.integers(0, 5))
        ids = np.array([2] * n_joins + [0], dtype=np.int64)
        mat = rng.normal(0, 0.05, (len(ids), 10))
        plans.append((ids, mat))
        runtimes.append(float(2.0**n_joins * 0.25))
    m = LinearCostModel()
    m.fit(plans, runtimes)
    preds = m.predict(plans)
    targets = np.array([math.log2(t) for t in runtimes])
    assert np.corrcoef(preds, targets)[0, 1] > 0.95  # exact linear signal
