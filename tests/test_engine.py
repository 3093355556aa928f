"""DQOEngine facade test — the full reference lifecycle in miniature."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_engine_lifecycle(spark, sf_dir, tmp_path):
    from deep_query_optimization_spark.engine import DQOEngine
    from deep_query_optimization_spark.generator.partitioner import Log2Partitioner

    engine = DQOEngine(spark, sf_dir, snapshot_path=str(tmp_path / "schema.json"))
    db = engine.snapshot()
    assert len(db) == 10
    assert (tmp_path / "schema.json").exists()

    # snapshot cache hit
    engine2 = DQOEngine(spark, sf_dir, snapshot_path=str(tmp_path / "schema.json"))
    assert len(engine2.snapshot()) == 10

    ds = engine.generate_workload(8, seed=1, partitioner=Log2Partitioner(-3, 0))
    assert len(ds.rows) >= 8

    report = engine.train_estimator(ds, epochs=30)
    assert "accuracy" in report["train"]

    est = engine.estimate("SELECT COUNT(*) AS c FROM orders")
    assert est > 0
    assert -3 <= engine.estimate_bucket("SELECT COUNT(*) AS c FROM orders") <= 8

    rt = engine.run("SELECT MIN(o_totalprice) AS m FROM orders")
    assert rt > 0


def test_engine_estimate_requires_training(spark, sf_dir):
    from deep_query_optimization_spark.engine import DQOEngine

    engine = DQOEngine(spark, sf_dir)
    with pytest.raises(RuntimeError):
        engine.estimate("SELECT 1")
