"""Lab executor tests — mock-based control flow (reference
``lab/tests/test_query_executor.py:23-62`` style) + one real Spark
integration path."""

from __future__ import annotations

import csv
from dataclasses import dataclass, field

import pytest

from deep_query_optimization_spark.catalog import DataType
from deep_query_optimization_spark.lab.executor import (
    DatasetExecutor,
    FileQueryExecutor,
    QueryLog,
    SparkQueryRunner,
)
from deep_query_optimization_spark.relational import (
    ColumnRef,
    Condition,
    Projection,
    Query,
    TableRef,
)


@dataclass
class FakeRunner:
    """Duck-typed SparkQueryRunner substitute."""

    calls: list[str] = field(default_factory=list)
    runtime: float = 0.05

    def time(self, sql: str) -> float:
        self.calls.append(sql)
        return self.runtime


def test_query_log_rotation(tmp_path):
    log = QueryLog(str(tmp_path / "q.csv"), max_rows=2)
    for i in range(5):
        log.append(f"SELECT {i}", 0.1 * i)
    files = sorted(p.name for p in tmp_path.glob("q*.csv"))
    assert files == ["q.1.csv", "q.2.csv", "q.csv"]
    with open(tmp_path / "q.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["query", "runtime", "plan"]
    assert len(rows) == 3  # header + 2


def test_file_executor_dedup_and_resume(tmp_path):
    qfile = tmp_path / "queries.sql"
    qfile.write_text("SELECT 1\nSELECT 2\nSELECT 1\nSELECT 3\n")
    done = tmp_path / "done.txt"
    runner = FakeRunner()
    ex = FileQueryExecutor(runner=runner, done_path=str(done), shuffle=False)
    out = ex.execute_file(str(qfile))
    assert [s for s, _ in out] == ["SELECT 1", "SELECT 2", "SELECT 3"]  # deduped
    # resume: nothing re-run
    runner2 = FakeRunner()
    ex2 = FileQueryExecutor(runner=runner2, done_path=str(done), shuffle=False)
    assert ex2.execute_file(str(qfile)) == []
    assert runner2.calls == []


def test_dataset_executor_checkpoint_and_drift(tmp_path):
    ckpt = tmp_path / "ckpt.txt"
    runner = FakeRunner(runtime=0.2)
    ex = DatasetExecutor(runner=runner, checkpoint_path=str(ckpt), report_every=2)
    rows = [(f"SELECT {i}", 0.1) for i in range(4)]
    out = ex.execute(rows)
    assert len(out) == 4
    assert ex.reports and ex.reports[0]["mean_drift"] == pytest.approx(2.0)
    # resume skips everything
    runner2 = FakeRunner()
    ex2 = DatasetExecutor(runner=runner2, checkpoint_path=str(ckpt))
    assert ex2.execute(rows) == []


def test_runner_contradiction_short_circuit(spark, tables, tmp_path):
    """A contradictory query must return 0.0 without running a job."""
    log = QueryLog(str(tmp_path / "log.csv"))
    runner = SparkQueryRunner(spark, log=log, clear_cache=False)
    li = TableRef("lineitem")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_condition(Condition(ColumnRef(li, "l_quantity", DataType.FLOAT), ">", 10.0))
    q.add_condition(Condition(ColumnRef(li, "l_quantity", DataType.FLOAT), "<", 5.0))
    assert runner.time_query(q) == 0.0
    with open(tmp_path / "log.csv") as f:
        rows = list(csv.reader(f))
    assert rows[1][2] == "CONTRADICTION"


def test_runner_logs_predictions(spark, tables, tmp_path):
    """With a predictor attached, every timed run logs the (query,
    predicted, actual) triple — estimation serving execution."""
    log = QueryLog(str(tmp_path / "pred.csv"), with_predictions=True)
    runner = SparkQueryRunner(spark, clear_cache=False, log=log, predictor=lambda sql: 0.125)
    rt = runner.time("SELECT MIN(l_quantity) AS m FROM lineitem")
    assert rt > 0
    with open(tmp_path / "pred.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["query", "runtime", "plan", "predicted"]
    assert float(rows[1][3]) == 0.125


def test_runner_times_real_query(spark, tables, tmp_path):
    runner = SparkQueryRunner(spark, clear_cache=False, log=QueryLog(str(tmp_path / "log.csv")))
    rt = runner.time("SELECT MIN(l_quantity) AS m FROM lineitem WHERE l_orderkey > 100")
    assert rt > 0
    rt2, plan_json, physical = runner.analyze("SELECT COUNT(*) AS c FROM orders")
    assert rt2 > 0
    assert "Aggregate" in plan_json
    assert "noop" in physical.lower() or "Scan" in physical


def test_runner_merged_range_executes(spark, tables):
    """Non-contradictory ranges merge and still execute correctly."""
    runner = SparkQueryRunner(spark, clear_cache=False)
    li = TableRef("lineitem")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_condition(Condition(ColumnRef(li, "l_quantity", DataType.FLOAT), ">", 10.0))
    q.add_condition(Condition(ColumnRef(li, "l_quantity", DataType.FLOAT), ">", 20.0))
    assert runner.time_query(q) > 0


def test_timeout_returns_censored_runtime(spark, tables):
    """A query canceled by the watchdog returns its elapsed wall (a
    right-censored label at the cap) instead of raising — workload
    generation must survive the slow queries it goes looking for."""
    runner = SparkQueryRunner(spark, clear_cache=False, timeout_s=1.0)
    rt = runner.time(
        "SELECT MIN(a.l_quantity * b.l_quantity * c.l_quantity) "
        "FROM lineitem a, lineitem b, lineitem c"
    )
    assert rt >= 1.0
    # the session must remain usable after the cancellation
    assert runner.time("SELECT COUNT(*) AS c FROM orders") > 0
