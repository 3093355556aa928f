"""End-to-end estimator training driver — the reference's
``train_tpch.py`` analog (``dqo/estimator/gerelt/v20/train_tpch.py``).

Generates a balanced labeled workload on the given tables, trains the
plan-vector cost model, reports bucket metrics, and saves model +
dataset artifacts.

Usage:
    python tools/train_estimator.py [sf_dir] [n_queries] [out_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.engine import DQOEngine  # noqa: E402
from deep_query_optimization_spark.generator.partitioner import Log2Partitioner  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/dqo_estimator")
    out.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dqo-train-estimator")
    spark.sparkContext.setLogLevel("ERROR")
    engine = DQOEngine(spark, sf_dir, snapshot_path=str(out / "schema.json"))
    engine.snapshot()
    print(f"schema+stats snapshot: {len(engine.db)} tables")

    # local[*] runtimes compress into few log2 buckets — use a narrow
    # partitioner so balancing has something to balance (SURVEY §7 risk 2)
    ds = engine.generate_workload(n, seed=42, partitioner=Log2Partitioner(-3, 2))
    ds.save(str(out / "workload.csv"))
    hist: dict[int, int] = {}
    for b in ds.buckets():
        hist[b] = hist.get(b, 0) + 1
    print(f"workload: {len(ds.rows)} labeled queries, bucket histogram {dict(sorted(hist.items()))}")

    report = engine.train_estimator(ds, epochs=150)
    engine.model.save(str(out / "model.json"))
    with open(out / "report.json", "w") as f:
        json.dump(report, f, indent=1)
    print("train:", {k: round(v, 3) for k, v in report["train"].items()})
    print("test: ", {k: round(v, 3) for k, v in report["test"].items()})

    sql = "SELECT MIN(l.l_extendedprice) FROM lineitem l, orders o WHERE l.l_orderkey = o.o_orderkey"
    print(f"estimate({sql[:50]}...) -> {engine.estimate(sql):.3f}s, bucket {engine.estimate_bucket(sql)}")


if __name__ == "__main__":
    main()
