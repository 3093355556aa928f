"""Measure stats-driven broadcast hints against Catalyst defaults.

Catalyst broadcasts on RAW file size (autoBroadcastJoinThreshold);
``plans.hints.broadcast_by_stats`` broadcasts on estimated POST-FILTER
size from the §2.4 snapshot statistics — the case a selective filter
shrinks a shuffle-sized table under the broadcast budget. For N
generated multi-join queries where the two disagree (a hint fires),
time the default emission and the hinted emission with the
run-twice-keep-second discipline and report per-query + aggregates.

The runtime estimator deliberately plays no role here: broadcast hints
leave the optimized LOGICAL plan encoding bit-identical (see
plans/hints.py), so the gate is the cardinality estimate itself plus a
size margin — mirroring how Spark's own threshold works, but fed by
histogram selectivities instead of raw bytes.

Usage:
    python tools/broadcast_report.py [sf_dir] [schema.json] [n] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.engine import DQOEngine  # noqa: E402
from deep_query_optimization_spark.generator import RandomQueryGen  # noqa: E402
from deep_query_optimization_spark.plans.hints import broadcast_by_stats  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    schema = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/est_split/schema.json"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    out_json = sys.argv[4] if len(sys.argv) > 4 else "reports/broadcast_hints_sf1.json"

    spark = get_spark("dqo-broadcast-hints")
    spark.sparkContext.setLogLevel("ERROR")
    engine = DQOEngine(spark, sf_dir, snapshot_path=schema)
    engine.snapshot()
    engine.runner.timeout_s = float(os.environ.get("DQO_TIMEOUT_S", "120"))
    # DQO_BCAST_MIN_PROBE: stakes floor — only hint when the probe side
    # (largest relation) is big enough that the saved shuffle can clear
    # the broadcast build cost (the suite's one real regression hinted
    # into a ~20 MB probe side)
    min_probe = int(os.environ.get("DQO_BCAST_MIN_PROBE", str(48 * 1024 * 1024)))

    # scan seeds for queries where the hint actually fires — the
    # interesting population is exactly the raw-vs-filtered disagreement
    candidates = []
    seed, scanned = 2000, 0
    while len(candidates) < n and scanned < 600:
        gen = RandomQueryGen(engine.db, seed=seed, max_tables=4, max_conditions=6)
        q = gen.randomize()
        seed += 1
        scanned += 1
        if len(q.relations) < 2 or not q.joins:
            continue
        hinted_sql, decisions = broadcast_by_stats(engine.db, q, min_probe_bytes=min_probe)
        if any(d["hinted"] for d in decisions):
            candidates.append((seed - 1, q, hinted_sql, decisions))
    print(f"{len(candidates)} hint-firing queries from {scanned} seeds", flush=True)

    rows = []
    for qseed, q, hinted_sql, decisions in candidates:
        default_sql = q.to_sql()
        # one warm pass each, then three interleaved timed passes
        # (D H D H D H), per-plan MEDIAN kept — single timings of
        # sub-second plans swing >2x run-to-run, enough to turn a
        # broadcast win into a phantom regression (same discipline as
        # tools/hint_report.py)
        engine.runner.time(default_sql)
        engine.runner.time(hinted_sql)
        td, th = [], []
        for _ in range(3):
            td.append(engine.runner.time(default_sql))
            th.append(engine.runner.time(hinted_sql))
        t_default, t_hinted = sorted(td)[1], sorted(th)[1]
        rows.append(
            {
                "seed": qseed,
                "n_relations": len(q.relations),
                "default_s": round(t_default, 3),
                "hinted_s": round(t_hinted, 3),
                "speedup": round(t_default / max(t_hinted, 1e-6), 3),
                "hints": [d for d in decisions if d["hinted"]],
                "default_sql": default_sql,
                "hinted_sql": hinted_sql,
            }
        )
        print(
            f"seed {qseed}: default {t_default:.2f}s hinted {t_hinted:.2f}s "
            f"({', '.join(d['table'] for d in decisions if d['hinted'])})",
            flush=True,
        )

    summary = {
        "n_queries": len(rows),
        "total_default_s": round(sum(r["default_s"] for r in rows), 2),
        "total_hinted_s": round(sum(r["hinted_s"] for r in rows), 2),
        "speedups": sorted(r["speedup"] for r in rows),
        "regressions_gt_10pct": sum(1 for r in rows if r["speedup"] < 0.9),
    }
    report = {"summary": summary, "queries": rows, "generated_at": time.strftime("%Y-%m-%d")}
    Path(out_json).parent.mkdir(parents=True, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(summary))
    print(f"-> {out_json}")


if __name__ == "__main__":
    from deep_query_optimization_spark.quiet import quiet_window

    # default-vs-hinted timings are only evidence on a quiet box
    with quiet_window():
        main()
