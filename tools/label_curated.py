"""Label a hand-curated list of SQL queries into an existing corpus.

The balanced generator's guided climbs rarely LAND in the sf10
45-181 s band: the workload's runtime distribution has a cliff there
(one extra join predicate jumps ~40 s queries past 128 s), so random
mutation spends a quiet window oscillating around the band. But the
round-11 hint report (reports/learned_hints_sf10_slow_r11.json)
documents a deterministic predicate ladder through exactly that band —
drop/tighten ``l_discount`` / ``l_tax`` / ``o_orderdate`` on the
events x lineitem family spans 33 -> 77 s. This tool measures curated
rungs of that ladder under the SAME protocol as generated rows
(run-twice-keep-second, watchdog cap, quiet-window sentinel) and
appends them to the corpus with SQL-text dedup — provenance differs,
measurement discipline does not. The reference's corpora likewise mix
driver strategies over one labeled pool (``dqo/lab/drivers/``).

Usage:
    python tools/label_curated.py <sf_dir> <variants.sql> <corpus_dir>

``variants.sql``: one SQL statement per line; blank lines and ``#``
comments ignored. Env: DQO_TIMEOUT_S (default 260), DQO_BUDGET_S
(default 1800), DQO_HOLD_QUIET=1 to raise the sentinel.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.engine import DQOEngine  # noqa: E402
from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, variants_path, corpus = sys.argv[1], Path(sys.argv[2]), Path(sys.argv[3])
    csv_path = corpus / "workload.csv"
    timeout_s = float(os.environ.get("DQO_TIMEOUT_S", "260"))
    budget_s = float(os.environ.get("DQO_BUDGET_S", "1800"))

    variants = [
        ln.strip()
        for ln in variants_path.read_text().splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]

    spark = get_spark("dqo-label-curated")
    spark.sparkContext.setLogLevel("ERROR")
    engine = DQOEngine(spark, sf_dir, snapshot_path=str(corpus / "schema.json"))
    engine.runner.timeout_s = timeout_s
    engine.runner.double_run = True
    engine.runner.wedge_cap_factor = 3.0

    ds = QueriesDataset.load(str(csv_path)) if csv_path.exists() else QueriesDataset()
    seen = {sql for sql, *_ in ds.rows}

    import contextlib

    hold = contextlib.ExitStack()
    if os.environ.get("DQO_HOLD_QUIET") == "1":
        from deep_query_optimization_spark.quiet import hold_quiet_window

        load = hold.enter_context(hold_quiet_window())
        print(f"holding quiet window (loadavg at start {load})", flush=True)

    deadline = time.monotonic() + budget_s
    labeled = 0
    with hold:
        for i, sql in enumerate(variants):
            if sql in seen:
                print(f"[{i}] skip (already in corpus)", flush=True)
                continue
            if time.monotonic() > deadline:
                print("budget exhausted", flush=True)
                break
            if engine.runner.wedged:
                print("runner wedged — stopping", flush=True)
                break
            try:
                rt = engine.runner.time(sql)
            except Exception as exc:  # noqa: BLE001 — one bad rung must not kill the run
                print(f"[{i}] FAILED: {exc}", flush=True)
                continue
            ds.add(sql, rt)
            seen.add(sql)
            ds.save(str(csv_path))  # checkpoint per row — labels are expensive
            labeled += 1
            print(f"[{i}] {rt:.2f}s  ({labeled} labeled)", flush=True)
    print(f"done: {labeled} new rows -> {csv_path}", flush=True)


if __name__ == "__main__":
    main()
