"""Patch corpus labels in place from a quiet relabel run.

Companion to ``tools/relabel_workload.py``: when a slice of a corpus
was labeled under transient box contention (e.g. a verification suite
overlapping the generator window), relabel just that slice quietly and
splice the clean runtimes back into the corpus by SQL identity. Rows
absent from the relabel CSV keep their stored label; relabeled rows
report their old -> new bucket movement so the patch is auditable.

Usage:
    python tools/patch_labels.py workload_csv relabeled_csv
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402
from deep_query_optimization_spark.estimator.metrics import bucketize  # noqa: E402


def main() -> None:
    workload_csv, relabeled_csv = sys.argv[1], sys.argv[2]
    ds = QueriesDataset.load(workload_csv)
    fixes = {s: rt for s, rt, *_ in QueriesDataset.load(relabeled_csv).rows}
    out = QueriesDataset()
    patched = moved = 0
    for sql, rt, plan in ds.rows:
        if sql in fixes:
            patched += 1
            if bucketize(fixes[sql]) != bucketize(rt):
                moved += 1
            rt = fixes[sql]
        out.add(sql, rt, plan)
    out.save(workload_csv)
    print(
        f"patched {patched}/{len(ds.rows)} labels in {workload_csv} "
        f"({moved} changed log2 bucket)"
    )


if __name__ == "__main__":
    main()
