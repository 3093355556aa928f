"""Merge labeled workload CSVs from parallel generator runs.

Companion to ``tools/gen_workload.py``'s DQO_GEN_SEED knob: two
generators with different seeds label disjoint query streams into
separate dirs; this concatenates them (deduping on SQL text — seed
collisions are rare but a duplicated train/test row would leak) and
writes one ``workload.csv`` plus a copy of the first dir's
``schema.json`` so the trainer reuses the stats snapshot.

Usage: python tools/merge_workloads.py out_dir in_dir [in_dir ...]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402


def main() -> None:
    out = Path(sys.argv[1])
    ins = [Path(p) for p in sys.argv[2:]]
    out.mkdir(parents=True, exist_ok=True)
    merged = QueriesDataset()
    seen: set[str] = set()
    for d in ins:
        ds = QueriesDataset.load(str(d / "workload.csv"))
        dups = 0
        for sql, rt, plan in ds.rows:
            if sql in seen:
                dups += 1
                continue
            seen.add(sql)
            merged.add(sql, rt, plan)
        print(f"{d}: {len(ds.rows)} rows ({dups} duplicate)")
    merged.save(str(out / "workload.csv"))
    schema = ins[0] / "schema.json"
    if schema.exists() and not (out / "schema.json").exists():
        shutil.copy(schema, out / "schema.json")
    hist: dict[int, int] = {}
    for b in merged.buckets():
        hist[b] = hist.get(b, 0) + 1
    print(f"merged: {len(merged.rows)} rows -> {out / 'workload.csv'}")
    print(f"histogram {dict(sorted(hist.items()))}")


if __name__ == "__main__":
    main()
