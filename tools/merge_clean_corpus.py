"""Assemble the clean-label training corpus from every quiet-labeled
source, excluding held-out rows.

Inputs are CSVs whose labels were produced under the quiet
run-twice-keep-second protocol (tools/relabel_workload.py output, or
gen_workload.py runs with DQO_DOUBLE_RUN=1). Rows whose SQL appears in
the frozen test/calib files are dropped (split membership was frozen
BEFORE relabeling — tools/split_workload.py rationale), duplicates keep
their first occurrence, and the result is written as ``workload.csv``
in the output dir beside a provenance JSON recording where every row
came from and the bucket histogram — so a training run's corpus is
auditable.

Usage:
    python tools/merge_clean_corpus.py out_dir test_csv calib_csv \
        clean_csv [clean_csv ...]
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.estimator import QueriesDataset  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    test_csv, calib_csv = sys.argv[2], sys.argv[3]
    sources = sys.argv[4:]
    out_dir.mkdir(parents=True, exist_ok=True)

    held: set[str] = set()
    for path in (test_csv, calib_csv):
        held |= {sql for sql, _, _ in QueriesDataset.load(path).rows}

    merged = QueriesDataset()
    seen: set[str] = set()
    provenance: dict[str, dict] = {}
    excluded = 0
    for src in sources:
        ds = QueriesDataset.load(src)
        added = dup = 0
        for sql, rt, plan in ds.rows:
            if sql in held:
                excluded += 1
                continue
            if sql in seen:
                dup += 1
                continue
            seen.add(sql)
            merged.add(sql, rt, plan)
            added += 1
        provenance[src] = {"rows": len(ds.rows), "added": added, "dups": dup}
        print(f"{src}: {added} added, {dup} dups")

    merged.save(str(out_dir / "workload.csv"))
    schema_src = Path(sources[0]).parent / "schema.json"
    if schema_src.exists() and not (out_dir / "schema.json").exists():
        shutil.copy(schema_src, out_dir / "schema.json")

    hist: dict[int, int] = {}
    for b in merged.buckets():
        hist[b] = hist.get(b, 0) + 1
    meta = {
        "rows": len(merged.rows),
        "held_out_excluded": excluded,
        "bucket_histogram": dict(sorted(hist.items())),
        "sources": provenance,
        "protocol": "quiet run-twice-keep-second labels only; test/calib membership frozen pre-relabel",
    }
    with open(out_dir / "corpus_provenance.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(
        f"clean corpus: {len(merged.rows)} rows ({excluded} held-out excluded), "
        f"histogram {dict(sorted(hist.items()))} -> {out_dir}"
    )


if __name__ == "__main__":
    main()
