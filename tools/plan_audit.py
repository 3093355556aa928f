"""Plan-quality audit: run every workload query and check the scale
properties README promises, from the plans Spark actually executed.

Checks per query (where applicable):
- filters reached the parquet scan (PushedFilters non-empty when the
  query filters base columns);
- no CartesianProduct / BroadcastNestedLoopJoin except in queries that
  are intentionally non-equi (theta join, bounded pair generators);
- dimension joins use BroadcastHashJoin;
- WholeStageCodegen present (expressions stayed JVM-side).

Usage: python tools/plan_audit.py [sf_dir] — prints one line per query
plus a summary; exit 1 on violations.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.plans.parser import physical_summary_of  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402
from deep_query_optimization_spark.workload import REGISTRY  # noqa: E402

# queries where a nested-loop/cartesian strategy is the intended plan
NON_EQUI_OK = {
    "join_theta_cross",  # theta join + cross join: BNLJ by design, broadcast side tiny
    "dedup_embedding_cosine",  # bounded pair generator (id_a < id_b)
    "sim_topk_bruteforce",  # probe × corpus scoring, probe broadcast
    "sim_topk_lsh",  # bucket-join + in-bucket pairs
    "stats_histogram",  # scalar min/max broadcast crossJoin
    "stats_moments_strings",  # 1-row x 1-row crossJoin of two scalar aggregates
    "join_self_alias",  # key-equal + '<' residual may plan as BNLJ at tiny scale
    "validate_constraints",  # 1-row x 1-row scalar-aggregate crossJoin (FK summary)
}
# queries that read no base table with filterable columns
NO_PUSHDOWN_EXPECTED = {
    "streaming_sessionize",  # result = batch scan of the stream's file-sink output
    "not_exists_anti",
    "outer_join",
    "derived_table",
    "window_topk_per_group",
    "stats_histogram",
    "stats_moments_strings",
    "time_extract_groupby",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_langid",
    "text_fingerprint_tokens",
    "multimodal_decode",
    "rollup_grouping_sets",
}


def _check_allowlists() -> None:
    """Allowlist names must exist in the registry — renames fail loudly
    instead of silently masking the list's intent."""
    stale = (NON_EQUI_OK | NO_PUSHDOWN_EXPECTED) - set(REGISTRY)
    if stale:
        raise SystemExit(f"stale allowlist entries (not in REGISTRY): {sorted(stale)}")


def main() -> int:
    _check_allowlists()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    violations: list[str] = []
    for name, wq in REGISTRY.items():
        df = wq.fn(spark, sf_dir)
        # collect() (not a noop write) so THIS Dataset's QueryExecution
        # finalizes — a write command wraps the plan in its own QE and
        # leaves df's plan un-executed (isFinalPlan=false, no codegen ids)
        df.collect()
        s = physical_summary_of(df)
        counts = s["counts"]
        notes = []

        if not counts.get("FileScan", 0):
            # Catalyst folded the query to an empty/local relation (e.g.
            # contradictory generated predicates) — the optimal plan
            print(f"{'ok (folded empty)':28s} {name:28s}")
            continue

        oracle = wq.oracle() if callable(wq.oracle) else wq.oracle
        has_filter_words = oracle and " WHERE " in oracle
        if has_filter_words and not s["pushed_filters"] and name not in NO_PUSHDOWN_EXPECTED:
            notes.append("NO-PUSHDOWN")
        bad_nlj = counts.get("CartesianProduct", 0) + counts.get("BroadcastNestedLoopJoin", 0)
        if bad_nlj and name not in NON_EQUI_OK:
            notes.append(f"NESTED-LOOP x{bad_nlj}")
        if not counts.get("WholeStageCodegen", 0) and name != "multimodal_decode":
            notes.append("NO-CODEGEN")
        if name == "bucketed_join_agg":
            # the zero-Exchange claim, asserted in the audit itself: the
            # only shuffle allowed is the post-join groupBy's — a second
            # Exchange means a join input shuffled, i.e. the bucketed
            # layout was not used
            if counts.get("Exchange", 0) > 1:
                notes.append(f"BUCKETED-SHUFFLE x{counts.get('Exchange', 0)}")
            # at scale (sf1+, where AQE no longer broadcasts) the join
            # must be the bucket-local SortMergeJoin; opt in via env
            # because at sf0.01 the broadcast conversion is the right plan
            if os.environ.get("DQO_EXPECT_BUCKETED_SMJ") == "1" and not counts.get(
                "SortMergeJoin", 0
            ):
                notes.append("NO-BUCKETED-SMJ")

        flag = "VIOLATION " + ",".join(notes) if notes else "ok"
        joins = {k: v for k, v in counts.items() if "Join" in k or k == "CartesianProduct"}
        print(f"{flag:28s} {name:28s} joins={joins} pushed={len(s['pushed_filters'])}")
        if notes:
            violations.append(f"{name}: {notes}")

    print(f"\n{len(violations)} violations" + (f": {violations}" if violations else ""))
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
