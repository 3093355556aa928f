"""Spark plan ingestion — the analog of the reference's Postgres
EXPLAIN parser.

Reference ``dqo/db/execution_plan.py`` parsed Postgres
``EXPLAIN (FORMAT JSON)`` into ScanOp/JoinOp/NestedLoopOp/AggregateOp
(§2.3) and needed a separate merge step to overlay the physical join
order onto the logical tree (``gerelt/v20/encoder.py:705-742``). With
Spark we featurize the engine's OWN optimized plan — no merge hack:
``df._jdf.queryExecution().optimizedPlan().toJSON()`` is the exact tree
Catalyst will execute, join order included.

Two ingestion paths:
- ``parse_optimized_plan``: optimized logical plan JSON → ``PlanNode``
  tree with the reference's node vocabulary {relation, selection, join,
  projection, aggregation, other}.
- ``physical_summary``: executed-plan string → physical operator counts
  + pushed-filter / partition-pruning evidence (the reference's ScanOp
  ``Index Cond`` analog is parquet pushdown).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Catalyst class suffix → reference node vocabulary
_KIND_MAP = {
    "LogicalRelation": "relation",
    "HiveTableRelation": "relation",
    "UnresolvedRelation": "relation",
    "LocalRelation": "relation",
    "Filter": "selection",
    "Join": "join",
    "Project": "projection",
    "Aggregate": "aggregation",
    "SubqueryAlias": "alias",
    "GlobalLimit": "limit",
    "LocalLimit": "limit",
    "Sort": "sort",
    "Window": "window",
    "Union": "union",
    "Distinct": "distinct",
    "Deduplicate": "distinct",
}


@dataclass
class PlanNode:
    kind: str
    cls: str
    children: list["PlanNode"] = field(default_factory=list)
    condition: str = ""
    join_type: str = ""
    relation: str = ""
    columns: list[str] = field(default_factory=list)

    def preorder(self) -> list["PlanNode"]:
        out = [self]
        for c in self.children:
            out.extend(c.preorder())
        return out

    def postorder(self) -> list["PlanNode"]:
        out: list[PlanNode] = []
        for c in self.children:
            out.extend(c.postorder())
        out.append(self)
        return out

    def bfs(self) -> list["PlanNode"]:
        out, queue = [], [self]
        while queue:
            n = queue.pop(0)
            out.append(n)
            queue.extend(n.children)
        return out

    def count(self, kind: str) -> int:
        return sum(1 for n in self.preorder() if n.kind == kind)


def _extract_columns(node: dict) -> list[str]:
    cols: list[str] = []
    for key in ("projectList", "output", "aggregateExpressions"):
        v = node.get(key)
        if isinstance(v, list):
            for item in v:
                if isinstance(item, list):
                    for attr in item:
                        if isinstance(attr, dict) and attr.get("name"):
                            cols.append(str(attr["name"]))
                            break
    return cols


def _condition_text(node: dict) -> str:
    cond = node.get("condition") or node.get("joinCondition")
    return json.dumps(cond)[:2000] if cond else ""


def _relation_name(node: dict) -> str:
    rel = node.get("relation")
    if isinstance(rel, list) and rel:
        return str(rel[0]) if isinstance(rel[0], str) else ""
    for key in ("tableIdentifier", "identifier", "multipartIdentifier"):
        if node.get(key):
            return str(node[key])
    cs = node.get("catalogTable")
    if isinstance(cs, dict):
        return str(cs.get("identifier", ""))
    return ""


def parse_plan_json(plan_json: str) -> PlanNode:
    """Catalyst ``TreeNode.toJSON`` is a preorder-flattened array with
    ``num-children`` per node — rebuild the tree recursively."""
    nodes = json.loads(plan_json)

    def build(i: int) -> tuple[PlanNode, int]:
        raw = nodes[i]
        cls = raw.get("class", "").rsplit(".", 1)[-1]
        kind = _KIND_MAP.get(cls, "other")
        node = PlanNode(
            kind=kind,
            cls=cls,
            condition=_condition_text(raw),
            join_type=str(raw.get("joinType", "")) if kind == "join" else "",
            relation=_relation_name(raw) if kind == "relation" else "",
            columns=_extract_columns(raw),
        )
        n_children = int(raw.get("num-children", 0))
        j = i + 1
        for _ in range(n_children):
            child, j = build(j)
            node.children.append(child)
        return node, j

    root, _ = build(0)
    return root


def parse_optimized_plan(df: DataFrame) -> PlanNode:
    return parse_plan_json(df._jdf.queryExecution().optimizedPlan().toJSON())


# ---------------------------------------------------------------------------
# physical plan summary (§2.3 mapping of execution_plan.py)
# ---------------------------------------------------------------------------

_PHYSICAL_OPS = (
    "FileScan",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Exchange",
    "Sort",
    "Window",
    "TakeOrderedAndProject",
    "WholeStageCodegen",
)


def physical_summary(physical_plan: str) -> dict:
    """Operator counts + pushdown evidence from the executed-plan text.
    ``pushed_filters`` non-empty is the proof that a predicate reached
    the parquet scan (the scale property SURVEY §0 demands we verify).

    AQE plans print both '== Final Plan ==' and '== Initial Plan =='
    sections; only the final (actually executed) one is counted."""
    if "== Final Plan ==" in physical_plan:
        physical_plan = physical_plan.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    counts = {op: len(re.findall(rf"\b{op}\b", physical_plan)) for op in _PHYSICAL_OPS}
    # codegen spans print as '*(n)' prefixes in executedPlan text (the
    # literal word only appears in formatted explain) — count distinct ids
    codegen_ids = set(re.findall(r"\*\((\d+)\)", physical_plan))
    counts["WholeStageCodegen"] = max(counts.get("WholeStageCodegen", 0), len(codegen_ids))
    # filter lists may be truncated by Spark ('Great...') — accept a
    # missing closing bracket
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", physical_plan)
    read_schema = re.findall(r"ReadSchema: ([^\n]*)", physical_plan)
    partition_filters = re.findall(r"PartitionFilters: \[([^\]\n]*)", physical_plan)
    return {
        "counts": {k: v for k, v in counts.items() if v},
        "pushed_filters": [p for p in pushed if p.strip()],
        "partition_filters": [p for p in partition_filters if p.strip()],
        "read_schema": read_schema,
    }


def physical_summary_of(df: DataFrame) -> dict:
    return physical_summary(df._jdf.queryExecution().executedPlan().toString())
