"""SQL text → set-based ``Query`` IR, via Spark's own analyzer.

Reference parity: ``SQLParser.to_query`` (``dqo/relational/__init__.py:33-34``),
which drives a hand-written PLY grammar (``dqo/relational/sql/ast.py:178-469``
+ ``dqo/relational/tree/parser.py:17-51``). We deliberately do NOT port the
grammar — Spark already ships a production SQL parser + analyzer. We run
``spark.sql(sql)`` and walk the ANALYZED logical plan (names resolved,
nothing optimized away yet) back into the mutable ``Query``:

    SQL text ──spark.sql──▶ analyzed plan JSON ──walker──▶ Query

This closes the loop the reference closes with PLY: an EXISTING workload
(CSV datasets of SQL text, ``dqo/datasets/__init__.py:36-267``) can be
lifted into the IR for guided mutation, augmentation, and predicate-merge
rewriting — not just queries the generators created themselves.

Supported surface = exactly what ``Query.to_sql`` emits (the reference
grammar's executable subset): SELECT of plain/aggregated columns, FROM
with comma joins + aliases, WHERE conjunctions of join predicates and
``col ⊗ literal`` conditions (`` > < = >= <= != LIKE / NOT LIKE / IN /
BETWEEN / IS [NOT] NULL``), GROUP BY implied by mixed projections.
Anything else (OR, subqueries, expressions over columns, set ops, limits)
raises ``UnsupportedSQL`` — the IR cannot represent it, and a silent
partial parse would corrupt generated workloads.

``to_sql ∘ parse`` is a fixed point, and for IR-emitted SQL one parse
reproduces the exact Query (property-tested in
``tests/test_sql_parser.py``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from deep_query_optimization_spark.catalog import Database, DataType
from deep_query_optimization_spark.relational.models import (
    ColumnRef,
    Condition,
    Join,
    Projection,
    TableRef,
)
from deep_query_optimization_spark.relational.query import Query


class UnsupportedSQL(ValueError):
    """The SQL is valid Spark SQL but exceeds the Query IR's surface."""


_CMP = {
    "EqualTo": "=",
    "GreaterThan": ">",
    "LessThan": "<",
    "GreaterThanOrEqual": ">=",
    "LessThanOrEqual": "<=",
}
# flip table for literal-on-the-left canonicalization (reference
# ``canonize_``, ``node.py:254-257``)
_FLIP = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "=": "=", "!=": "!="}

_AGG = {"Min": "MIN", "Max": "MAX", "Sum": "SUM", "Average": "AVG", "Count": "COUNT"}

_SPARK_DTYPE = {
    "byte": DataType.NUMBER,
    "short": DataType.NUMBER,
    "integer": DataType.NUMBER,
    "long": DataType.NUMBER,
    "float": DataType.FLOAT,
    "double": DataType.FLOAT,
    "string": DataType.STRING,
    "boolean": DataType.BOOL,
    "timestamp": DataType.TIME,
    "date": DataType.TIME,
}


@dataclass
class _Node:
    """One Catalyst TreeNode (plan or expression) from ``toJSON``."""

    cls: str
    raw: dict
    children: list["_Node"] = field(default_factory=list)


def _build(nodes: list[dict], i: int = 0) -> tuple[_Node, int]:
    """Catalyst ``toJSON`` flattens trees into preorder arrays with
    ``num-children`` — same rebuild as ``plans/parser.py:117-142``."""
    raw = nodes[i]
    node = _Node(raw.get("class", "").rsplit(".", 1)[-1], raw)
    j = i + 1
    for _ in range(int(raw.get("num-children", 0))):
        child, j = _build(nodes, j)
        node.children.append(child)
    return node, j


def _expr(tree_json: list) -> _Node:
    node, _ = _build(tree_json, 0)
    return node


def _strip_cast(n: _Node) -> _Node:
    """The analyzer inserts implicit Casts (decimal literal vs double
    column, int vs long); the IR stores raw values, so peel them."""
    while n.cls in ("Cast", "AnsiCast", "PromotePrecision", "CheckOverflow") and n.children:
        n = n.children[0]
    return n


def _qualifier_alias(raw: dict) -> str | None:
    """AttributeReference.qualifier serializes as '[t1]' (string) or
    '[spark_catalog, default, x]'; empty is []. Take the last part."""
    q = raw.get("qualifier")
    if isinstance(q, str) and q.startswith("["):
        parts = [p.strip() for p in q[1:-1].split(",") if p.strip()]
        return parts[-1] if parts else None
    return None


def _literal_value(raw: dict):
    dt = str(raw.get("dataType", ""))
    v = raw.get("value")
    if v is None:
        raise UnsupportedSQL("NULL literal")
    if dt in ("integer", "long", "short", "byte"):
        return int(v)
    if dt in ("double", "float"):
        return float(v)
    if dt.startswith("decimal"):
        s = str(v)
        return float(s) if "." in s or "e" in s.lower() else int(s)
    if dt == "boolean":
        return v in (True, "true", "TRUE", 1)
    if dt in ("string", "timestamp", "date"):
        return str(v)
    raise UnsupportedSQL(f"literal type {dt}")


class _Walker:
    def __init__(self, db: Database | None) -> None:
        self.db = db
        self.query = Query()
        self.alias_to_ref: dict[str, TableRef] = {}
        self._per_name: dict[str, int] = {}

    # -- relations ------------------------------------------------------

    def bind_relations(self, node: _Node) -> None:
        """Collect base-table scans in FROM (preorder = left-deep join =
        FROM clause) order; ordinal = occurrence rank per base name, so
        re-parsing ``to_sql`` output reconstructs the original
        ``TableRef`` identities (to_sql aliases sorted relations in
        exactly this order)."""
        if node.cls == "SubqueryAlias":
            alias = node.raw.get("identifier", {}).get("name", "")
            base = alias
            probe = node
            while probe.children:
                probe = probe.children[0]
                if probe.cls == "SubqueryAlias":
                    ident = probe.raw.get("identifier", {})
                    if isinstance(ident, dict) and ident.get("name"):
                        base = str(ident["name"]).rsplit(".", 1)[-1]
                elif probe.cls == "View":
                    # base name settled; whatever sits below is the view
                    # DEFINITION (e.g. the events nanos-ts rebuild), not
                    # a derived table in the user's query
                    ident = probe.raw.get("desc", {}).get("identifier", {})
                    if isinstance(ident, dict) and ident.get("name"):
                        base = str(ident["name"]).rsplit(".", 1)[-1]
                    break
                elif probe.cls in ("LogicalRelation", "LocalRelation", "HiveTableRelation"):
                    break
                else:
                    # derived table (subquery / limit / project below the
                    # alias) — not a base-relation scan the IR can hold
                    raise UnsupportedSQL(f"derived table under alias {alias}: {probe.cls}")
            if alias in self.alias_to_ref:
                raise UnsupportedSQL(f"duplicate alias {alias}")
            ordinal = self._per_name.get(base, 0)
            self._per_name[base] = ordinal + 1
            ref = TableRef(base, ordinal)
            self.alias_to_ref[alias] = ref
            self.query.add_relation(ref)
            return  # don't descend: inner SQA chain is the same scan
        if node.cls in ("Join", "Filter"):
            for c in node.children:
                self.bind_relations(c)
            return
        if node.cls in ("LogicalRelation", "LocalRelation", "View"):
            raise UnsupportedSQL("unaliased bare relation scan")
        raise UnsupportedSQL(f"FROM construct {node.cls}")

    # -- columns --------------------------------------------------------

    def column(self, n: _Node) -> ColumnRef:
        n = _strip_cast(n)
        if n.cls != "AttributeReference":
            raise UnsupportedSQL(f"expected column, got {n.cls}")
        name = str(n.raw.get("name"))
        alias = _qualifier_alias(n.raw)
        if alias is not None and alias in self.alias_to_ref:
            ref = self.alias_to_ref[alias]
        elif len(self.alias_to_ref) == 1:
            ref = next(iter(self.alias_to_ref.values()))
        else:
            raise UnsupportedSQL(f"cannot resolve table of column {name}")
        dtype = None
        if self.db is not None and ref.name in self.db:
            try:
                dtype = self.db[ref.name][name].data_type
            except KeyError:
                dtype = None
        if dtype is None:
            dtype = _SPARK_DTYPE.get(str(n.raw.get("dataType", "")).split("(")[0], DataType.STRING)
        return ColumnRef(ref, name, dtype)

    # -- predicates -----------------------------------------------------

    def conjuncts(self, n: _Node) -> None:
        if n.cls == "And":
            self.conjuncts(n.children[0])
            self.conjuncts(n.children[1])
            return
        self.predicate(n)

    def predicate(self, n: _Node) -> None:
        if n.cls == "Not":
            inner = n.children[0]
            if inner.cls == "EqualTo":
                self._binary(inner, "!=")
                return
            if inner.cls == "Like":
                col = self.column(inner.children[0])
                lit = _strip_cast(inner.children[1])
                self.query.add_condition(Condition(col, "NOT LIKE", _literal_value(lit.raw)))
                return
            raise UnsupportedSQL(f"NOT {inner.cls}")
        if n.cls == "Like":
            col = self.column(n.children[0])
            lit = _strip_cast(n.children[1])
            self.query.add_condition(Condition(col, "LIKE", _literal_value(lit.raw)))
            return
        if n.cls == "Between":
            # RuntimeReplaceable: num-children counts only the rewritten
            # replacement; the original operands live in the input/
            # lower/upper fields — parse those to keep BETWEEN a single
            # IR condition (exact round trip)
            col = self.column(_expr(n.raw["input"]))
            lo = _literal_value(_strip_cast(_expr(n.raw["lower"])).raw)
            hi = _literal_value(_strip_cast(_expr(n.raw["upper"])).raw)
            self.query.add_condition(Condition(col, "BETWEEN", (lo, hi)))
            return
        if n.cls == "In":
            col = self.column(n.children[0])
            vals = tuple(_literal_value(_strip_cast(c).raw) for c in n.children[1:])
            self.query.add_condition(Condition(col, "IN", vals))
            return
        if n.cls in ("IsNull", "IsNotNull"):
            col = self.column(n.children[0])
            op = "IS NULL" if n.cls == "IsNull" else "IS NOT NULL"
            self.query.add_condition(Condition(col, op))
            return
        if n.cls in _CMP:
            self._binary(n, _CMP[n.cls])
            return
        raise UnsupportedSQL(f"predicate {n.cls}")

    def _binary(self, n: _Node, op: str) -> None:
        left, right = _strip_cast(n.children[0]), _strip_cast(n.children[1])
        l_attr = left.cls == "AttributeReference"
        r_attr = right.cls == "AttributeReference"
        if l_attr and r_attr:
            self.query.add_join(Join(self.column(left), self.column(right), op))
        elif l_attr:
            self.query.add_condition(Condition(self.column(left), op, _literal_value(right.raw)))
        elif r_attr:
            # literal ⊗ col → canonical col ⊗' literal
            self.query.add_condition(Condition(self.column(right), _FLIP[op], _literal_value(left.raw)))
        else:
            raise UnsupportedSQL(f"{op} between two literals/expressions")

    # -- projections ----------------------------------------------------

    def projection(self, entry: list) -> None:
        n = _expr(entry)
        if n.cls == "Alias":
            n = n.children[0]
        n = _strip_cast(n)
        if n.cls == "AttributeReference":
            self.query.add_projection(Projection(self.column(n)))
            return
        if n.cls == "AggregateExpression":
            fn_node = n.children[0]
            func = _AGG.get(fn_node.cls)
            if func is None or not fn_node.children:
                raise UnsupportedSQL(f"aggregate {fn_node.cls}")
            self.query.add_projection(Projection(self.column(fn_node.children[0]), func))
            return
        raise UnsupportedSQL(f"projection {n.cls}")

    # -- plan -----------------------------------------------------------

    def walk(self, root: _Node) -> Query:
        node = root
        proj_entries: list[list] | None = None
        if node.cls == "Project":
            proj_entries = node.raw.get("projectList", [])
            node = node.children[0]
        elif node.cls == "Aggregate":
            # grouping keys re-appear in aggregateExpressions as the
            # plain projections — parse only the latter
            proj_entries = node.raw.get("aggregateExpressions", [])
            node = node.children[0]
        if proj_entries is None:
            raise UnsupportedSQL(f"top-level {root.cls}")
        self.bind_relations(node)
        # second pass: predicates (relations are bound now)
        stack = [node]
        while stack:
            n = stack.pop()
            if n.cls == "Filter":
                self.conjuncts(_expr(n.raw["condition"]))
                stack.extend(n.children)
            elif n.cls == "Join":
                jt = json.dumps(n.raw.get("joinType", "")).lower()
                if "inner" not in jt and "cross" not in jt:
                    raise UnsupportedSQL(f"join type {jt}")
                cond = n.raw.get("condition")
                if cond:
                    self.conjuncts(_expr(cond))
                stack.extend(n.children)
            # SubqueryAlias leaves: already bound, nothing below matters
        for entry in proj_entries:
            self.projection(entry)
        return self.query


def parse_sql(spark: SparkSession, sql: str, db: Database | None = None) -> Query:
    """Parse SQL text into the mutable ``Query`` IR.

    The referenced tables must be resolvable by Spark (registered temp
    views — ``catalog.load_tables``). ``db`` supplies column dtypes so
    parsed ``ColumnRef``s are identical to generator-built ones; without
    it dtypes fall back to a Spark-type mapping."""
    df = spark.sql(sql)
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
    root, _ = _build(nodes, 0)
    return _Walker(db).walk(root)
