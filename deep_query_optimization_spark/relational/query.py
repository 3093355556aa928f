"""The set-based ``Query`` — the workload generators' substrate.

Reference ``dqo/relational/query/__init__.py:8-313``. Semantic contract
(reference docstring ``:11-15``): one ``Query`` corresponds to many
equivalent physical trees; two equal queries must produce equal result
sets. Supports mutation with dangling-relation cascade (``:155-209``),
validity = connected equi-join graph with no orphans (``:278-313``),
and deterministic SQL emission with ``t1..tn`` aliasing (``:231-276``).

The emitted SQL is valid in both Spark SQL and ANSI SQL, so a generated
query string can be executed by Spark AND serve as its own DuckDB
oracle.
"""

from __future__ import annotations

from collections import defaultdict

from deep_query_optimization_spark.relational.models import (
    ColumnRef,
    Condition,
    Join,
    Projection,
    TableRef,
)


class Query:
    def __init__(self) -> None:
        self.relations: set[TableRef] = set()
        self.projections: set[Projection] = set()
        self.conditions: set[Condition] = set()
        self.joins: set[Join] = set()

    # ------------------------------------------------------------------
    # mutation (reference Query.add_*/remove_* with cascades, :155-209)
    # ------------------------------------------------------------------

    def add_relation(self, rel: TableRef) -> None:
        self.relations.add(rel)

    def add_projection(self, proj: Projection) -> None:
        self.add_relation(proj.column.table)
        self.projections.add(proj)

    def add_condition(self, cond: Condition) -> None:
        self.add_relation(cond.column.table)
        self.conditions.add(cond)

    def add_join(self, join: Join) -> None:
        join = join.normalized()
        self.add_relation(join.left.table)
        self.add_relation(join.right.table)
        self.joins.add(join)

    def remove_projection(self, proj: Projection) -> None:
        self.projections.discard(proj)

    def remove_condition(self, cond: Condition) -> None:
        self.conditions.discard(cond)

    def remove_join(self, join: Join) -> None:
        self.joins.discard(join.normalized())

    def remove_relation(self, rel: TableRef) -> None:
        """Cascade: drop the relation plus every projection, condition
        and join that references it (reference ``:155-209``)."""
        self.relations.discard(rel)
        self.projections = {p for p in self.projections if p.column.table != rel}
        self.conditions = {c for c in self.conditions if c.column.table != rel}
        self.joins = {j for j in self.joins if rel not in j.tables()}

    # ------------------------------------------------------------------
    # validity (reference :278-313)
    # ------------------------------------------------------------------

    def join_graph(self) -> dict[TableRef, set[TableRef]]:
        g: dict[TableRef, set[TableRef]] = defaultdict(set)
        for rel in self.relations:
            g[rel]  # ensure node exists
        for j in self.joins:
            a, b = j.tables()
            g[a].add(b)
            g[b].add(a)
        return g

    def connected(self) -> bool:
        """The equi-join graph must span all relations (no accidental
        cartesian products — the reference filters them out of training
        data, ``datasets/__init__.py:163-165``)."""
        if len(self.relations) <= 1:
            return True
        g = self.join_graph()
        seen: set[TableRef] = set()
        stack = [next(iter(self.relations))]
        while stack:
            r = stack.pop()
            if r in seen:
                continue
            seen.add(r)
            stack.extend(g[r] - seen)
        return seen == self.relations

    def valid(self) -> bool:
        if not self.relations or not self.projections:
            return False
        refs = [p.column for p in self.projections]
        refs += [c.column for c in self.conditions]
        for j in self.joins:
            refs += [j.left, j.right]
        if any(ref.table not in self.relations for ref in refs):
            return False  # orphan reference
        return self.connected()

    # ------------------------------------------------------------------
    # emission (reference to_sql, :231-276)
    # ------------------------------------------------------------------

    def _aliases(self) -> dict[TableRef, str]:
        """Deterministic t1..tn aliasing by sorted relation identity."""
        return {rel: f"t{i + 1}" for i, rel in enumerate(sorted(self.relations))}

    def to_sql(self) -> str:
        if not self.relations:
            raise ValueError("query has no relations")
        aliases = self._aliases()
        projs = sorted(self.projections)
        select = ", ".join(p.to_sql(aliases[p.column.table]) for p in projs) or "*"
        frm = ", ".join(f"{rel.name} {aliases[rel]}" for rel in sorted(self.relations))
        preds: list[str] = []
        for j in sorted(self.joins):
            preds.append(
                f"{aliases[j.left.table]}.{j.left.column} {j.op} {aliases[j.right.table]}.{j.right.column}"
            )
        preds += sorted(c.to_sql(aliases[c.column.table]) for c in self.conditions)
        sql = f"SELECT {select} FROM {frm}"
        if preds:
            sql += " WHERE " + " AND ".join(preds)
        # mixed aggregate + plain projections need a GROUP BY (extension:
        # the reference only ever emits all-aggregate projection lists)
        plain = [p for p in projs if p.func is None]
        if plain and any(p.func for p in projs):
            sql += " GROUP BY " + ", ".join(p.to_sql(aliases[p.column.table]).split(" AS ")[0] for p in plain)
        return sql

    # ------------------------------------------------------------------

    def copy(self) -> "Query":
        q = Query()
        q.relations = set(self.relations)
        q.projections = set(self.projections)
        q.conditions = set(self.conditions)
        q.joins = set(self.joins)
        return q

    def signature(self) -> tuple:
        return (
            frozenset(self.relations),
            frozenset(self.projections),
            frozenset(self.conditions),
            frozenset(self.joins),
        )

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Query) and self.signature() == other.signature()

    def __hash__(self) -> int:
        return hash(self.signature())

    def __repr__(self) -> str:
        return f"Query({len(self.relations)} rels, {len(self.joins)} joins, {len(self.conditions)} conds, {len(self.projections)} projs)"

    def columns(self) -> list[ColumnRef]:
        out = {p.column for p in self.projections}
        out |= {c.column for c in self.conditions}
        for j in self.joins:
            out |= {j.left, j.right}
        return sorted(out)
