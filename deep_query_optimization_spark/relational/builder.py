"""Mutation builder over the set-based Query.

Reference ``dqo/query_generator/query_builder.py:89-349``: the six
mutations (add/remove projection / condition / relation, plus
``replace_join``), each with a ``can_*`` guard, undo support, and
cascade semantics. ``ValidQueryParts.valid_joins``
(``query_builder.py:48-61``) enumerates type-compatible cross-table
column pairs as candidate equi-joins.
"""

from __future__ import annotations

import random
from collections.abc import Callable

from deep_query_optimization_spark.catalog import Database, DataType
from deep_query_optimization_spark.relational.models import (
    ColumnRef,
    Condition,
    Join,
    Projection,
    TableRef,
)
from deep_query_optimization_spark.relational.query import Query

JOINABLE_TYPES = (DataType.NUMBER, DataType.FLOAT, DataType.STRING, DataType.TIME)


def column_ref(db: Database, table: TableRef, column: str) -> ColumnRef:
    return ColumnRef(table, column, db[table.name][column].data_type)


def valid_joins(db: Database, relations: set[TableRef]) -> list[Join]:
    """All type-compatible cross-relation column pairs (reference
    ``query_builder.py:48-61``)."""
    out: list[Join] = []
    rels = sorted(relations)
    for i, a in enumerate(rels):
        for b in rels[i + 1 :]:
            for ca in db[a.name].columns:
                if ca.data_type not in JOINABLE_TYPES:
                    continue
                for cb in db[b.name].columns:
                    if cb.data_type == ca.data_type:
                        out.append(Join(ColumnRef(a, ca.name, ca.data_type), ColumnRef(b, cb.name, cb.data_type)))
    return out


class QueryBuilder:
    """Stats-aware random mutations with undo.

    ``condition_factory(column_ref, stats, rng) -> Condition`` is
    injected so the literal-picking policy (histogram-driven in
    ``generator.conditions.rand_condition``) stays decoupled.
    """

    def __init__(
        self,
        db: Database,
        query: Query | None = None,
        rng: random.Random | None = None,
        condition_factory: Callable | None = None,
        size_weighted: bool = False,
    ) -> None:
        self.db = db
        self.query = query or Query()
        self.rng = rng or random.Random()
        if condition_factory is None:
            from deep_query_optimization_spark.generator.conditions import rand_condition

            condition_factory = rand_condition
        self.condition_factory = condition_factory
        # size-weighted add_relation: candidate tables weighted by
        # log10(rows). On a modern optimizer every small dim broadcasts
        # for free, so a runtime-targeting loop (GuidedQueryGen broaden)
        # that samples tables uniformly almost never moves the runtime;
        # joining another FACT table is the mutation that does.
        self.size_weighted = size_weighted
        # optional cap on relations per query: joins beyond ~5 relations
        # mostly add optimizer-planning time, not informative runtime
        self.max_relations: int | None = None
        # selectivity-aware condition mutations (guided generation):
        # add_condition samples k candidates and keeps the most
        # RESTRICTIVE (narrowing wants the biggest runtime drop);
        # remove_condition drops the most restrictive (broadening wants
        # the biggest runtime rise). Estimates come from the histogram
        # stats — no query execution.
        self.selectivity_aware = False
        # fine-landing mode (guided generation near its target): when
        # set, selectivity-aware condition mutations pick the candidate
        # whose estimated selectivity is CLOSEST to this value instead
        # of the most extreme one — a 2x-wide runtime window needs a
        # ~1/f nudge, not the biggest available jump (which re-creates
        # the overshoot that relation mutations cause at coarse range)
        self.target_selectivity: float | None = None
        self._undo: list[Query] = []

    def _table_weight(self, name: str) -> float:
        import math

        t = self.db[name]
        rows = t.stats.rows if t.stats is not None and t.stats.rows else 10
        return math.log10(rows + 10)

    # -- undo ----------------------------------------------------------

    def checkpoint(self) -> None:
        self._undo.append(self.query.copy())

    def undo(self) -> bool:
        """Reference ``query_builder.py:146``."""
        if not self._undo:
            return False
        self.query = self._undo.pop()
        return True

    # -- guards (reference can_*, :321-349) ----------------------------

    def can_remove_projection(self) -> bool:
        return len(self.query.projections) > 1

    def can_remove_condition(self) -> bool:
        return len(self.query.conditions) > 0

    def can_remove_relation(self) -> bool:
        return len(self.query.relations) > 1

    def can_add_relation(self) -> bool:
        if self.max_relations is not None and len(self.query.relations) >= self.max_relations:
            return False
        return len(self.query.relations) < len(self.db)

    # -- mutations -----------------------------------------------------

    def _random_column(self, rel: TableRef, types: tuple[DataType, ...] | None = None) -> ColumnRef | None:
        cols = [c for c in self.db[rel.name].columns if types is None or c.data_type in types]
        if not cols:
            return None
        c = self.rng.choice(sorted(cols, key=lambda c: c.name))
        return ColumnRef(rel, c.name, c.data_type)

    def add_projection(self, func: str | None = "MIN") -> bool:
        if not self.query.relations:
            return False
        rel = self.rng.choice(sorted(self.query.relations))
        types = None if func in (None, "COUNT", "MIN", "MAX") else (DataType.NUMBER, DataType.FLOAT)
        col = self._random_column(rel, types)
        if col is None:
            return False
        self.checkpoint()
        self.query.add_projection(Projection(col, func))
        return True

    def remove_projection(self) -> bool:
        if not self.can_remove_projection():
            return False
        self.checkpoint()
        self.query.remove_projection(self.rng.choice(sorted(self.query.projections)))
        return True

    def _one_condition(self):
        if not self.query.relations:
            return None
        rel = self.rng.choice(sorted(self.query.relations))
        col = self._random_column(rel)
        if col is None:
            return None
        stats = self.db[rel.name][col.column].stats
        return self.condition_factory(col, stats, self.rng)

    def add_condition(self) -> bool:
        if self.selectivity_aware:
            from deep_query_optimization_spark.generator.conditions import condition_selectivity

            k = 12 if self.target_selectivity is not None else 4
            cands = [c for c in (self._one_condition() for _ in range(k)) if c is not None]
            if not cands:
                return False
            if self.target_selectivity is not None:
                t = self.target_selectivity
                cond = min(cands, key=lambda c: abs(condition_selectivity(self.db, c) - t))
            else:
                cond = min(cands, key=lambda c: condition_selectivity(self.db, c))
        else:
            cond = self._one_condition()
            if cond is None:
                return False
        self.checkpoint()
        self.query.add_condition(cond)
        return True

    def remove_condition(self) -> bool:
        if not self.can_remove_condition():
            return False
        self.checkpoint()
        conds = sorted(self.query.conditions, key=lambda c: (c.column, c.op, str(c.value)))
        if self.selectivity_aware:
            from deep_query_optimization_spark.generator.conditions import condition_selectivity

            if self.target_selectivity is not None:
                t = self.target_selectivity
                pick = min(conds, key=lambda c: abs(condition_selectivity(self.db, c) - t))
            else:
                pick = min(conds, key=lambda c: condition_selectivity(self.db, c))
        else:
            pick = self.rng.choice(conds)
        self.query.remove_condition(pick)
        return True

    def add_relation(self) -> bool:
        """Add an unused table and connect it with an equi-join so the
        join graph stays spanning (reference ``query_builder.py``
        add_relation + join repair)."""
        if not self.can_add_relation():
            return False
        used = {r.name for r in self.query.relations}
        candidates = sorted(t.name for t in self.db.tables if t.name not in used)
        if not candidates:
            return False
        if self.size_weighted:
            weights = [self._table_weight(n) for n in candidates]
            new_rel = TableRef(self.rng.choices(candidates, weights=weights)[0])
        else:
            new_rel = TableRef(self.rng.choice(candidates))
        joins = [
            j
            for j in valid_joins(self.db, self.query.relations | {new_rel})
            if new_rel in j.tables() and (j.left.table in self.query.relations or j.right.table in self.query.relations or not self.query.relations)
        ]
        if self.query.relations and not joins:
            return False
        self.checkpoint()
        self.query.add_relation(new_rel)
        if joins:
            self.query.add_join(self.rng.choice(joins))
        return True

    def remove_relation(self) -> bool:
        """Remove a relation whose removal keeps the join graph
        connected; cascades dangling refs (reference ``:155-209``)."""
        if not self.can_remove_relation():
            return False
        for rel in self.rng.sample(sorted(self.query.relations), len(self.query.relations)):
            trial = self.query.copy()
            trial.remove_relation(rel)
            if trial.connected() and trial.projections:
                self.checkpoint()
                self.query = trial
                return True
        return False

    def replace_join(self) -> bool:
        """Swap one join predicate for another valid pair between the
        same relations (reference ``query_builder.py:300``)."""
        if not self.query.joins:
            return False
        old = self.rng.choice(sorted(self.query.joins))
        candidates = [
            j
            for j in valid_joins(self.db, set(old.tables()))
            if j.normalized() != old.normalized()
        ]
        if not candidates:
            return False
        self.checkpoint()
        self.query.remove_join(old)
        new = self.rng.choice(candidates)
        self.query.add_join(new)
        if not self.query.connected():
            self.undo()
            return False
        return True

    MUTATIONS = (
        "add_projection",
        "remove_projection",
        "add_condition",
        "remove_condition",
        "add_relation",
        "remove_relation",
    )

    def mutate(self, name: str | None = None) -> bool:
        name = name or self.rng.choice(self.MUTATIONS)
        return getattr(self, name)()
