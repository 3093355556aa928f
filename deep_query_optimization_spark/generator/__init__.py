"""Workload generators — the reference's "query capability" driver.

Reference ``dqo/query_generator``: random (``__init__.py:57``),
mutation/feedback-guided (``guided.py:31,191``), RL-based
(``rl/__init__.py:34``). All emit SQL whose runtimes are harvested into
labeled datasets for the cost estimator.

Determinism: every generator takes an explicit ``random.Random`` seed
(the reference re-seeded per call, ``query_generator/__init__.py:70-74``
— a bug SURVEY §7 flags; we thread one RNG through everything).
"""

from __future__ import annotations

import random

from deep_query_optimization_spark.catalog import Database
from deep_query_optimization_spark.generator.conditions import rand_condition
from deep_query_optimization_spark.relational.builder import valid_joins
from deep_query_optimization_spark.relational.models import Projection, TableRef
from deep_query_optimization_spark.relational.query import Query


class RandomQueryGen:
    """Reference ``RandomQueryGen.randomize``
    (``query_generator/__init__.py:57-226``): pick a table subset with a
    left-skewed size preference, connect it with a spanning tree of
    type-compatible equi-joins plus random extra joins (up to C(n,2)),
    add up to ``max_conditions`` random literal predicates, project
    ``MIN(col)`` aggregates."""

    def __init__(
        self,
        db: Database,
        seed: int | None = None,
        max_tables: int = 4,
        max_conditions: int = 30,
        max_projections: int = 3,
        projection_types: tuple | None = None,
    ) -> None:
        self.db = db
        self.rng = random.Random(seed)
        self.max_tables = max_tables
        self.max_conditions = max_conditions
        self.max_projections = max_projections
        self.projection_types = projection_types

    def _pick_relations(self) -> list[TableRef]:
        # left-skewed count preference: P(k) ∝ 2^-k (reference :92)
        n_max = min(self.max_tables, len(self.db))
        weights = [2.0 ** -(k) for k in range(1, n_max + 1)]
        k = self.rng.choices(range(1, n_max + 1), weights=weights)[0]
        names = sorted(t.name for t in self.db.tables)
        return [TableRef(n) for n in self.rng.sample(names, k)]

    def randomize(self) -> Query:
        q = Query()
        rels = self._pick_relations()
        for r in rels:
            q.add_relation(r)

        # spanning tree of equi-joins (reference :92-131)
        if len(rels) > 1:
            connected = {rels[0]}
            remaining = set(rels[1:])
            while remaining:
                progressed = False
                for rel in sorted(remaining):
                    cands = [
                        j
                        for j in valid_joins(self.db, connected | {rel})
                        if rel in j.tables() and (j.left.table in connected or j.right.table in connected)
                    ]
                    if cands:
                        q.add_join(self.rng.choice(cands))
                        connected.add(rel)
                        remaining.discard(rel)
                        progressed = True
                        break
                if not progressed:
                    # un-joinable table: drop it (reference retries; we prune)
                    rel = sorted(remaining)[0]
                    remaining.discard(rel)
                    q.remove_relation(rel)
            rels = sorted(q.relations)
            # random extra joins up to C(n,2) (reference :121-131)
            extra_budget = self.rng.randint(0, max(0, len(rels) * (len(rels) - 1) // 2 - len(q.joins)))
            if extra_budget:
                cands = [j for j in valid_joins(self.db, set(rels)) if j.normalized() not in q.joins]
                for j in self.rng.sample(cands, min(extra_budget, len(cands))):
                    q.add_join(j)

        from deep_query_optimization_spark.catalog import DataType
        from deep_query_optimization_spark.relational.builder import column_ref

        scalar = (DataType.NUMBER, DataType.FLOAT, DataType.STRING, DataType.TIME, DataType.BOOL)

        def scalar_cols(rel):
            return sorted((c for c in self.db[rel.name].columns if c.data_type in scalar), key=lambda c: c.name)

        # conditions (reference :133-149)
        n_conds = self.rng.randint(0, self.max_conditions)
        for _ in range(n_conds):
            rel = self.rng.choice(sorted(q.relations))
            cols = scalar_cols(rel)
            if not cols:
                continue
            col = self.rng.choice(cols)
            cond = rand_condition(column_ref(self.db, rel, col.name), col.stats, self.rng)
            if cond is not None:
                q.add_condition(cond)

        # MIN projections (reference :151-153)
        proj_types = self.projection_types or scalar

        def proj_cols(rel):
            return [c for c in scalar_cols(rel) if c.data_type in proj_types]

        n_projs = self.rng.randint(1, self.max_projections)
        for _ in range(n_projs):
            rel = self.rng.choice(sorted(q.relations))
            cols = proj_cols(rel)
            if not cols:
                continue
            col = self.rng.choice(cols)
            q.add_projection(Projection(column_ref(self.db, rel, col.name), "MIN"))
        if not q.projections:  # guarantee a valid projection list
            for rel in sorted(q.relations):
                cols = proj_cols(rel) or scalar_cols(rel)
                if cols:
                    q.add_projection(Projection(column_ref(self.db, rel, cols[0].name), "MIN"))
                    break
        return q
