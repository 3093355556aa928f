"""Query IR + builder + rewrite tests (pure Python, no Spark).

Mirrors the reference's test styles (SURVEY §5): golden SQL
round-trips, mutation cascades, range-algebra merge cases."""

from __future__ import annotations

import random

import pytest

from deep_query_optimization_spark.catalog import Column, Database, DataType, Table
from deep_query_optimization_spark.relational import (
    ColumnRef,
    Condition,
    Join,
    Projection,
    Query,
    QueryBuilder,
    TableRef,
)
from deep_query_optimization_spark.relational.builder import valid_joins
from deep_query_optimization_spark.relational.rewrite import merge_conditions


@pytest.fixture
def db() -> Database:
    """Fixture schema in the spirit of the reference's employees DB
    (``dqo/db/tests/datasets.py:4-149``)."""
    return Database(
        [
            Table(
                "employees",
                [
                    Column("id", DataType.NUMBER),
                    Column("name", DataType.STRING),
                    Column("salary", DataType.FLOAT),
                    Column("hired", DataType.TIME),
                    Column("dept_id", DataType.NUMBER),
                ],
            ),
            Table(
                "departments",
                [
                    Column("id", DataType.NUMBER),
                    Column("label", DataType.STRING),
                ],
            ),
        ]
    )


def _simple_query(db: Database) -> Query:
    emp = TableRef("employees")
    q = Query()
    q.add_projection(Projection(ColumnRef(emp, "salary", DataType.FLOAT), "MIN"))
    q.add_condition(Condition(ColumnRef(emp, "id", DataType.NUMBER), ">", 10))
    return q


# -- golden SQL emission (reference test_query.py:8-101) ----------------


def test_to_sql_simple(db):
    q = _simple_query(db)
    assert q.to_sql() == (
        "SELECT MIN(t1.salary) AS min_employees_0_salary FROM employees t1 WHERE t1.id > 10"
    )


def test_to_sql_join_deterministic_aliases(db):
    emp, dep = TableRef("employees"), TableRef("departments")
    q = Query()
    q.add_projection(Projection(ColumnRef(emp, "name", DataType.STRING)))
    q.add_join(Join(ColumnRef(emp, "dept_id", DataType.NUMBER), ColumnRef(dep, "id", DataType.NUMBER)))
    sql = q.to_sql()
    # aliases assigned by sorted relation name: departments=t1, employees=t2
    assert sql == (
        "SELECT t2.name AS employees_0_name FROM departments t1, employees t2 "
        "WHERE t1.id = t2.dept_id"
    )


def test_to_sql_emission_is_stable_under_insert_order(db):
    emp = TableRef("employees")
    q1, q2 = Query(), Query()
    c1 = Condition(ColumnRef(emp, "id", DataType.NUMBER), ">", 1)
    c2 = Condition(ColumnRef(emp, "salary", DataType.FLOAT), "<", 99.5)
    p = Projection(ColumnRef(emp, "name", DataType.STRING), "MIN")
    for q, order in ((q1, (c1, c2)), (q2, (c2, c1))):
        q.add_projection(p)
        for c in order:
            q.add_condition(c)
    assert q1.to_sql() == q2.to_sql()
    assert q1 == q2 and hash(q1) == hash(q2)


def test_sql_literals(db):
    emp = TableRef("employees")
    q = Query()
    q.add_projection(Projection(ColumnRef(emp, "id", DataType.NUMBER), "COUNT"))
    q.add_condition(Condition(ColumnRef(emp, "name", DataType.STRING), "LIKE", "%o'brien%"))
    q.add_condition(Condition(ColumnRef(emp, "hired", DataType.TIME), ">", "2020-01-01 00:00:00"))
    sql = q.to_sql()
    assert "LIKE '%o''brien%'" in sql
    assert "TIMESTAMP '2020-01-01 00:00:00'" in sql


# -- set semantics + mutation cascade (reference query tests :155-209) --


def test_join_normalization_dedup(db):
    emp, dep = TableRef("employees"), TableRef("departments")
    a = ColumnRef(emp, "dept_id", DataType.NUMBER)
    b = ColumnRef(dep, "id", DataType.NUMBER)
    q = Query()
    q.add_join(Join(a, b))
    q.add_join(Join(b, a))  # same join, flipped
    assert len(q.joins) == 1


def test_remove_relation_cascades(db):
    emp, dep = TableRef("employees"), TableRef("departments")
    q = Query()
    q.add_projection(Projection(ColumnRef(emp, "name", DataType.STRING)))
    q.add_projection(Projection(ColumnRef(dep, "label", DataType.STRING)))
    q.add_condition(Condition(ColumnRef(dep, "id", DataType.NUMBER), ">", 1))
    q.add_join(Join(ColumnRef(emp, "dept_id", DataType.NUMBER), ColumnRef(dep, "id", DataType.NUMBER)))
    q.remove_relation(dep)
    assert q.relations == {emp}
    assert len(q.projections) == 1 and len(q.conditions) == 0 and len(q.joins) == 0
    assert q.valid()


def test_validity_disconnected_join_graph(db):
    emp, dep = TableRef("employees"), TableRef("departments")
    q = Query()
    q.add_relation(emp)
    q.add_relation(dep)
    q.add_projection(Projection(ColumnRef(emp, "name", DataType.STRING)))
    assert not q.valid()  # cartesian: no spanning join
    q.add_join(Join(ColumnRef(emp, "dept_id", DataType.NUMBER), ColumnRef(dep, "id", DataType.NUMBER)))
    assert q.valid()


def test_valid_joins_type_compat(db):
    pairs = valid_joins(db, {TableRef("employees"), TableRef("departments")})
    # NUMBER pairs: (id,dept_id)x(id) = 2; STRING pairs: (name)x(label) = 1
    keys = {(j.left.column, j.right.column) for j in pairs}
    assert ("id", "id") in keys or ("id", "id") in {(j.right.column, j.left.column) for j in pairs}
    assert all(j.left.dtype == j.right.dtype for j in pairs)
    assert len(pairs) == 3


# -- builder mutations (reference test_query_builder.py:8-122) ----------


def test_builder_mutations_and_undo(db):
    rng = random.Random(7)
    qb = QueryBuilder(db, query=_simple_query(db), rng=rng)
    before = qb.query.copy()
    assert qb.add_condition()
    assert qb.query != before
    assert qb.undo()
    assert qb.query == before
    assert not qb.undo()


def test_builder_add_remove_relation_keeps_validity(db):
    rng = random.Random(3)
    qb = QueryBuilder(db, query=_simple_query(db), rng=rng)
    assert qb.add_relation()
    assert qb.query.valid()
    assert len(qb.query.relations) == 2
    assert qb.remove_relation()
    assert qb.query.valid()
    assert len(qb.query.relations) == 1


def test_builder_guards(db):
    qb = QueryBuilder(db, query=_simple_query(db), rng=random.Random(0))
    assert not qb.can_remove_projection()  # only one projection
    assert qb.can_remove_condition()
    assert not qb.can_remove_relation()  # single relation
    assert not qb.remove_projection()
    assert not qb.remove_relation()


def test_builder_exhaustion(db):
    qb = QueryBuilder(db, query=_simple_query(db), rng=random.Random(1))
    assert qb.add_relation()
    assert not qb.add_relation()  # both tables used
    assert not qb.can_add_relation()


# -- range algebra (reference test_tree_optimzations.py:37-89) ----------


def _c(op: str, v: float) -> Condition:
    col = ColumnRef(TableRef("t"), "x", DataType.FLOAT)
    return Condition(col, op, v)


@pytest.mark.parametrize(
    "conds,expect_ops,contradiction",
    [
        ([(">", 1), (">", 5)], {(">", 5.0)}, False),
        ([("<", 9), ("<", 3)], {("<", 3.0)}, False),
        ([(">=", 4), ("<=", 4)], {("=", 4.0)}, False),
        ([(">", 1), ("<", 1)], set(), True),
        ([(">", 5), ("<", 2)], set(), True),
        ([("=", 3), ("=", 4)], set(), True),
        ([("=", 3), ("!=", 3)], set(), True),
        ([("=", 3), (">", 1), ("<", 10)], {("=", 3.0)}, False),
        ([(">", 1), ("<", 10), ("!=", 5)], {(">", 1.0), ("<", 10.0), ("!=", 5.0)}, False),
        ([(">", 2), (">=", 2)], {(">", 2.0)}, False),
    ],
)
def test_merge_conditions(conds, expect_ops, contradiction):
    merged, contra = merge_conditions([_c(op, v) for op, v in conds])
    assert contra == contradiction
    if not contra:
        assert {(c.op, c.value) for c in merged} == expect_ops


def test_merge_preserves_non_numeric():
    col_s = ColumnRef(TableRef("t"), "s", DataType.STRING)
    like = Condition(col_s, "LIKE", "%x%")
    merged, contra = merge_conditions([like, _c(">", 1), _c(">", 2)])
    assert not contra
    assert like in merged
    assert len(merged) == 2


def test_builder_empty_query_mutations_safe(db):
    from deep_query_optimization_spark.relational.query import Query

    qb = QueryBuilder(db, query=Query(), rng=random.Random(0))
    assert not qb.add_projection()
    assert not qb.add_condition()
    assert not qb.remove_relation()
    assert qb.add_relation()  # first relation needs no join
    assert qb.query.relations
