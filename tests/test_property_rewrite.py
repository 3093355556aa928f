"""Property-based guarantees (hypothesis) for the range-algebra rewrite
and the Query IR — the reference only had golden-case tests
(``test_tree_optimzations.py``); these prove the algebra, not examples.
"""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from deep_query_optimization_spark.catalog import DataType
from deep_query_optimization_spark.relational.models import ColumnRef, Condition, Projection, TableRef
from deep_query_optimization_spark.relational.query import Query
from deep_query_optimization_spark.relational.rewrite import merge_conditions

COL = ColumnRef(TableRef("t"), "x", DataType.FLOAT)

ops = st.sampled_from([">", ">=", "<", "<=", "=", "!="])
values = st.integers(min_value=-5, max_value=5).map(float)
conditions = st.lists(st.tuples(ops, values), min_size=1, max_size=6)


def satisfies(point: float, op: str, v: float) -> bool:
    return {
        ">": point > v,
        ">=": point >= v,
        "<": point < v,
        "<=": point <= v,
        "=": point == v,
        "!=": point != v,
    }[op]


def conjunction_holds(point: float, conds) -> bool:
    return all(satisfies(point, op, v) for op, v in conds)


@given(conditions)
@settings(max_examples=300, deadline=None)
# Pinned regression: hash(-1.0) == hash(-2.0) == -2 in CPython; the old
# hash-based Condition.__eq__ merged these two predicates into one.
@example(conds=[("!=", -1.0), ("!=", -2.0)]).via("discovered failure")
def test_merge_is_semantically_equivalent(conds):
    """For every probe point, the merged conjunction accepts exactly
    the same points as the original; a declared contradiction means NO
    point satisfies the original."""
    merged, contradiction = merge_conditions([Condition(COL, op, v) for op, v in conds])
    merged_pairs = [(c.op, float(c.value)) for c in merged]
    # probe integer points and half-points across the literal range
    probes = [x / 2.0 for x in range(-12, 13)]
    for p in probes:
        orig = conjunction_holds(p, conds)
        if contradiction:
            assert not orig, f"contradiction declared but {p} satisfies {conds}"
        else:
            assert orig == conjunction_holds(p, merged_pairs), (
                f"point {p}: original={orig} merged={conjunction_holds(p, merged_pairs)} "
                f"conds={conds} merged={merged_pairs}"
            )


@given(conditions)
@settings(max_examples=200, deadline=None)
def test_merge_never_grows(conds):
    merged, contradiction = merge_conditions([Condition(COL, op, v) for op, v in conds])
    assert len(merged) <= len(set(conds))


@given(st.permutations(list(range(5))))
@settings(max_examples=50, deadline=None)
def test_query_emission_order_invariant(order):
    """SQL emission is identical regardless of construction order
    (the set-semantics contract, reference query docstring :11-15)."""
    emp = TableRef("employees")
    parts = [
        lambda q: q.add_projection(Projection(ColumnRef(emp, "salary", DataType.FLOAT), "MIN")),
        lambda q: q.add_condition(Condition(ColumnRef(emp, "id", DataType.NUMBER), ">", 10)),
        lambda q: q.add_condition(Condition(ColumnRef(emp, "name", DataType.STRING), "LIKE", "%a%")),
        lambda q: q.add_condition(Condition(ColumnRef(emp, "salary", DataType.FLOAT), "<", 9.5)),
        lambda q: q.add_projection(Projection(ColumnRef(emp, "id", DataType.NUMBER), "COUNT")),
    ]
    q1, q2 = Query(), Query()
    for f in parts:
        f(q1)
    for i in order:
        parts[i](q2)
    assert q1.to_sql() == q2.to_sql()
    assert hash(q1) == hash(q2)
