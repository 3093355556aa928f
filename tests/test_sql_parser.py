"""SQL-text → Query-IR parser (reference ``SQLParser.to_query``,
``dqo/relational/__init__.py:33-34``) — here backed by Spark's analyzer
instead of the reference's PLY grammar.

The contract: ``to_sql ∘ parse`` is a fixed point. For queries the IR
emitted itself, one parse reproduces the exact Query (set-identical
relations/joins/conditions/projections); for foreign SQL using sugar the
analyzer desugars (BETWEEN), the fixed point is reached after one trip.
"""

from __future__ import annotations

import pytest

from deep_query_optimization_spark.catalog import Database, DataType
from deep_query_optimization_spark.generator import RandomQueryGen
from deep_query_optimization_spark.relational.models import ColumnRef, Condition, Join, Projection, TableRef
from deep_query_optimization_spark.relational.parser import UnsupportedSQL, parse_sql
from deep_query_optimization_spark.relational.query import Query

SNAPSHOT = "deep_query_optimization_spark/snapshots/sf0.01_schema.json"


@pytest.fixture(scope="module")
def db() -> Database:
    return Database.load(SNAPSHOT)


def test_roundtrip_generated_workload(spark, tables, db):
    """parse(q.to_sql()) == q exactly, across 40 generator seeds
    (covers joins, spanning predicates, MIN projections, LIKE/numeric/
    timestamp conditions)."""
    for seed in range(40):
        q = RandomQueryGen(db, seed=seed).randomize()
        q2 = parse_sql(spark, q.to_sql(), db)
        assert q2 == q, f"seed {seed}:\n  {q.to_sql()}\n  {q2.to_sql()}"


def test_roundtrip_is_fixed_point_for_sugar(spark, tables, db):
    """Foreign SQL (different alias style, BETWEEN/IN sugar) parses to
    a Query for which to_sql ∘ parse is the identity."""
    sql = (
        "SELECT o_orderkey AS orders_0_o_orderkey FROM orders t1 "
        "WHERE t1.o_totalprice BETWEEN 1000.5 AND 2000.5 "
        "AND t1.o_orderpriority IN ('1-URGENT', '2-HIGH')"
    )
    q1 = parse_sql(spark, sql, db)
    assert len(q1.conditions) == 2  # BETWEEN stays one condition, + IN
    q2 = parse_sql(spark, q1.to_sql(), db)
    assert q2 == q1
    assert q2.to_sql() == q1.to_sql()


def test_self_join_ordinals(spark, tables, db):
    """Two occurrences of one table round-trip to distinct TableRefs
    with the original ordinals."""
    o0, o1 = TableRef("orders", 0), TableRef("orders", 1)
    q = Query()
    q.add_projection(Projection(ColumnRef(o0, "o_orderkey", DataType.NUMBER)))
    q.add_projection(Projection(ColumnRef(o1, "o_totalprice", DataType.FLOAT)))
    q.add_join(
        Join(ColumnRef(o0, "o_custkey", DataType.NUMBER), ColumnRef(o1, "o_custkey", DataType.NUMBER))
    )
    q.add_condition(Condition(ColumnRef(o0, "o_orderkey", DataType.NUMBER), "<", 100))
    q2 = parse_sql(spark, q.to_sql(), db)
    assert q2 == q


def test_literal_types_roundtrip(spark, tables, db):
    """int / float / string / timestamp / null-check literal kinds all
    survive the analyzer's implicit casts."""
    e = TableRef("events", 0)
    q = Query()
    q.add_projection(Projection(ColumnRef(e, "event_id", DataType.NUMBER)))
    q.add_condition(Condition(ColumnRef(e, "event_id", DataType.NUMBER), "!=", 7))
    q.add_condition(Condition(ColumnRef(e, "value", DataType.FLOAT), ">", 0.25))
    q.add_condition(Condition(ColumnRef(e, "event_type", DataType.STRING), "NOT LIKE", "%x%"))
    q.add_condition(Condition(ColumnRef(e, "ts", DataType.TIME), ">", "2024-01-01 00:00:00"))
    q.add_condition(Condition(ColumnRef(e, "event_type", DataType.STRING), "IS NOT NULL"))
    q2 = parse_sql(spark, q.to_sql(), db)
    assert q2 == q


def test_unsupported_constructs_raise(spark, tables, db):
    for sql in (
        "SELECT o_orderkey FROM orders WHERE o_orderkey = 1 OR o_orderkey = 2",
        "SELECT o_orderkey FROM (SELECT * FROM orders LIMIT 5) s",
        "SELECT o_orderkey + 1 AS x FROM orders",
        "SELECT COUNT(*) AS c FROM orders",
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5",
        "SELECT o_orderkey FROM orders UNION SELECT o_orderkey FROM orders",
        "SELECT c_name FROM customer LEFT JOIN orders ON c_custkey = o_custkey",
    ):
        with pytest.raises(UnsupportedSQL):
            parse_sql(spark, sql, db)


def test_parsed_query_is_mutable(spark, tables, db):
    """The point of the parser: lift EXISTING SQL into the IR, then
    mutate it with QueryBuilder — the loop the reference closes with
    its PLY parser (guided generation over foreign workloads)."""
    import random

    from deep_query_optimization_spark.relational.builder import QueryBuilder

    sql = (
        "SELECT t1.o_orderkey AS orders_0_o_orderkey, t2.c_name AS customer_0_c_name "
        "FROM orders t1, customer t2 WHERE t1.o_custkey = t2.c_custkey AND t1.o_totalprice > 50000"
    )
    q = parse_sql(spark, sql, db)
    builder = QueryBuilder(db, rng=random.Random(7))
    builder.query = q
    assert builder.mutate("add_condition")
    assert q.valid()
    mutated_sql = q.to_sql()
    assert mutated_sql != sql
    # the mutated query still parses back to itself and still runs
    assert parse_sql(spark, mutated_sql, db) == q
    assert spark.sql(mutated_sql).count() >= 0
