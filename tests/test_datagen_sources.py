"""Synthetic data generation + sources/sinks tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_query_optimization_spark.catalog import Database
from deep_query_optimization_spark.lab.data_generator import (
    CATEGORICAL,
    CHARS,
    PATTERN,
    SPEECH,
    fake_table,
    hist_faithful_numeric,
    infer_string_kind,
    scale_table,
)
from deep_query_optimization_spark.sources import read_any, write_partitioned
from deep_query_optimization_spark.stats import NumericStats


@pytest.fixture(scope="module")
def db():
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    return Database.load(str(root / "deep_query_optimization_spark/snapshots/sf0.01_schema.json"))


def test_hist_faithful_sampling(spark):
    # skewed histogram: 90% of mass in bucket 0
    ns = NumericStats(
        min=0.0,
        max=100.0,
        hist=[[i * 10.0, (i + 1) * 10.0] for i in range(10)] + [None],
        freq=[900, 20, 10, 10, 10, 10, 10, 10, 10, 10, 0],
    )
    df = spark.range(5000).select(hist_faithful_numeric(ns, seed=1).alias("x"))
    frac_low = df.filter(F.col("x") < 10).count() / 5000
    assert 0.85 < frac_low < 0.95
    mn, mx = df.agg(F.min("x"), F.max("x")).collect()[0]
    assert mn >= 0.0 and mx <= 100.0


def test_infer_string_kind():
    assert infer_string_kind(["a"] * 100, distinct_ratio=0.01) == CATEGORICAL
    assert infer_string_kind(["AB-1234", "XY-9921", "QQ-0007"], 0.9) == PATTERN
    assert infer_string_kind(["many words here", "more words there"], 0.9) == SPEECH
    assert infer_string_kind(["x7f2k", "9qbm1z", "aa", "zzzz9"], 0.9) == CHARS


def test_fake_table_from_snapshot(spark, db):
    fake = fake_table(spark, db["orders"], n_rows=2000, seed=3)
    assert fake.count() == 2000
    assert set(fake.columns) == {c.name for c in db["orders"].columns}
    row = fake.agg(
        F.min("o_totalprice"), F.max("o_totalprice"), F.countDistinct("o_orderstatus"), F.mean("o_totalprice")
    ).collect()[0]
    real = db["orders"]["o_totalprice"].stats.values
    assert row[0] >= real.min - 1 and row[1] <= real.max + 1
    assert row[2] == db["orders"]["o_orderstatus"].stats.distinct  # honor observed NDV
    # histogram-faithful sampling must reproduce the mean (guards the
    # when-chain rand() evaluation-order bias this module once had)
    assert row[3] == pytest.approx(real.mean, rel=0.05)
    # key-like column stays monotonic/unique
    assert fake.select("o_orderkey").distinct().count() == 2000


def test_scale_table(spark, tables):
    orders = tables["orders"]
    n = orders.count()
    up = scale_table(orders, 2.5, seed=1).count()
    down = scale_table(orders, 0.4, seed=1).count()
    assert abs(up - 2.5 * n) / (2.5 * n) < 0.15
    assert abs(down - 0.4 * n) / (0.4 * n) < 0.2


def test_read_any_and_partitioned_write(spark, tables, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = tables["orders"].withColumn("status", F.col("o_orderstatus"))
    write_partitioned(orders, path, ["status"])
    back = read_any(spark, path, fmt="parquet")
    assert back.count() == orders.count()
    # partition pruning: filter on the partition column skips files
    pruned = back.filter(F.col("status") == "F")
    pruned.collect()
    from deep_query_optimization_spark.plans.parser import physical_summary_of

    s = physical_summary_of(pruned)
    assert s["partition_filters"], "partition filter must reach the scan"


def test_read_any_csv_json(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))
    df.write.mode("overwrite").option("header", True).csv(str(tmp_path / "c"))
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    assert read_any(spark, str(tmp_path / "c"), fmt="csv").count() == 10
    assert read_any(spark, str(tmp_path / "j"), fmt="json").count() == 10
    with pytest.raises(ValueError):
        read_any(spark, "x.avro")


def test_bucketed_join_avoids_shuffle(spark, tables):
    """Both sides bucketed on the join key by the same count → the
    SortMergeJoin reads bucket files pair-wise with NO Exchange —
    the layout that makes repeated fact-fact joins affordable at scale."""
    from pyspark.sql import functions as F

    from deep_query_optimization_spark.plans.parser import physical_summary_of
    from deep_query_optimization_spark.sources import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed(tables["lineitem"].select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    write_bucketed(tables["orders"].select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    # disable broadcast so the join must choose SMJ/shuffle strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        j.collect()
        s = physical_summary_of(j)
        assert s["counts"].get("SortMergeJoin", 0) == 1
        assert s["counts"].get("Exchange", 0) == 0, f"bucketed join must not shuffle: {s['counts']}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
