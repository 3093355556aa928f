"""Type-driven random literal predicates.

Reference ``rand_condition`` (``dqo/query_generator/__init__.py:24-54``):
numeric ``> < = !=`` against a uniform value in [min, max] from stats;
TIME via a timestamp literal; STRING via ``LIKE '%abc%'`` with 3 random
letters; BOOL ``= TRUE/FALSE``.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timezone

from deep_query_optimization_spark.catalog import DataType
from deep_query_optimization_spark.relational.models import ColumnRef, Condition
from deep_query_optimization_spark.stats import ColumnStats, NumericStats

NUMERIC_OPS = (">", "<", "=", "!=")


def condition_selectivity(db, cond: Condition) -> float:
    """Estimated fraction of rows a condition keeps, from the column's
    histogram/length stats (reference operand-probability lookup,
    ``gerelt/v20/encoder.py:166-197`` + LIKE letter frequencies
    ``:121-148``). 0.5 when stats can't say. This is what lets the
    guided generator pick PROMISING mutations instead of blind ones —
    without running the query."""
    from deep_query_optimization_spark.stats import (
        StringStats,
        like_selectivity,
        selectivity,
    )

    try:
        stats = db[cond.column.table.name][cond.column.column].stats
    except KeyError:
        return 0.5
    if stats is None:
        return 0.5
    op = cond.op
    if op in (">", "<", ">=", "<=", "=", "!="):
        try:
            return selectivity(stats, op, float(cond.value))
        except (TypeError, ValueError):
            return 0.5
    if op == "BETWEEN":
        try:
            lo, hi = cond.value
            return max(0.0, selectivity(stats, "<=", float(hi)) - selectivity(stats, "<", float(lo)))
        except (TypeError, ValueError):
            return 0.5
    if op in ("LIKE", "NOT LIKE"):
        ss = stats.values if isinstance(stats.values, StringStats) else None
        avg_len = float(ss.chars.mean) if ss and ss.chars.mean else 20.0
        sel = like_selectivity(str(cond.value), avg_len)
        return sel if op == "LIKE" else 1.0 - sel
    if op == "IS NULL":
        return stats.nulls_fraction
    if op == "IS NOT NULL":
        return 1.0 - stats.nulls_fraction
    if op == "IN":
        n = len(cond.value) if isinstance(cond.value, (list, tuple, set)) else 1
        return min(1.0, n / stats.distinct) if stats.distinct else 0.5
    return 0.5


def _numeric_range(stats: ColumnStats | None) -> tuple[float, float]:
    if stats and isinstance(stats.values, NumericStats) and stats.values.min is not None:
        return float(stats.values.min), float(stats.values.max)
    return 0.0, 1000.0


def rand_condition(col: ColumnRef, stats: ColumnStats | None, rng: random.Random) -> Condition | None:
    dt = col.dtype
    if dt == DataType.NUMBER:
        lo, hi = _numeric_range(stats)
        value = rng.randint(int(lo), max(int(lo), int(hi)))
        return Condition(col, rng.choice(NUMERIC_OPS), value)
    if dt == DataType.FLOAT:
        lo, hi = _numeric_range(stats)
        value = round(rng.uniform(lo, hi), 4)
        # float equality is always-empty noise; restrict to ranges
        return Condition(col, rng.choice((">", "<")), value)
    if dt == DataType.TIME:
        lo, hi = _numeric_range(stats)
        if hi <= lo:
            return None
        epoch = rng.uniform(lo, hi)
        ts = datetime.fromtimestamp(epoch, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        return Condition(col, rng.choice((">", "<")), ts)
    if dt == DataType.STRING:
        letters = "".join(rng.choice(string.ascii_lowercase) for _ in range(3))
        return Condition(col, rng.choice(("LIKE", "NOT LIKE")), f"%{letters}%")
    if dt == DataType.BOOL:
        return Condition(col, "=", rng.choice((True, False)))
    return None
