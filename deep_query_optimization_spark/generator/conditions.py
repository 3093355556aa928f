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
