"""Range-algebra predicate merging + contradiction detection.

Reference ``dqo/relational/tree/__init__.py:65-138``
(``merge_selections_``; golden cases in
``relational/tests/test_tree_optimzations.py:37-89``): ``>x ∧ >y → >max``,
``>=x ∧ <=x → =x``, and contradiction detection (``>1 ∧ <1`` → empty).

Catalyst's CombineFilters + ConstantFolding cover most merges but do NOT
fold a contradictory numeric range into an empty relation (SURVEY §4).
This module is the engine-side rule: the lab executor runs it before
submitting a query, and a contradiction short-circuits to an empty
result without touching the cluster — at 100 TB that's the difference
between 0 and a full scan.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable

from deep_query_optimization_spark.catalog import DataType
from deep_query_optimization_spark.relational.models import ColumnRef, Condition

_RANGE_OPS = (">", ">=", "<", "<=", "=", "!=")


def _as_number(value: object, dtype: DataType) -> float | None:
    if dtype in (DataType.NUMBER, DataType.FLOAT):
        try:
            return float(value)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            return None
    return None


def merge_conditions(conditions: Iterable[Condition]) -> tuple[set[Condition], bool]:
    """Merge single-column numeric range predicates.

    Returns ``(merged, contradiction)``. Conditions that aren't numeric
    ranges (LIKE/IN/IS NULL/strings/times) pass through untouched.
    ``contradiction=True`` means the conjunction is unsatisfiable and
    the whole query result is provably empty.
    """
    passthrough: set[Condition] = set()
    by_col: dict[ColumnRef, list[tuple[str, float]]] = defaultdict(list)
    for c in conditions:
        num = _as_number(c.value, c.column.dtype) if c.op in _RANGE_OPS else None
        if num is None:
            passthrough.add(c)
        else:
            by_col[c.column].append((c.op, num))

    merged: set[Condition] = set(passthrough)
    for col, preds in by_col.items():
        lower: tuple[float, bool] | None = None  # (value, strict)
        upper: tuple[float, bool] | None = None
        eqs: set[float] = set()
        neqs: set[float] = set()
        for op, v in preds:
            if op == ">" and (lower is None or v > lower[0] or (v == lower[0] and not lower[1])):
                lower = (v, True)
            elif op == ">=" and (lower is None or v > lower[0]):
                lower = (v, False)
            elif op == "<" and (upper is None or v < upper[0] or (v == upper[0] and not upper[1])):
                upper = (v, True)
            elif op == "<=" and (upper is None or v < upper[0]):
                upper = (v, False)
            elif op == "=":
                eqs.add(v)
            elif op == "!=":
                neqs.add(v)

        if len(eqs) > 1:
            return merged, True  # = a ∧ = b, a ≠ b
        if eqs:
            v = next(iter(eqs))
            if v in neqs:
                return merged, True
            if lower is not None and (v < lower[0] or (v == lower[0] and lower[1])):
                return merged, True
            if upper is not None and (v > upper[0] or (v == upper[0] and upper[1])):
                return merged, True
            merged.add(Condition(col, "=", v))
            continue

        if lower is not None and upper is not None:
            if lower[0] > upper[0]:
                return merged, True
            if lower[0] == upper[0]:
                if lower[1] or upper[1]:
                    return merged, True  # > x ∧ <= x (or stricter)
                merged.add(Condition(col, "=", lower[0]))  # >= x ∧ <= x → = x
                for v in neqs:
                    if v == lower[0]:
                        return merged, True
                continue
        if lower is not None:
            merged.add(Condition(col, ">" if lower[1] else ">=", lower[0]))
        if upper is not None:
            merged.add(Condition(col, "<" if upper[1] else "<=", upper[0]))
        for v in neqs:
            merged.add(Condition(col, "!=", v))
    return merged, False


def optimize_query(query):
    """Apply predicate merging to a Query in place; returns
    ``contradiction`` (True → result provably empty)."""
    merged, contradiction = merge_conditions(query.conditions)
    query.conditions = merged
    return contradiction
