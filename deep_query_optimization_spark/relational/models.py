"""Building blocks of the set-based Query IR.

Reference ``dqo/relational/models.py``: ``TableRef:10``, ``ColumnRef:26``,
``Const:57``, ``Projection:69``, ``Selection:91``, ``Condition:110``,
``Join:136``. Ours are frozen dataclasses so they are hashable set
members by construction (the reference hand-rolled __hash__/__eq__).
"""

from __future__ import annotations

from dataclasses import dataclass

from deep_query_optimization_spark.catalog import DataType

COMPARISON_OPS = (">", "<", "=", ">=", "<=", "!=")
AGG_FUNCS = ("MIN", "MAX", "SUM", "AVG", "COUNT")


@dataclass(frozen=True, order=True)
class TableRef:
    """A base relation occurrence. ``ordinal`` distinguishes multiple
    occurrences of the same table (self-joins)."""

    name: str
    ordinal: int = 0

    @property
    def key(self) -> str:
        return f"{self.name}#{self.ordinal}"


@dataclass(frozen=True, order=True)
class ColumnRef:
    table: TableRef
    column: str
    dtype: DataType = DataType.NUMBER

    @property
    def key(self) -> str:
        return f"{self.table.key}.{self.column}"


def sql_literal(value: object, dtype: DataType) -> str:
    """Render a literal valid in BOTH Spark SQL and ANSI/DuckDB SQL —
    emitted queries double as their own oracle text."""
    if dtype == DataType.TIME:
        return f"TIMESTAMP '{value}'"
    if dtype == DataType.STRING:
        escaped = str(value).replace("'", "''")
        return f"'{escaped}'"
    if dtype == DataType.BOOL:
        return "TRUE" if value in (True, "TRUE", "true", 1) else "FALSE"
    return str(value)


@dataclass(frozen=True)
class Condition:
    """``col ⊗ literal`` (reference ``Condition:110``; the ``ltr`` flag
    is unnecessary — we canonicalize to column-on-the-left at
    construction, which is the reference's ``canonize_`` rewrite,
    ``node.py:254-257``). ``op`` may also be LIKE / NOT LIKE / IN /
    IS NULL / IS NOT NULL with ``value`` shaped accordingly."""

    column: ColumnRef
    op: str
    value: object = None

    def to_sql(self, alias: str) -> str:
        col = f"{alias}.{self.column.column}"
        if self.op in ("IS NULL", "IS NOT NULL"):
            return f"{col} {self.op}"
        if self.op == "IN":
            vals = ", ".join(sql_literal(v, self.column.dtype) for v in self.value)
            return f"{col} IN ({vals})"
        if self.op in ("LIKE", "NOT LIKE"):
            return f"{col} {self.op} {sql_literal(self.value, DataType.STRING)}"
        if self.op == "BETWEEN":
            lo, hi = self.value
            return (
                f"{col} BETWEEN {sql_literal(lo, self.column.dtype)}"
                f" AND {sql_literal(hi, self.column.dtype)}"
            )
        return f"{col} {self.op} {sql_literal(self.value, self.column.dtype)}"

    def _key(self) -> tuple:
        v = tuple(self.value) if isinstance(self.value, (list, tuple, set)) else self.value
        return (self.column, self.op, v)

    def __hash__(self) -> int:
        return hash(self._key())

    def __eq__(self, other: object) -> bool:
        # Compare the key tuple, NOT the hashes: CPython reserves hash -1,
        # so hash(-1.0) == hash(-2.0) == -2 and hash-equality would merge
        # distinct predicates (silently dropping one from the Query's
        # condition set).
        return isinstance(other, Condition) and self._key() == other._key()


@dataclass(frozen=True, order=True)
class Join:
    """Equi/theta join between two columns (reference ``Join:136`` —
    generation emits ``=`` only, ``query_builder.py:59``; the parser
    side also accepts theta ops, which we allow via ``op``)."""

    left: ColumnRef
    right: ColumnRef
    op: str = "="

    def normalized(self) -> "Join":
        """Canonical operand order so {a=b} == {b=a} as set members."""
        if self.op == "=" and self.right.key < self.left.key:
            return Join(self.right, self.left, self.op)
        return self

    def tables(self) -> tuple[TableRef, TableRef]:
        return (self.left.table, self.right.table)


@dataclass(frozen=True, order=True)
class Projection:
    """Column + optional aggregate func (reference ``Projection:69``)."""

    column: ColumnRef
    func: str | None = None  # one of AGG_FUNCS

    def out_name(self) -> str:
        """Deterministic output alias — unambiguous across self-joins,
        and identical in the Spark query and its oracle text."""
        base = f"{self.column.table.name}_{self.column.table.ordinal}_{self.column.column}"
        return f"{self.func.lower()}_{base}" if self.func else base

    def to_sql(self, alias: str) -> str:
        col = f"{alias}.{self.column.column}"
        if self.func:
            return f"{self.func}({col}) AS {self.out_name()}"
        return f"{col} AS {self.out_name()}"
