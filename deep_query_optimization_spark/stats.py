"""Statistics collection — the reference's stats model and queries.

Maps ``dqo/db/models.py`` stats classes and the SQL in
``dqo/db/clients/postgres.py``:

- ``TableStats`` (rows/pages/size, ``models.py:68-78``) → rows +
  on-disk parquet bytes.
- ``ColumnStats`` (total/nulls/distinct/indexed/values,
  ``models.py:47-64``) with derived ``nulls_fraction`` /
  ``distinct_ratio``.
- ``NumericStats`` (min/mean/max/variance/skewness/kurtosis + 10-bucket
  equi-width histogram with a null bucket appended,
  ``models.py:27-37``, histogram SQL ``postgres.py:122-186``).
- ``StringStats`` = NumericStats over char-length and word-count
  distributions (``models.py:41-44``, ``postgres.py:202-203,234-236``).
- TIME columns are measured as epoch seconds (``postgres.py:199-200``).

Scale design (100 TB discipline):
- exactly TWO scans per table regardless of column count: one
  aggregation computes every column's moments/nulls/ndv in a single
  map-side-partial pass (the reference likewise batched all columns
  into one ``stats_agg`` query per table, ``postgres.py:406-458``);
  the histogram pass folds ALL columns' bucket counts into one
  aggregation of conditional sums — no per-column shuffles, no
  driver-side loops over data.
- NDV uses HyperLogLog (``approx_count_distinct``) — exact
  ``COUNT(DISTINCT)`` per column is a full shuffle per column and is
  exactly what you cannot do at 100 TB. (rsd=0.02)
- ``indexed`` has no Spark analog; we record whether the column is a
  partition/bucket/sort key of the source instead (§2.4 note).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from deep_query_optimization_spark.catalog import (
    Column,
    DataType,
    Table,
    from_struct,
)

HIST_BUCKETS = 10


@dataclass
class NumericStats:
    """Reference ``dqo/db/models.py:27-37``."""

    min: float | None = None
    mean: float | None = None
    max: float | None = None
    variance: float | None = None
    skewness: float | None = None
    kurtosis: float | None = None
    hist: list[list[float] | None] = field(default_factory=list)  # bucket [lo,hi); None = null bucket
    freq: list[int] = field(default_factory=list)

    def to_json(self) -> dict[str, Any]:
        return self.__dict__.copy()

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "NumericStats":
        return cls(**d)


@dataclass
class StringStats:
    """Reference ``dqo/db/models.py:41-44`` — length + word-count
    distributions, each a NumericStats."""

    chars: NumericStats = field(default_factory=NumericStats)
    words: NumericStats = field(default_factory=NumericStats)

    def to_json(self) -> dict[str, Any]:
        return {"chars": self.chars.to_json(), "words": self.words.to_json()}

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "StringStats":
        return cls(chars=NumericStats.from_json(d["chars"]), words=NumericStats.from_json(d["words"]))


@dataclass
class ColumnStats:
    """Reference ``dqo/db/models.py:47-64``."""

    total: int = 0
    nulls: int = 0
    distinct: int = 0
    indexed: bool = False  # Spark: partition/bucket/sort key of the source
    values: NumericStats | StringStats | None = None

    @property
    def nulls_fraction(self) -> float:
        return self.nulls / self.total if self.total else 0.0

    @property
    def distinct_ratio(self) -> float:
        return self.distinct / self.total if self.total else 0.0

    def to_json(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "total": self.total,
            "nulls": self.nulls,
            "distinct": self.distinct,
            "indexed": self.indexed,
        }
        if isinstance(self.values, StringStats):
            d["values"] = {"kind": "string", **self.values.to_json()}
        elif isinstance(self.values, NumericStats):
            d["values"] = {"kind": "numeric", **self.values.to_json()}
        return d

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "ColumnStats":
        values = None
        v = d.get("values")
        if v is not None:
            kind = v.pop("kind", "numeric")
            values = StringStats.from_json(v) if kind == "string" else NumericStats.from_json(v)
        return cls(
            total=d["total"], nulls=d["nulls"], distinct=d["distinct"], indexed=d.get("indexed", False), values=values
        )


@dataclass
class TableStats:
    """Reference ``dqo/db/models.py:68-78`` (rows, pages, 8 KB pages →
    size); for parquet we record real file bytes."""

    rows: int = 0
    bytes: int = 0

    @property
    def size(self) -> int:
        return self.bytes

    def to_json(self) -> dict[str, Any]:
        return {"rows": self.rows, "bytes": self.bytes}

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "TableStats":
        return cls(rows=d["rows"], bytes=d["bytes"])


def _measure_expr(col: Column) -> F.Column | None:
    """The numeric measurement of a column: identity for numerics,
    epoch seconds for time (``postgres.py:199-200``), None for types
    without a single numeric measure (strings handled separately)."""
    c = F.col(col.name)
    if col.data_type in (DataType.FLOAT, DataType.NUMBER):
        return c.cast("double")
    if col.data_type == DataType.TIME:
        return F.unix_timestamp(c.cast("timestamp")).cast("double")
    if col.data_type == DataType.BOOL:
        return c.cast("double")
    return None


def _moment_aggs(name: str, m: F.Column) -> list[F.Column]:
    return [
        F.min(m).alias(f"{name}__min"),
        F.max(m).alias(f"{name}__max"),
        F.avg(m).alias(f"{name}__mean"),
        F.var_samp(m).alias(f"{name}__variance"),
        F.skewness(m).alias(f"{name}__skewness"),
        F.kurtosis(m).alias(f"{name}__kurtosis"),
    ]


def collect_stats(df: DataFrame, table_name: str, ndv_rsd: float = 0.02) -> Table:
    """Collect full reference-shaped stats for every column in TWO scans."""
    table = from_struct(table_name, df.schema)

    # ---- scan 1: counts, nulls, NDV, moments for every column at once
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__rows")]
    measures: dict[str, F.Column] = {}
    string_measures: dict[str, tuple[F.Column, F.Column]] = {}
    for col in table.columns:
        c = F.col(col.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{col.name}__nulls"))
        aggs.append(F.approx_count_distinct(col.name, rsd=ndv_rsd).alias(f"{col.name}__ndv"))
        m = _measure_expr(col)
        if m is not None:
            measures[col.name] = m
            aggs.extend(_moment_aggs(col.name, m))
        elif col.data_type == DataType.STRING:
            chars = F.length(c).cast("double")
            words = F.when(
                F.length(F.trim(c)) == 0, F.lit(0.0)
            ).otherwise(F.size(F.split(F.trim(c), r"\s+")).cast("double"))
            string_measures[col.name] = (chars, words)
            for suffix, expr in (("chars", chars), ("words", words)):
                aggs.extend(_moment_aggs(f"{col.name}__{suffix}", expr))

    row = df.agg(*aggs).collect()[0].asDict()
    total = row["__rows"]

    # ---- scan 2: all histograms in one aggregation of conditional sums
    hist_specs: list[tuple[str, F.Column, float, float]] = []  # (key, measure, mn, mx)
    for name, m in measures.items():
        mn, mx = row[f"{name}__min"], row[f"{name}__max"]
        if mn is not None and mx is not None:
            hist_specs.append((name, m, float(mn), float(mx)))
    for name, (chars, words) in string_measures.items():
        for suffix, expr in (("chars", chars), ("words", words)):
            key = f"{name}__{suffix}"
            mn, mx = row[f"{key}__min"], row[f"{key}__max"]
            if mn is not None and mx is not None:
                hist_specs.append((key, expr, float(mn), float(mx)))

    hist_rows: dict[str, Any] = {}
    if hist_specs:
        hist_aggs = []
        for key, m, mn, mx in hist_specs:
            width = (mx - mn) / HIST_BUCKETS
            if width <= 0:
                bucket = F.when(m.isNotNull(), F.lit(0))
            else:
                bucket = F.when(m.isNotNull(), F.least(F.lit(HIST_BUCKETS - 1), F.floor((m - mn) / width)))
            for b in range(HIST_BUCKETS):
                hist_aggs.append(F.sum(F.when(bucket == b, 1).otherwise(0)).alias(f"{key}__b{b}"))
        hist_rows = df.agg(*hist_aggs).collect()[0].asDict()

    def numeric_stats(key: str) -> NumericStats:
        mn, mx = row.get(f"{key}__min"), row.get(f"{key}__max")
        ns = NumericStats(
            min=mn,
            mean=row.get(f"{key}__mean"),
            max=mx,
            variance=row.get(f"{key}__variance"),
            skewness=row.get(f"{key}__skewness"),
            kurtosis=row.get(f"{key}__kurtosis"),
        )
        if mn is not None and mx is not None:
            width = (float(mx) - float(mn)) / HIST_BUCKETS or 1.0
            ns.hist = [[float(mn) + b * width, float(mn) + (b + 1) * width] for b in range(HIST_BUCKETS)]
            ns.freq = [int(hist_rows.get(f"{key}__b{b}", 0) or 0) for b in range(HIST_BUCKETS)]
        # null bucket appended, as in the reference (postgres.py:138)
        ns.hist.append(None)
        nulls_key = key.split("__")[0]
        ns.freq.append(int(row.get(f"{nulls_key}__nulls", 0) or 0))
        return ns

    for col in table.columns:
        cs = ColumnStats(
            total=total,
            nulls=int(row[f"{col.name}__nulls"] or 0),
            distinct=int(row[f"{col.name}__ndv"] or 0),
        )
        if col.name in measures:
            cs.values = numeric_stats(col.name)
        elif col.name in string_measures:
            cs.values = StringStats(
                chars=numeric_stats(f"{col.name}__chars"), words=numeric_stats(f"{col.name}__words")
            )
        col.stats = cs

    nbytes = 0
    try:
        import os

        for f_path in df.inputFiles():
            p = f_path.removeprefix("file:")
            if os.path.exists(p):
                nbytes += os.path.getsize(p)
    except Exception:  # noqa: BLE001 — inputFiles unsupported on some sources
        nbytes = 0
    table.stats = TableStats(rows=total, bytes=nbytes)
    return table


def estimate_size(dt: DataType) -> int:
    """Per-type size weight (reference ``gerelt/v20/encoder.py:153``)."""
    return {
        DataType.BOOL: 1,
        DataType.NUMBER: 8,
        DataType.FLOAT: 8,
        DataType.TIME: 8,
        DataType.STRING: 64,
        DataType.ARRAY: 256,
        DataType.BINARY: 1024,
    }[dt]


# English letter relative frequencies — the reference's LIKE-pattern
# selectivity prior (``gerelt/v20/encoder.py:121-148,289-313``)
LETTER_FREQ = {
    "e": 0.127, "t": 0.091, "a": 0.082, "o": 0.075, "i": 0.070, "n": 0.067,
    "s": 0.063, "h": 0.061, "r": 0.060, "d": 0.043, "l": 0.040, "c": 0.028,
    "u": 0.028, "m": 0.024, "w": 0.024, "f": 0.022, "g": 0.020, "y": 0.020,
    "p": 0.019, "b": 0.015, "v": 0.010, "k": 0.008, "j": 0.002, "x": 0.002,
    "q": 0.001, "z": 0.001,
}


def like_selectivity(pattern: str, avg_len: float = 20.0) -> float:
    """Estimated match probability of ``col LIKE pattern`` from letter
    frequencies (reference ``encoder.py:121-148``): the literal chars'
    joint frequency gives the per-position substring probability; a
    floating pattern (%...%) may match at any of ~(avg_len - m + 1)
    positions. Anchored patterns don't get the position multiplier."""
    literal = [c for c in pattern if c not in ("%", "_")]
    if not literal:
        return 1.0
    p_sub = 1.0
    for ch in literal:
        p_sub *= LETTER_FREQ.get(ch.lower(), 0.03)
    floating = pattern.startswith("%") and pattern.endswith("%")
    if floating:
        positions = max(avg_len - len(literal) + 1.0, 1.0)
        sel = 1.0 - (1.0 - p_sub) ** positions
    else:
        sel = p_sub
    return float(min(1.0, max(1e-6, sel)))


def selectivity(stats: ColumnStats, op: str, value: float) -> float:
    """Histogram-based selectivity of ``col op value`` — the estimator's
    operand-probability lookup (reference
    ``gerelt/v20/encoder.py:166-197``). Used by the guided generator to
    pick promising mutations without running the query."""
    ns = stats.values if isinstance(stats.values, NumericStats) else None
    if ns is None or not ns.freq or ns.min is None or ns.max is None:
        return 0.5
    counted = sum(ns.freq[:-1]) or 1
    if op in ("=", "=="):
        if stats.distinct:
            return min(1.0, 1.0 / stats.distinct)
        return 1.0 / counted
    if op in ("!=", "<>"):
        return 1.0 - selectivity(stats, "=", value)
    lo, hi = float(ns.min), float(ns.max)
    if hi <= lo:
        return 0.5
    frac = min(1.0, max(0.0, (value - lo) / (hi - lo)))
    # interpolate within the bucket histogram
    acc = 0.0
    for bucket, f_cnt in zip(ns.hist[:-1], ns.freq[:-1]):
        b_lo, b_hi = bucket
        if value >= b_hi:
            acc += f_cnt
        elif value > b_lo:
            acc += f_cnt * (value - b_lo) / (b_hi - b_lo or 1.0)
    below = acc / counted
    if op in ("<", "<="):
        return below
    if op in (">", ">="):
        return 1.0 - below
    return frac if not math.isnan(frac) else 0.5
