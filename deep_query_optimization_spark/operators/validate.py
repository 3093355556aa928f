"""Data-validation operators — constraint checks for pipeline inputs.

Beyond-reference capability: a training-data pipeline gates every
ingest on cheap distributed assertions. Each check is a single
aggregation or anti-join returning violation counts/rows, never a
driver-side loop:

- ``uniqueness``: duplicate-key count via one groupBy.
- ``referential_integrity``: orphan-FK rows via left-anti join
  (broadcast when the dimension is small).
- ``null_rates``: per-column null fractions in one pass.
- ``range_check`` / ``consistency_check``: row-level predicate
  violations counted in one scan.
- ``validate_table``: composition → one summary row per check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniqueness(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(n_keys, n_dup_keys, n_dup_rows) for a candidate key."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("n_dup_rows"),
    )


def referential_integrity(child: DataFrame, fk: str, parent: DataFrame, pk: str, broadcast_parent: bool = True) -> DataFrame:
    """Orphan child rows whose FK has no parent — left-anti join keyed
    on the FK; parent side broadcasts (dimension tables stay small)."""
    p = parent.select(F.col(pk).alias(fk)).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    return child.join(p, on=fk, how="left_anti")


def null_rates(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass per-column null fractions (long format)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols
    ]
    row = df.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return row.selectExpr("__total", f"stack({len(cols)}, {stack}) AS (column_name, nulls)").select(
        "column_name",
        F.col("nulls").cast("long").alias("nulls"),
        F.round(F.col("nulls") / F.col("__total"), 6).alias("null_rate"),
    )


def violation_count(df: DataFrame, predicate: Column, name: str) -> DataFrame:
    """Rows violating a row-level constraint (predicate = the VALID
    condition). A NULL-valued predicate (e.g. NULL operands) counts as
    a violation — ``~predicate`` would be NULL there and the bad row
    would silently pass the gate."""
    return df.agg(
        F.lit(name).alias("check"),
        F.sum(F.when(predicate, 0).otherwise(1)).cast("long").alias("violations"),
        F.count(F.lit(1)).alias("total"),
    )


def validate_table(checks: list[DataFrame]) -> DataFrame:
    """Union of ``violation_count`` outputs → one summary row per check."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
