"""Synthetic data generation matching observed column distributions.

Reference ``dqo/lab/data_generator.py`` (§2.7):

- histogram-faithful ints/floats (``:37-72``): sample a bucket by its
  observed frequency, then uniform within the bucket.
- string-kind inference (``:100-216``): classify a column as
  Categorical (<10% distinct) / Pattern (fixed shape) / Speech
  (multi-word) / Chars, then generate accordingly.
- ``randomize_col`` dispatch by DataType with monotonic-id
  continuation (``:219-241``).
- table faker (``dqo/datasets/faker.py``) + ``scale()`` stub
  (``lab/data_scaler.py:23-31``) — here implemented for real via
  sample/union.

Scale design: generation is ``spark.range(n)`` + vectorized column
expressions — distributed, no driver-side loops; a 10-billion-row
synthetic table is one range + map, not a Python loop.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deep_query_optimization_spark.catalog import DataType, Table
from deep_query_optimization_spark.stats import ColumnStats, NumericStats, StringStats


def _unit_uniform(id_col: Column, salt: int) -> Column:
    """Pure deterministic uniform in [0,1) from a row id: xxhash64 is a
    pure function, so every occurrence inside a when-chain sees the
    SAME value. (``F.rand`` is stateful per expression instance — in a
    conditional chain each branch's stream advances only when
    evaluated, silently biasing cumulative-weight sampling.)"""
    return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(2**40)).cast("double") / float(2**40)


def hist_faithful_numeric(
    stats: NumericStats, seed: int, integer: bool = False, id_col: Column | None = None
) -> Column:
    """Column expression sampling the observed 10-bucket histogram:
    cumulative-weight bucket pick + uniform within the bucket
    (reference ``data_generator.py:37-72``), fully vectorized."""
    if id_col is None:
        id_col = F.monotonically_increasing_id()
    freqs = stats.freq[:-1] if stats.freq else []
    total = sum(freqs)
    if not total or not stats.hist or stats.hist[0] is None:
        lo = float(stats.min if stats.min is not None else 0.0)
        hi = float(stats.max if stats.max is not None else lo + 1.0)
        expr = F.lit(lo) + _unit_uniform(id_col, seed) * (hi - lo)
        return expr.cast("long") if integer else expr
    r = _unit_uniform(id_col, seed * 2 + 1)
    u = _unit_uniform(id_col, seed * 2 + 2)
    acc = 0.0
    expr: Column | None = None
    cases = []
    for bucket, f_cnt in zip(stats.hist[:-1], freqs):
        acc += f_cnt / total
        lo, hi = bucket
        cases.append((acc, F.lit(lo) + u * (hi - lo)))
    expr = cases[-1][1]
    for threshold, value in reversed(cases[:-1]):
        expr = F.when(r < threshold, value).otherwise(expr)
    return expr.cast("long") if integer else expr


# -- string-kind inference (reference :100-216) -------------------------

CATEGORICAL, PATTERN, SPEECH, CHARS = "categorical", "pattern", "speech", "chars"


def infer_string_kind(values: list[str], distinct_ratio: float) -> str:
    if distinct_ratio < 0.10:
        return CATEGORICAL
    sample = [v for v in values if v][:200]
    if not sample:
        return CHARS
    if sum(1 for v in sample if " " in v.strip()) > len(sample) * 0.5:
        return SPEECH
    # Pattern: uniform length and shared non-alnum skeleton (e.g. a-b#c)
    lengths = {len(v) for v in sample}
    skeletons = {"".join(ch if not ch.isalnum() else "" for ch in v) for v in sample}
    if len(lengths) <= 2 and (len(skeletons) == 1 and next(iter(skeletons))):
        return PATTERN
    return CHARS


def _rand_word(rng: random.Random) -> str:
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 9)))


def generate_string_column(
    kind: str,
    n_rows: int,
    seed: int,
    categories: list[str] | None = None,
    template: str | None = None,
    mean_words: float = 8.0,
) -> Column:
    """Vectorized string generation per inferred kind."""
    rng = random.Random(seed)
    if kind == CATEGORICAL:
        cats = categories or [_rand_word(rng) for _ in range(8)]
        arr = F.array(*[F.lit(c) for c in cats])
        return F.element_at(arr, (F.floor(F.rand(seed) * len(cats)) + 1).cast("int"))
    if kind == PATTERN:
        tmpl = template or "XX-9999"
        parts: list[Column] = []
        for ch in tmpl:
            if ch == "X":
                letters = F.array(*[F.lit(c) for c in string.ascii_uppercase])
                parts.append(F.element_at(letters, (F.floor(F.rand(rng.randint(0, 1 << 30)) * 26) + 1).cast("int")))
            elif ch == "9":
                parts.append(F.floor(F.rand(rng.randint(0, 1 << 30)) * 10).cast("int").cast("string"))
            else:
                parts.append(F.lit(ch))
        return F.concat(*parts)
    if kind == SPEECH:
        vocab = [_rand_word(rng) for _ in range(64)]
        arr = F.array(*[F.lit(w) for w in vocab])
        n_words = (F.floor(F.rand(seed) * (2 * mean_words - 1)) + 1).cast("int")
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(arr, (F.pmod(F.xxhash64(i, F.rand(seed + 1) * (1 << 30)), 64) + 1).cast("int")),
        )
        return F.array_join(words, " ")
    # CHARS: md5 slices of a random number — arbitrary-looking tokens
    return F.substring(F.md5((F.rand(seed) * (1 << 40)).cast("long").cast("string")), 1, 12)


def randomize_col(dt: DataType, stats: ColumnStats | None, seed: int, id_col: Column | None = None) -> Column:
    """Dispatch by DataType (reference ``:219-241``); NUMBER columns
    with near-unique distinct ratio continue monotonically from the id
    (the reference's monotonic-id continuation)."""
    if dt == DataType.NUMBER:
        if stats is not None and stats.distinct_ratio > 0.95 and id_col is not None:
            return id_col.cast("long")  # key-like: keep monotonic ids
        ns = stats.values if stats and isinstance(stats.values, NumericStats) else NumericStats(min=0, max=1000)
        return hist_faithful_numeric(ns, seed, integer=True, id_col=id_col)
    if dt == DataType.FLOAT:
        ns = stats.values if stats and isinstance(stats.values, NumericStats) else NumericStats(min=0.0, max=1.0)
        return hist_faithful_numeric(ns, seed, id_col=id_col)
    if dt == DataType.TIME:
        ns = stats.values if stats and isinstance(stats.values, NumericStats) else None
        lo = float(ns.min) if ns and ns.min is not None else 8.0e8
        hi = float(ns.max) if ns and ns.max is not None else 1.0e9
        return F.timestamp_seconds(F.lit(lo) + F.rand(seed) * (hi - lo))
    if dt == DataType.BOOL:
        return F.rand(seed) < 0.5
    if dt == DataType.STRING:
        ss = stats.values if stats and isinstance(stats.values, StringStats) else None
        mean_words = ss.words.mean if ss and ss.words.mean else 3.0
        kind = SPEECH if mean_words and mean_words > 1.5 else CHARS
        categories = None
        if stats is not None and stats.distinct_ratio < 0.10:
            kind = CATEGORICAL
            # honor the observed cardinality (values themselves aren't
            # kept in ColumnStats — same as the reference's faker)
            n_cats = max(1, min(int(stats.distinct), 64))
            rng = random.Random(seed)
            categories = [_rand_word(rng) for _ in range(n_cats)]
        return generate_string_column(kind, 0, seed, categories=categories, mean_words=mean_words or 3.0)
    return F.lit(None)


def fake_table(spark: SparkSession, table: Table, n_rows: int, seed: int = 0) -> DataFrame:
    """Generate a whole table from its stats snapshot (reference
    ``faker.py:10-54``) — one distributed range + column expressions."""
    df = spark.range(n_rows)
    cols = []
    for i, col in enumerate(table.columns):
        if col.data_type in (DataType.ARRAY, DataType.BINARY):
            continue  # non-scalar extensions are synthesized elsewhere
        cols.append(randomize_col(col.data_type, col.stats, seed + i * 97, id_col=F.col("id")).alias(col.name))
    return df.select(*cols)


def scale_table(df: DataFrame, factor: float, seed: int = 0) -> DataFrame:
    """Inflate (union of resampled copies) or deflate (sample) a table
    — the reference's ``scale()`` stub (``data_scaler.py:23-31``),
    implemented distributed."""
    if factor <= 1.0:
        return df.sample(fraction=factor, seed=seed)
    out = df
    whole, frac = int(factor) - 1, factor - int(factor)
    for i in range(whole):
        out = out.unionAll(df.sample(fraction=1.0, seed=seed + i, withReplacement=True))
    if frac > 0:
        out = out.unionAll(df.sample(fraction=frac, seed=seed + whole))
    return out
