"""Column-function helpers shared by the pipeline operators.

The crucial primitive is a *cross-engine deterministic* 64/32-bit hash:
``H(s) = int(md5(s)[:k], 16)`` — expressible as built-in functions in
both Spark (``conv(substr(md5(s),1,k),16,10)``) and DuckDB
(``('0x' || substr(md5(s),1,k))::BIGINT``), so every hash-based
operator (minhash, LSH, simhash, fingerprints) can be validated against
an exact SQL oracle. All JVM-side — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prime > 2^32 for minhash universal hashing; operands stay < 2^62
MINHASH_PRIME = 4294967311


def parallelize_input(df, max_partitions: int | None = None):
    """Spread a DataFrame across the cluster's cores before heavy
    per-row expression work. Small parquet inputs arrive as ONE split
    (a 2 MB file = 1 partition = 1 core doing all the shingling);
    operators must not inherit that. The repartition shuffles only the
    raw rows — cheap relative to the per-row work it parallelizes. No-op
    when the input already has enough partitions.

    ``max_partitions`` caps the spread for Python-worker stages
    (mapInPandas): each partition spawns a worker process, and 32 cold
    workers for a few thousand rows costs more than the work itself.
    At real scale inputs arrive with many partitions and this is a
    no-op either way.

    The partition-count probe uses ``inputFiles()`` (pure metadata)
    rather than ``df.rdd.getNumPartitions()`` — the RDD conversion
    builds a whole extra physical plan per call. For FEW large files,
    file count under-estimates scan width (the reader splits big files
    at ``spark.sql.files.maxPartitionBytes``), so the probe also sums
    file sizes (driver-side FileSystem metadata, cheap for few files)
    and skips the repartition when the byte-derived split count already
    reaches the target; a non-file source (in-memory test data)
    repartitions unconditionally, which is cheap at test sizes."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if max_partitions is not None:
        target = min(target, max_partitions)
    try:
        files = df.inputFiles()
        if len(files) >= target:
            return df
        if files:
            sc = spark.sparkContext
            jvm = sc._jvm
            hconf = sc._jsc.hadoopConfiguration()
            total = 0
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                total += p.getFileSystem(hconf).getFileStatus(p).getLen()
            max_bytes = jvm.org.apache.spark.util.Utils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
            )
            if max(len(files), total // max(max_bytes, 1)) >= target:
                return df
    except Exception:
        pass
    return df.repartition(target)


# Materialized-index caches, keyed per operator. Each new index for an
# operator releases the previous one, so long-lived sessions (bench
# loops, the driver's 50-query pass) hold at most one cached index per
# operator instead of leaking one per call. Guarded by a lock — Spark
# apps routinely submit queries from several driver threads.
import threading as _threading

_INDEX_CACHES: dict[str, object] = {}
_INDEX_LOCK = _threading.Lock()


def cache_index(df, key: str):
    """persist() ``df`` as the materialized index for ``key``,
    unpersisting the previous index registered under the same key."""
    with _INDEX_LOCK:
        prev = _INDEX_CACHES.pop(key, None)
        if prev is not None:
            prev.unpersist(blocking=False)
        df.persist()
        _INDEX_CACHES[key] = df
    return df


def release_caches() -> None:
    """Unpersist every tracked index cache (end-of-run cleanup)."""
    with _INDEX_LOCK:
        while _INDEX_CACHES:
            _, df = _INDEX_CACHES.popitem()
            df.unpersist(blocking=False)


def hash64(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (md5 prefix)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash32(col: Column | str) -> Column:
    """32-bit deterministic hash (md5 prefix) — safe operand for
    universal hashing mod a 33-bit prime inside int64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def words(col: Column | str) -> Column:
    """Whitespace tokenization, identical to DuckDB
    ``regexp_split_to_array(trim(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column as an array —
    pure JVM expression (transform over sequence), no UDF.

    r12: the words array is BOUND once per row via
    ``transform(array(words), λw → …)[0]``. Catalyst does not hoist
    lambda-invariant subexpressions out of higher-order functions, so
    the previous form — ``slice(words(col), …)`` inside the per-shingle
    lambda — re-split the text once PER SHINGLE: O(words × chars) char
    work per row where O(chars) suffices (guide §1.2 step 2, per-task
    work). Output is bit-identical (same strings, same order; A/B'd
    with exceptAll = 0 both ways); measured ~2.3× on the shingle
    explode stage at sf0.1."""

    def shingles_of(w: Column) -> Column:
        # guard: texts with < n words have no n-gram shingles. The bare
        # sequence(0, size-n) form crashed there — Spark's sequence(0,-1)
        # is the DESCENDING [0,-1], not empty, feeding slice a 0 start
        # (latent since round 1; unreachable on the gate corpora, which
        # have no < n-word docs — behavior for every non-crashing,
        # non-null input is unchanged; NULL text now propagates as NULL
        # where the old form returned [''] — pinned in pytest, and all
        # current consumers explode the array so rows are identical).
        return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
                )
            )
        )

    return F.transform(F.array(words(col)), shingles_of)[0]


def shingle_hash_array(col: Column | str, n: int = 3) -> Column:
    """DISTINCT shingle hashes of one text as an array — fully map-side.

    Equivalent to ``explode(word_shingles) → filter ≠'' → hash32 →
    distinct (id, hv)``, but the dedup runs inside the row via
    ``array_distinct`` (each doc's shingles live in one array, so
    per-row distinct IS the per-doc distinct) — no Exchange, no
    aggregate. r12 optimization (guide §2.4: remove shuffles outright)."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.filter(word_shingles(c, n), lambda s: s != F.lit(""))
    return F.array_distinct(F.transform(kept, lambda s: hash32(s)))


def salted_join(left, right, key: str, n_salts: int = 16, how: str = "inner"):
    """Skew-mitigated equi-join: the skewed (left) side gets a random
    salt in [0, n_salts); the small/replicated (right) side is exploded
    across all salts. The shuffle key becomes (key, salt), splitting a
    hot key's rows over ``n_salts`` reducers.

    AQE's skew-join handling (on by default in ``session.get_spark``)
    covers most cases by splitting oversized partitions at runtime;
    salting is the manual fallback when a SINGLE key exceeds one
    executor (the classic null-key / celebrity-user case at 100 TB).
    The salt is a pure hash of the whole left row id via
    monotonically-increasing id — deterministic within a run.

    This variant replicates the ENTIRE right side ``n_salts``× — simple
    and fine when the right side is small. When only a handful of keys
    are hot, ``salted_join_hot`` salts just those and plain-joins the
    rest."""
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt_l)
    rhs = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = lhs.join(rhs, [key, "__salt"], how)
    return out.drop("__salt")


def hot_keys(df, key: str, sample_fraction: float = 0.01, threshold_rows: int | None = None, max_keys: int = 100, seed: int = 7) -> list:
    """Estimate heavy-hitter join keys from a deterministic sample.

    A key is hot when its estimated row count exceeds
    ``threshold_rows`` (default: rows / shuffle-partitions — more than
    one reducer's fair share; total rows estimated from the SAME sample
    as ``sample_count / sample_fraction``, so the only scan is the
    sampled one). The sample bounds driver cost: one small scan + a
    top-``max_keys`` collect, never a full groupBy or count of the
    fact table."""
    spark = df.sparkSession
    counts = df.sample(fraction=sample_fraction, seed=seed).groupBy(key).count()
    counts.persist()  # one fact-table scan; both actions below read the cache
    try:
        if threshold_rows is None:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            row = counts.agg(F.sum("count")).first()
            sample_total = row[0] or 0
            est_total = sample_total / max(sample_fraction, 1e-9)
            threshold_rows = max(int(est_total) // max(parts, 1), 1)
        sample_thresh = max(int(threshold_rows * sample_fraction), 1)
        rows = (
            counts.filter(F.col("count") >= sample_thresh)
            .orderBy(F.col("count").desc())
            .limit(max_keys)
            .collect()
        )
    finally:
        counts.unpersist(blocking=False)
    return [r[0] for r in rows]


def salted_join_hot(
    left,
    right,
    key: str,
    n_salts: int = 16,
    hot: list | None = None,
    sample_fraction: float = 0.01,
):
    """PARTIAL salting — the production skew pattern: detect the
    heavy-hitter keys (``hot_keys`` sample estimate unless given),
    salt ONLY those rows, and plain-join everything else. The right
    side replicates ``n_salts``× only for the hot keys (a handful of
    rows), not the whole table — at 100 TB replicating a 1 B-row
    dimension 32× is its own incident. Inner joins only (the
    hot/cold split double-counts unmatched rows under outer modes).
    Result is identical to the plain join (oracle-checked in the
    ``salted_join_agg`` gate)."""
    if hot is None:
        hot = hot_keys(left, key, sample_fraction)
    if not hot:
        return left.join(right, key)
    cold = left.filter(~F.col(key).isin(hot) | F.col(key).isNull()).join(right, key)
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs_hot = left.filter(F.col(key).isin(hot)).withColumn("__salt", salt_l)
    rhs_hot = (
        right.filter(F.col(key).isin(hot))
        .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    )
    hot_joined = lhs_hot.join(rhs_hot, [key, "__salt"], "inner").drop("__salt")
    return cold.unionByName(hot_joined)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine between two float-array columns, computed JVM-side with
    ``zip_with``/``aggregate`` — no UDF. Elements are upcast to double
    BEFORE multiplying so each term is the exact double product of the
    float32 inputs; with the same left-to-right accumulation order the
    result is bit-identical to the DuckDB oracle's explicit formula."""

    def dbl(x):
        return x.cast("double")

    dot = F.aggregate(F.zip_with(a, b, lambda x, y: dbl(x) * dbl(y)), F.lit(0.0), lambda acc, v: acc + v)
    na = vector_norm(a)
    nb = vector_norm(b)
    return dot / (na * nb)


def vector_norm(v: Column) -> Column:
    """L2 norm of a float-array column (double-upcast, left fold)."""

    def dbl(x):
        return x.cast("double")

    return F.sqrt(F.aggregate(F.transform(v, lambda x: dbl(x) * dbl(x)), F.lit(0.0), lambda acc, v_: acc + v_))


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine given precomputed norms — per-PAIR work drops to one dot
    product; norms are computed once per ROW. Identical arithmetic to
    ``cosine_similarity`` (same fold, same upcast), so oracle results
    are unchanged."""

    def dbl(x):
        return x.cast("double")

    dot = F.aggregate(F.zip_with(a, b, lambda x, y: dbl(x) * dbl(y)), F.lit(0.0), lambda acc, v: acc + v)
    return dot / (norm_a * norm_b)
