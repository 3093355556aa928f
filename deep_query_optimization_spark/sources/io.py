"""Sources and sinks.

The reference's only sources were a live Postgres connection and CSV
workload files (``dqo/datasets``). Ours are the lake formats, with the
layout features that matter at 100 TB:

- ``read_any``: parquet / csv / json by extension, with the events
  nanos-timestamp workaround applied uniformly.
- ``write_partitioned``: hive-style partition directories →
  partition PRUNING at read time (the Spark replacement for the
  reference's index flags, SURVEY §2.4): a filter on the partition
  column skips whole directories, verified by ``PartitionFilters`` in
  the scan node.
- ``write_bucketed``: pre-shuffled bucket layout on a join key →
  bucket-local joins without an exchange. Requires ``saveAsTable``
  (metastore-backed), the standard way to co-locate two fact tables
  that are repeatedly joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_any(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.options(header=True, inferSchema=True, **options).csv(path)
    if fmt in ("json", "jsonl", "ndjson"):
        return spark.read.options(**options).json(path)
    raise ValueError(f"unsupported format: {fmt}")


def write_partitioned(df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet") -> None:
    """Partitioned lake layout. Pick LOW-cardinality columns (date,
    region, modality): each distinct value is a directory, and a
    million tiny directories is its own scale failure."""
    df.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table: both sides bucketed on the join key by
    the same bucket count join WITHOUT a shuffle (SortMergeJoin reads
    bucket files pair-wise).

    Idempotent across sessions: a fresh session's in-memory catalog
    does not know tables whose warehouse directories survive on disk,
    and ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS — drop
    the catalog entry AND any orphan location first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table_name}")
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def derived_date_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Standard date-partition derivation for event streams."""
    return df.withColumn("p_date", F.to_date(F.col(ts_col)))
