"""SparkSession factory tuned for both local testing and cluster scale.

The reference delegated execution to a live Postgres connection
(``dqo/db/clients/postgres.py:241-316``); our equivalent of "connect to the
engine" is building a SparkSession with scale-appropriate defaults.

Design notes for 100 TB / 1000-executor deployments (we test on local[N]
but every default below is chosen to survive a 1000x scale-up):

- AQE on: runtime re-planning fixes shuffle-partition counts, converts
  sort-merge joins to broadcast when the built side turns out small, and
  splits skewed partitions — all essential at scale where static planning
  from stale stats is wrong.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE ceiling; AQE
  coalesces down. On a real cluster set it to ~2-3x total cores.
- Broadcast threshold left at default (10 MB) locally; dimension tables
  (region/nation/supplier in the TPC-H-ish schema) stay broadcastable at
  any scale factor because they grow sub-linearly.
- Arrow enabled so the unavoidable Python boundaries (pandas UDFs used by
  the multimodal/dedup operators) batch-transfer instead of pickling rows.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match ANSI oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "deep_query_optimization_spark"


def default_parallelism() -> int:
    """CPU budget: the driver exports SPARK_GRAFT_CPUS for local runs."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a cluster, ``master`` comes from spark-submit and is left alone;
    locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # parquet scans: keep splits small enough that a partition of a
        # 100 TB table still fits executor memory; 128 MB is the sweet
        # spot for columnar scans with pushed filters.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # our flat-scalar schema never needs per-row python; when pandas
        # UDFs do run, large batches amortize Arrow transfer.
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
