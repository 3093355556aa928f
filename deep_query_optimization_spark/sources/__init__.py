from deep_query_optimization_spark.sources.io import (  # noqa: F401
    read_any,
    write_bucketed,
    write_partitioned,
)
