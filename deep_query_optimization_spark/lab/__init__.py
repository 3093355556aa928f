from deep_query_optimization_spark.lab.executor import (  # noqa: F401
    DatasetExecutor,
    FileQueryExecutor,
    SparkQueryRunner,
)
