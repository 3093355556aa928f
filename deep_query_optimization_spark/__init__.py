"""deep_query_optimization_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference system
``danield137/deep_query_optimization`` (a deep query-execution-time
estimation research stack that delegated execution to Postgres) as an
idiomatic Spark library:

- Spark SQL / Catalyst is the execution engine (the reference's Postgres).
- ``catalog``/``stats``: schema + statistics model (reference
  ``dqo/db/models.py``, ``dqo/db/clients/postgres.py``).
- ``relational``: set-based Query IR + mutation builder (reference
  ``dqo/relational/query``, ``dqo/query_generator/query_builder.py``).
- ``generator``: random / guided / balanced / RL workload generators
  (reference ``dqo/query_generator``).
- ``lab``: timed execution harness (reference ``dqo/lab/query_executor.py``).
- ``plans``: Spark plan ingestion + featurization (reference
  ``dqo/db/execution_plan.py``, ``dqo/estimator/gerelt/v20/encoder.py``).
- ``estimator``: labeled datasets, metrics, learned cost models
  (reference ``dqo/estimator``).
- ``operators``: scale-oriented data-pipeline operators (dedup,
  similarity search, text analysis, multimodal) beyond the reference.
- ``streaming``: Structured Streaming operators over the events table.
"""

__version__ = "0.1.0"

from deep_query_optimization_spark.session import get_spark  # noqa: F401
