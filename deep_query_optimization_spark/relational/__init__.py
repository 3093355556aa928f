"""Set-based relational Query IR + mutation builder.

Reference: ``dqo/relational/query/__init__.py`` (the set view),
``dqo/relational/models.py`` (building blocks),
``dqo/query_generator/query_builder.py`` (mutations).

We deliberately do NOT rebuild the reference's ``RelationalTree`` /
PLY SQL parser (``dqo/relational/sql/ast.py``, ``dqo/relational/tree``):
Spark SQL parses and Catalyst builds/optimizes the logical tree. The
set-based ``Query`` survives because it is the workload generators'
mutation substrate and is engine-agnostic; plan introspection happens on
Spark's own optimized plan (see ``plans/``).
"""

from deep_query_optimization_spark.relational.models import (  # noqa: F401
    ColumnRef,
    Condition,
    Join,
    Projection,
    TableRef,
)
from deep_query_optimization_spark.relational.query import Query  # noqa: F401
from deep_query_optimization_spark.relational.builder import QueryBuilder  # noqa: F401
