from deep_query_optimization_spark.plans.parser import (  # noqa: F401
    PlanNode,
    parse_optimized_plan,
    physical_summary,
)
from deep_query_optimization_spark.plans.encoder import PlanEncoder  # noqa: F401
