"""Plan/task tree flattening: recursive JSON -> relational silver tables."""

from presto_workload_analyzer_spark.plans.flatten import (
    flatten_plan_nodes,
    flatten_tasks,
    iter_plan_rows,
    resolve_table_name,
)

__all__ = ["flatten_plan_nodes", "flatten_tasks", "iter_plan_rows", "resolve_table_name"]
