"""Reusable aggregation kernels + the analyzer (query) surface."""

from presto_workload_analyzer_spark.operators.kernels import (
    pie_collapse,
    selectivity_histogram,
    top_k_keys,
)
from presto_workload_analyzer_spark.operators import analyzers  # noqa: F401
from presto_workload_analyzer_spark.operators.joins import join_pairs

__all__ = ["pie_collapse", "selectivity_histogram", "top_k_keys", "join_pairs", "analyzers"]
