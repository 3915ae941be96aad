"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in presto_workload_analyzer_spark/driver_queries.py,
which adapts the synthetic tables onto the engine's silver contracts and
runs the genuine analyzer code (operators/analyzers.py) for each entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from presto_workload_analyzer_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus load-by-day over the sf0.001 synthetic workload."""
    return driver_queries.queries()["a01_scheduled_by_date"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
