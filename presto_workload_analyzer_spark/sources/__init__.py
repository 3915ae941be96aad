"""Sources & sinks: parquet test tables, summary JSONL, raw QueryInfo."""

from presto_workload_analyzer_spark.sources.tables import read_table, register_tables

__all__ = ["read_table", "register_tables"]
