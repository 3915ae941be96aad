from presto_workload_analyzer_spark.streaming.funnel import funnel_conversions
from presto_workload_analyzer_spark.streaming.joins import interval_join
from presto_workload_analyzer_spark.streaming.sessions import query_sessions
from presto_workload_analyzer_spark.streaming.ingest import (
    idempotent_parquet_batch_sink,
    input_by_window,
    queries_by_window,
    run_to_memory,
    scheduled_by_window,
    state_partitions,
    stream_sf_table,
    stream_summaries,
    write_stream_foreach_batch,
    write_stream_parquet,
)

__all__ = [
    "funnel_conversions",
    "interval_join",
    "query_sessions",
    "idempotent_parquet_batch_sink",
    "input_by_window",
    "queries_by_window",
    "run_to_memory",
    "scheduled_by_window",
    "state_partitions",
    "stream_sf_table",
    "stream_summaries",
    "write_stream_foreach_batch",
    "write_stream_parquet",
]
