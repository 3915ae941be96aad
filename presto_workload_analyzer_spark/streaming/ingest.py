"""Structured Streaming ingest: continuous workload-log analytics.

Reference surface: the collector's poll loop (collect.py:83-122) — an
unbounded, at-least-once, dedup-by-file-id ingest of completed queries —
plus the hourly/daily analyzers which, on a live cluster, are naturally
continuous (SURVEY.md §2B-streaming). The reference has no streaming
engine; it re-runs analyze.py over the whole corpus. Rebuild: the landing
directory written by a thin collector becomes a file-source stream, and the
time-bucketed analyzers become watermarked tumbling-window aggregations, so
the cluster-load dashboards update incrementally instead of re-scanning
history.

Scale posture:
  * file source with `maxFilesPerTrigger` — bounded micro-batches no matter
    how far behind the stream falls;
  * dedup state bounded by `dropDuplicatesWithinWatermark` — the reference
    dedups by file existence forever (collect.py:101-103), which is
    unbounded state; a watermark on the query timestamp (encoded in
    query_id) keeps state proportional to the late-data horizon;
  * windowed aggs emit in append mode after watermark close — the sink
    receives each hour bucket exactly once, so the downstream report read
    is a plain parquet scan, no upsert logic.
"""

from __future__ import annotations

import contextlib as _contextlib

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from presto_workload_analyzer_spark.functions import query_timestamp
from presto_workload_analyzer_spark.sources.queryinfo import SUMMARY_SCHEMA

DEFAULT_WATERMARK = "2 hours"


def stream_summaries(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    max_files_per_trigger: int | None = None,
    dedup: bool = True,
) -> DataFrame:
    """Landing dir of summary JSONL(.gz) -> deduped streaming DataFrame.

    Adds `query_ts` (from the query_id prefix, analyze.py:62-63) and a
    watermark; duplicate query_ids within the watermark horizon are dropped
    (the collector's at-least-once delivery, collect.py:101-103).
    """
    reader = spark.readStream.schema(SUMMARY_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = (
        reader.json(landing_dir)
        .withColumn("query_ts", query_timestamp(F.col("query_id")))
        .withWatermark("query_ts", watermark)
    )
    if dedup:
        df = df.dropDuplicatesWithinWatermark(["query_id"])
    return df


def _finished(df: DataFrame) -> DataFrame:
    # FAILED rows are collected but not analyzed (reference analyze.py:1233-1234)
    return df.filter(F.col("state") != "FAILED")


def scheduled_by_window(df: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Streaming twin of scheduled_by_hour/date (analyze.py:83-130).

    Tumbling window over query_ts; sum of scheduled time scaled to hours
    (1h windows) or days (1d windows).
    """
    divisor = 86400.0 if duration in ("1 day", "24 hours") else 3600.0
    return (
        _finished(df)
        .groupBy(F.window("query_ts", duration).alias("bucket"))
        .agg((F.sum("scheduled_time") / divisor).alias("scheduled"))
        .select(F.col("bucket.start").alias("bucket"), "scheduled")
    )


def queries_by_window(df: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Streaming twin of queries_by_hour/date (analyze.py:175-214)."""
    return (
        _finished(df)
        .groupBy(F.window("query_ts", duration).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_queries"))
        .select(F.col("bucket.start").alias("bucket"), "n_queries")
    )


def input_by_window(df: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Streaming twin of input_by_hour/date (analyze.py:133-172); TB read."""
    return (
        _finished(df)
        .groupBy(F.window("query_ts", duration).alias("bucket"))
        .agg((F.sum("input_size") / 1e12).alias("input_tb"))
        .select(F.col("bucket.start").alias("bucket"), "input_tb")
    )


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = False,
):
    """Windowed aggregate stream -> parquet sink with checkpointing.

    append mode + watermark ⇒ each closed window lands exactly once.
    `available_now=True` drains the backlog and stops (batch-like runs and
    tests); otherwise the query runs until stopped.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A synthetic testdata table as a file-source stream.

    Handles three quirks of the driver's parquet: single-file layout (the
    file source requires a directory or glob — a one-character glob class
    keeps basePath a directory), TIMESTAMP(NANOS) columns (arriving as
    nano longs under nanosAsLong; converted to micros like sources.tables),
    and TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (arriving as
    TIMESTAMP_NTZ, which event-time operators — withWatermark, window,
    session_window — reject; cast to session-tz TimestampType, value-
    preserving under the engine's pinned UTC session timezone).
    """
    import os

    from presto_workload_analyzer_spark.sources.tables import (
        _nano_ts_columns,
        read_table,
    )

    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = read_table(spark, path).schema
    nano_cols = set(_nano_ts_columns(path))
    raw_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType)
            for f in schema.fields
        ]
    )
    glob_path = f"{path[:-1]}[{path[-1]}]"
    df = spark.readStream.schema(raw_schema).parquet(glob_path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    for f in raw_schema.fields:
        if f.name not in nano_cols and isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def idempotent_parquet_batch_sink(base_path: str):
    """foreachBatch sink function: each micro-batch lands in its own
    `batch=<id>/` directory with overwrite semantics.

    Structured Streaming guarantees a replayed micro-batch keeps its
    batchId, so overwrite-by-batchId makes redelivery idempotent — the
    standard exactly-once recipe for sinks with no transactional commit
    (reference collect.py achieves the same with skip-if-file-exists,
    collect.py:101-103). Downstream reads `base_path` recursively as one
    partitioned dataset.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{base_path}/batch={batch_id}")

    return _sink


def write_stream_foreach_batch(
    df: DataFrame,
    checkpoint: str,
    batch_fn,
    available_now: bool = False,
):
    """Arbitrary-sink streaming write via foreachBatch.

    `batch_fn(batch_df, batch_id)` runs on the driver per micro-batch with
    a BATCH DataFrame — full batch API available (merge/upsert, JDBC,
    multi-table fan-out). Exactly-once is the sink's job: make batch_fn
    idempotent in batch_id (see idempotent_parquet_batch_sink); the
    checkpoint guarantees a batch is redelivered with the same id after a
    crash, never skipped and never renumbered.
    """
    writer = df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


@_contextlib.contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Scope `spark.sql.shuffle.partitions` around a streaming query start.

    Stateful operators allocate one state store per shuffle partition per
    operator, and the partition count is frozen into the checkpoint at
    first start — so a stream inherits the BATCH shuffle default unless
    told otherwise. Size it to the stream (throughput x key cardinality),
    not to the corpus: on local micro-batches the per-store open/commit
    overhead dominates (measured ~2x end-to-end for the s-queries at 8 vs
    32); on a real cluster the same knob is how you stop a small dimension
    stream from fragmenting into a thousand tiny stores.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drain the stream into an in-memory table (tests/dev only).

    Complete-mode drains skip the trailing NO-DATA micro-batch (r16):
    availableNow runs one batch over the backlog and then a no-data batch
    whose only jobs are watermark advancement and final-result emission
    for APPEND-mode operators — in complete mode the sink already holds
    the full aggregation state after the data batch and watermark
    eviction is disabled, so the extra batch recomputes the identical
    table and costs a second full stateful-commit cycle (measured
    0.7-1.5 s of the ~2.2 s per-drain floor; s01 2.9 -> 1.0 s with
    identical rows). Append-mode drains keep it: outer-join results and
    closed windows only emit on that final watermark advance (verified:
    disabling it globally changes s02/s05 results). The conf is scoped
    around start() — a streaming query captures the session conf when it
    starts, the same contract state_partitions relies on."""
    spark = df.sparkSession
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if output_mode != "complete":
        return writer.start()
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        return writer.start()
    finally:
        spark.conf.set(key, old)
