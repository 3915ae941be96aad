"""Parquet table reader that tolerates nanosecond timestamps.

The driver's synthetic tables (TESTDATA.md) store timestamps as parquet
TIMESTAMP(NANOS), which Spark's parquet reader refuses
(PARQUET_TYPE_ILLEGAL). With `spark.sql.legacy.parquet.nanosAsLong=true`
(set in session.get_spark) those columns arrive as nanosecond longs; here we
detect them from the parquet footer via pyarrow and restore proper
TimestampType (microsecond truncation — same thing DuckDB returns when
casting TIMESTAMP_NS to TIMESTAMP, so the correctness oracle agrees).

This is metadata-only work on the driver (one footer read per table); the
per-row conversion is a codegen'd DIV + timestamp_micros, no UDFs.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyarrow.types as pat
from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nano_ts_columns(path: str) -> list[str]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    return [
        field.name
        for field in schema
        if pat.is_timestamp(field.type) and field.type.unit == "ns"
    ]


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet + restore TimestampType for nano-stamped columns."""
    df = spark.read.parquet(path)
    for name in _nano_ts_columns(path):
        df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` DIV 1000")))
    return df


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out = {}
    for name in names or TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        df = read_table(spark, p)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
