"""Deterministic corpus sampling: hash splits, fraction samples, group caps.

Training-data pipelines must subset corpora REPRODUCIBLY — the same document
must land in the same split on every run, on any cluster size, regardless of
partitioning (rand()/TABLESAMPLE give none of that). The standard trick is
content-hash bucketing: bucket = hash(id) mod B, split by bucket range.

Scale design: every operator here is a pure narrow projection + filter — no
shuffle, no state, trivially parallel at any corpus size; Catalyst pushes the
bucket filter straight down onto the scan's residual predicate.

Hash choice: first two hex digits of md5(id) (256 buckets) — md5 is
bit-identical in every engine (the DuckDB oracle reproduces it digit by
digit), and 256 buckets give 0.4% split-granularity, plenty for train/val
splits. xxhash64 mod B is the (faster) JVM-only variant when cross-engine
reproducibility isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_BUCKETS = 256


def hash_bucket(id_col: Column | str, mode: str = "md5") -> Column:
    """Deterministic bucket in [0, 256) from a document id.

    md5 mode: value of the first two hex digits — portable to any engine.
    xxhash64 mode: JVM-side, ~10x cheaper, Spark-only.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if mode == "md5":
        return F.conv(F.substring(F.md5(c.cast("string")), 1, 2), 16, 10).cast("int")
    if mode == "xxhash64":
        return F.pmod(F.xxhash64(c.cast("string")), F.lit(HASH_BUCKETS)).cast("int")
    raise ValueError(f"unknown hash mode {mode!r}")


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    mode: str = "md5",
) -> DataFrame:
    """Assign every row a reproducible split label by hash-bucket range.

    splits maps label -> fraction (must sum to <= 1; remainder label is None,
    letting callers carve a holdout by under-allocating). Fractions are
    quantized to 1/256 — the label boundaries are bucket indices, so a row's
    split depends only on its id, never on run order or partitioning.
    """
    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}
    if sum(splits.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions must sum to <= 1")
    b = hash_bucket(id_col, mode=mode)
    expr: Column | None = None
    lo = 0
    for label, frac in splits.items():
        hi = lo + int(round(frac * HASH_BUCKETS))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo = hi
    return df.withColumn("split", expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float, mode: str = "md5") -> DataFrame:
    """Keep a reproducible ~fraction of rows (bucket < fraction*256).

    Unlike df.sample(), re-running — or running on a different cluster —
    keeps exactly the same rows; sampling composes stably across tables
    sharing the id (sample documents and their embeddings consistently).
    """
    cutoff = int(round(fraction * HASH_BUCKETS))
    return df.filter(hash_bucket(id_col, mode=mode) < cutoff)


def stratified_cap(
    df: DataFrame, group_cols: list[str], order_col: str, cap: int
) -> DataFrame:
    """Keep at most `cap` rows per group, by deterministic order_col order.

    The group-balancing primitive (cap documents per language / per domain /
    per dedup cluster). One window shuffle on the group key; at 100 TB the
    heavy groups are exactly the ones being capped, so AQE skew handling
    applies to the pathological key before the filter drops its excess.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
