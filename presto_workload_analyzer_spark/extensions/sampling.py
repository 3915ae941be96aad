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


def resample_to_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_shares: dict[str, float],
    total: int,
) -> DataFrame:
    """Downsample to a target group mixture: at most share*total rows per
    group, chosen reproducibly (md5-of-id order within each group).

    The data-mixing step of a training pipeline — rebalance sources /
    languages / domains to a prescribed distribution. Downsample-only: a
    group with fewer rows than its quota keeps everything (the realized
    mix then under-fills that share; no row is ever duplicated). Groups
    absent from target_shares are DROPPED — the mixture is the contract.

    Deterministic given (id, shares, total): selection order is the md5 of
    the id, so reruns and different cluster layouts keep identical rows,
    consistent with every other sampler here. One window shuffle on the
    group key (same shape and skew posture as stratified_cap).
    """
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    if any(s < 0 for s in target_shares.values()):
        raise ValueError("shares must be >= 0")
    caps = {g: int(round(s * total)) for g, s in target_shares.items()}
    cap_col = None
    for g, cap in caps.items():
        cap_col = (
            F.when(F.col(group_col) == g, cap)
            if cap_col is None
            else cap_col.when(F.col(group_col) == g, cap)
        )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__cap", cap_col)
        .filter(F.col("__cap").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__cap"))
        .drop("__cap", "__rn")
    )


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
