"""Watermarked stream-stream joins.

The reference has no streaming engine at all (SURVEY.md §2B-streaming); on
a live cluster the natural next step past windowed rollups is correlating
two event streams — e.g. every query against the cluster-state snapshot it
ran under, or (in the driver's synthetic shape) purchases within a bounded
horizon of the signup that preceded them.

Spark-native: inner stream-stream join with watermarks on BOTH sides and a
time-range predicate. The range bound is what makes 100 TB feasible — it
lets the state store evict a buffered row as soon as the other side's
watermark passes its join horizon, so state is proportional to
rate x horizon, never to history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join right rows within [left_ts + lower, left_ts + upper].

    `keys` pairs (left_col, right_col) equi-join columns — callers alias
    the two sides apart first (stream-stream self-joins reuse the same
    source). Both inputs MUST already carry a watermark on their ts column;
    without one Spark cannot bound the join state and rejects the query in
    append mode.

    how='left_outer' emits the unmatched-left NULL row once the watermark
    passes the row's join horizon (left_ts + upper). CAVEAT at drain time:
    the final watermark stops `delay` short of the stream's max event
    time, so left rows inside that trailing horizon never get their NULL
    row in a finite drain — restrict the left side to rows at least
    (upper + delay) older than the stream end when comparing against a
    batch oracle (see the s09 driver query).
    """
    cond: Column = F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    cond &= F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    for lk, rk in keys:
        cond &= left[lk] == right[rk]
    return left.join(right, cond, how)
