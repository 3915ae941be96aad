"""Query-timestamp derivation and truncation.

Presto query ids encode the submit timestamp in their first 15 characters
('yyyyMMdd_HHmmss_NNNNN_xxxxx'); the reference parses it with strptime
(reference analyze.py:62-63) and truncates with ad-hoc datetime rebuilds
(analyze.py:66-71). Here: `to_timestamp` + `date_trunc`, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def query_timestamp(query_id: Column | str) -> Column:
    """First 15 chars of query_id -> timestamp. Reference analyze.py:62-63."""
    col = F.col(query_id) if isinstance(query_id, str) else query_id
    return F.to_timestamp(F.substring(col, 1, 15), "yyyyMMdd_HHmmss")


def trunc_date(ts: Column | str) -> Column:
    """Truncate to midnight (kept as date). Reference analyze.py:70-71."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(col)


def trunc_hour(ts: Column | str) -> Column:
    """Truncate to the hour. Reference analyze.py:66-67."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_trunc("hour", col)
