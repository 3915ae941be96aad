"""Custom stateful streaming operator: per-user query-activity sessions.

Nothing in the reference is stateful (its only loop is the collector poll),
but a live workload dashboard wants exactly this: contiguous bursts of
per-user query activity, closed after `gap` of inactivity — arbitrary-gap
sessionization, which tumbling/sliding windows cannot express. This is the
engine's `applyInPandasWithState` escape hatch (SURVEY.md §2B-streaming):
a keyed state machine over an unbounded stream with event-time timeouts.

Semantics per user:
  * arriving queries (sorted by event time) extend the open session while
    each is within `gap` seconds of the previous one;
  * a larger jump closes the session immediately (emitted this batch) and
    opens a new one;
  * the open session is held in state with an event-time timeout at
    last_seen + gap: when the WATERMARK passes it (no more late data
    possible), the session is emitted and the state removed. State size is
    O(active users), not O(events) — bounded, like every stateful op here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_queries", T.LongType()),
        T.StructField("scheduled_sum", T.DoubleType()),
    ]
)

# open-session accumulator: epoch micros + counters
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sched", T.DoubleType()),
    ]
)


def _session_fn(gap_seconds: float):
    gap_us = int(gap_seconds * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key

        def row(start_us: int, last_us: int, n: int, sched: float) -> dict[str, Any]:
            return {
                "user": user,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_queries": n,
                "scheduled_sum": sched,
            }

        closed: list[dict] = []
        if state.hasTimedOut:
            # watermark passed last_seen + gap: the open session is final
            start_us, last_us, n, sched = state.get
            closed.append(row(start_us, last_us, n, sched))
            state.remove()
        else:
            events = pd.concat(list(pdfs), ignore_index=True)
            events = events.sort_values("query_ts")
            # normalize to ns first: Arrow may deliver datetime64[us] or
            # [ns] depending on version, and a silent unit mismatch would
            # skew every boundary 1000x
            ts_us = events["query_ts"].astype("datetime64[ns]").astype("int64") // 1000
            sched = events["scheduled_time"].fillna(0.0)

            cur = list(state.get) if state.exists else None
            for t, s in zip(ts_us, sched):
                t = int(t)
                if cur is None:
                    cur = [t, t, 0, 0.0]
                elif t - cur[1] > gap_us:
                    closed.append(row(*cur))
                    cur = [t, t, 0, 0.0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += float(s)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] // 1000 + int(gap_seconds * 1000))

        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def query_sessions(stream: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Summary stream (with query_ts watermark) -> closed session records.

    Input must carry `user`, `query_ts` (watermarked) and `scheduled_time`;
    FAILED queries are excluded like every analyzer (analyze.py:1233-1234).
    """
    finished = stream.filter(F.col("state") != "FAILED").select(
        "user", "query_ts", "scheduled_time"
    )
    return finished.groupBy("user").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
