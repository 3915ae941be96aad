"""Custom stateful streaming operator #2: per-key CUSUM drift alarms.

The classic sequential change detector (Page 1954) on the live path: per
key, accumulate deviations of a metric above a target and alarm when the
cumulated drift exceeds a threshold — catches slow upward drifts that
per-window z-scores (s11) miss because no single window is anomalous.

One-sided CUSUM recurrence S_t = max(0, S_{t-1} + (x_t - target - slack))
has the closed form S_t = P_t - min_{0<=j<=t} P_j with P the running sum
of deviations (P_0 = 0). The state is therefore TWO DOUBLES per key
(prefix sum, running min) — O(keys), the smallest possible stateful
footprint — and the closed form is exactly expressible with window
functions, which is what the batch oracle replays (no reset-on-alarm:
every threshold-exceeding row emits, so the recurrence stays closed-form
and the alarm stream is idempotent to re-drains).

Determinism contract: rows are processed per key in (ts, id) order within
each micro-batch delivery; with an event-time-ordered source (or a
single-batch drain, the harness case) the output is exactly the batch
formulation. Under cross-batch disorder the detector remains a valid
monitor but is only approximately the batch answer — same caveat class as
every streaming/batch pair here, documented rather than hidden.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALARM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("s_plus", T.DoubleType()),
    ]
)

# (prefix_sum P, running_min m) — m includes the P_0 = 0 baseline
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)


def _cusum_fn(target: float, slack: float, threshold: float):
    shift = target + slack

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in ALARM_SCHEMA.fields])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        p, m = state.get if state.exists else (0.0, 0.0)
        out = []
        for ts, eid, x in zip(rows["ts"], rows["event_id"], rows["value"]):
            x = float(x)
            if x != x or x in (float("inf"), float("-inf")):
                # a single NaN/Inf would poison p and m FOREVER (every
                # later comparison false -> the key silently stops
                # alarming); skip the observation instead
                continue
            p += x - shift
            m = min(m, p)
            s = p - m
            if s > threshold:
                out.append(
                    {"key": k, "ts": ts, "event_id": int(eid), "s_plus": s}
                )
        state.update((p, m))
        yield pd.DataFrame(out, columns=[f.name for f in ALARM_SCHEMA.fields])

    return fn


def cusum_alarms(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 10.0,
) -> DataFrame:
    """Keyed CUSUM drift alarms over a stream: rows whose cumulated
    above-target drift S exceeds `threshold` — (key, ts, event_id,
    s_plus). `target` is the in-control mean, `slack` the per-observation
    allowance (half the shift you want to detect, in CUSUM practice)."""
    sel = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull())
    return sel.groupBy("key").applyInPandasWithState(
        _cusum_fn(target, slack, threshold),
        outputStructType=ALARM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
