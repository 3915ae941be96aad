"""Order-sensitive streaming pattern detection (CEP-lite): funnel
conversions over an unbounded event stream.

The missing class between the declarative stateful ops (windows, joins,
dedup) and full CEP: "did B follow A within H, with no C in between" is
order-SENSITIVE — a stream-stream interval join (joins.py) finds every
(signup, purchase) pair in the horizon but cannot express "the purchase
consumes the most recent arm" or "an error in between cancels it".
That is a per-key state machine, this engine's `applyInPandasWithState`
escape hatch (same execution model as sessions.py).

Semantics per user, in event-time order (ties by event_id):
  * `signup`  ARMS the funnel (re-arming overwrites the previous arm);
  * `error`   DISARMS it;
  * `purchase` CONSUMES the arm: emits a conversion row
    (user, signup_ts, purchase_ts, latency) iff the purchase is within
    `horizon` of the arm, and disarms either way;
  * every other event type is ignored.

Equivalent batch formulation (the correctness oracle): a purchase
converts iff its immediately-preceding RELEVANT event (signup / error /
purchase) is a signup within the horizon — one lag() window. The state
machine is the unbounded form of that lag.

Scale: state is ONE timestamp per currently-armed user — O(active
users), not O(events) — and an event-time timeout at arm + horizon
garbage-collects arms no purchase can ever convert (eager removal is
semantically identical to lazy expiry because a beyond-horizon purchase
never emits and a later signup re-arms from scratch). Conversions are
emitted in the batch that processes the purchase, so the drained output
carries no watermark-dependent residue (unlike session closure).
Cross-batch caveat (shared with every event-time state machine): an
event arriving in a later micro-batch than a same-user successor is
seen out of order; the watermark delay bounds how late that can be.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONVERSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("signup_ts", T.TimestampType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("latency_s", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("armed_us", T.LongType())])

_OUT_COLS = [f.name for f in CONVERSION_SCHEMA.fields]


def _funnel_fn(horizon_seconds: float):
    hor_us = int(horizon_seconds * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        out: list[dict] = []
        if state.hasTimedOut:
            # watermark passed arm + horizon: no purchase can convert it
            state.remove()
        else:
            ev = pd.concat(list(pdfs), ignore_index=True)
            ev = ev.sort_values(["ts", "event_id"])
            # normalize to ns first: Arrow may deliver [us] or [ns]
            # depending on version (same guard as sessions.py)
            ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
            armed = int(state.get[0]) if state.exists else None
            for t, et in zip(ts_us, ev["event_type"]):
                t = int(t)
                if et == "signup":
                    armed = t
                elif et == "error":
                    armed = None
                elif et == "purchase":
                    if armed is not None:
                        if t - armed <= hor_us:
                            out.append(
                                {
                                    "user_id": user,
                                    "signup_ts": pd.Timestamp(armed, unit="us"),
                                    "purchase_ts": pd.Timestamp(t, unit="us"),
                                    "latency_s": (t - armed) / 1e6,
                                }
                            )
                        armed = None
            if armed is not None:
                state.update((armed,))
                state.setTimeoutTimestamp(
                    armed // 1000 + int(horizon_seconds * 1000)
                )
            elif state.exists:
                state.remove()
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def funnel_conversions(stream: DataFrame, horizon_seconds: float = 3600.0) -> DataFrame:
    """Event stream (watermarked `ts`, with `user_id`, `event_id`,
    `event_type`) -> conversion records per the module semantics.

    Irrelevant event types are filtered BEFORE the stateful operator so
    the Arrow transfer and the per-key sort only carry the three types
    the machine reads.
    """
    rel = stream.filter(
        stream.event_type.isin("signup", "error", "purchase")
    ).select("user_id", "ts", "event_id", "event_type")
    return rel.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(horizon_seconds),
        outputStructType=CONVERSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
