"""Stateful streaming sessionization — the custom stateful-operator shape
(`applyInPandasWithState`) the engine uses where built-in streaming
aggregations can't express the semantics.

Batch twins: the catalog's `sessionize` (plain window) and
`sessionize_scalable` (chunk-and-merge).  Here the SAME 30-min-gap
semantics run incrementally: per-user state carries (last event time,
session count, event count) across micro-batches, so an endless event
stream sessionsizes with O(users) state and no per-user shuffle history.
Arrow-batched like every Python stage in the engine — no per-row Python.

Equality with the batch operator is tested in tests/test_streaming.py
(stream drained with availableNow over time-ordered files == batch
result; in-order per-user arrival is the documented contract, as for any
event-time sessionizer fed from a time-partitioned log).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
STATE_SCHEMA = "last_ts double, n_sessions bigint, n_events bigint"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of running per-user session/event totals (one
    updated row per user per micro-batch that saw the user).

    ``state_ttl_seconds`` bounds the state store (ADVICE r02): idle
    users' state expires after that much processing time without new
    events, so a perpetual stream with a growing user population holds
    O(active users) state instead of O(all users ever) — the same
    bounded-state option dedup_stream exposes via its watermark.  An
    expired user who returns restarts their counters (semantically: any
    gap longer than the TTL is certainly > gap_seconds, so a NEW session
    begins either way; only the lifetime totals reset — the documented
    trade).  None keeps the unbounded exact form.
    """
    ttl = state_ttl_seconds

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if ttl is not None and state.hasTimedOut:
            state.remove()  # idle user: drop state, emit nothing
            return
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for ts in batch["ts"]:
                t = ts.timestamp()
                if last_ts is None or (t - last_ts) > gap_seconds:
                    n_sessions += 1
                last_ts = t
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        if ttl is not None:
            state.setTimeoutDuration(ttl * 1000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
