"""Custom stateful streaming: per-user sessionization with
applyInPandasWithState — the arbitrary-stateful-operator pattern the
reference's long-lived maestro process embodies (per-accession state
machine advanced by events, `maestro.h:8-45`), expressed as Structured
Streaming state.

Semantics match the batch `sessionize_users` query (gap > ``gap_sec``
starts a new session): each user's GroupState holds the OPEN session
(start, last-event second, count); a micro-batch folds its events in
event order, emitting every session it CLOSES; an event-time timeout
closes a session when the watermark passes last_sec + gap (so quiet
users still emit without waiting for their next event — the streaming
behavior a batch window can't express).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start long, session_end long, "
                  "n_events long")
_STATE_SCHEMA = "start long, last long, n long"


def _fold_user(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState, gap_sec: int) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    closed: list[tuple[int, int, int, int]] = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_start",
                                                "session_end", "n_events"])
        return
    start, last, n = state.get if state.exists else (None, None, 0)
    # ONE sort across every Arrow chunk of the micro-batch: per-chunk
    # sorting lets a later chunk's earlier event regress `last` and move
    # the open session's end backwards (round-3 advice finding).
    secs = sorted(int(s) for pdf in pdfs for s in pdf["sec"])
    # Events OLDER than the open session's start (admitted late by a
    # watermark longer than the gap, arriving in a later micro-batch)
    # fold into their own chronological sessions first; the trailing one
    # merges into the open session when within the gap. An ultra-late run
    # separated from the open start by more than the gap emits as its own
    # closed session — it may split what a full-history batch fold would
    # have merged with even earlier (already-emitted) events; that
    # divergence is bounded by the watermark and preferable to corrupting
    # the open session (which a naive fold-in does).
    if start is not None:
        late = [s for s in secs if s < start]
        secs = secs[len(late):]
        if late:
            l_start = l_last = late[0]
            l_n = 1
            for s in late[1:]:
                if s - l_last > gap_sec:
                    closed.append((user_id, l_start, l_last, l_n))
                    l_start = l_last = s
                    l_n = 1
                else:
                    l_last, l_n = s, l_n + 1
            if start - l_last <= gap_sec:
                start, n = l_start, n + l_n      # extends the open session
            else:
                closed.append((user_id, l_start, l_last, l_n))
    for sec in secs:
        if start is None:
            start, last, n = sec, sec, 1
        elif sec - last > gap_sec:
            closed.append((user_id, start, last, n))
            start, last, n = sec, sec, 1
        else:
            # sec may fall INSIDE the open span (start <= sec <= last)
            # when state carries across micro-batches: never regress
            last, n = max(last, sec), n + 1
    if start is not None:
        state.update((start, last, n))
        # close via timeout once the watermark passes the gap
        state.setTimeoutTimestamp((last + gap_sec) * 1000)
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start",
                                            "session_end", "n_events"])


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      watermark: str = "1 hour") -> DataFrame:
    """events(user_id long, ts timestamp, ...) streaming DataFrame →
    closed sessions (user_id, session_start, session_end, n_events;
    bounds in epoch seconds). Works on a streaming input via
    applyInPandasWithState (event-time timeout closes idle sessions);
    state per user is O(1) — three longs — regardless of history."""
    from pyspark.sql import functions as F

    def fold(key, pdfs, state):
        return _fold_user(key, pdfs, state, gap_sec)

    keyed = (events
             .withWatermark("ts", watermark)
             .select("user_id", "ts",
                     F.unix_timestamp("ts").alias("sec"))
             .groupBy("user_id"))
    return keyed.applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)
