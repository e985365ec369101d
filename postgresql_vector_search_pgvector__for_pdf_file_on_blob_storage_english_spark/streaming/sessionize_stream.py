"""Streaming sessionization — THE canonical custom stateful operator
(30-minute inactivity gap), via ``applyInPandasWithState``.

The batch ``sessionize_events_30m`` assigns sessions with per-user
windows; a continuously-arriving event stream needs the per-user
``(last_ts, session_start)`` to persist across triggers so a session
that spans micro-batches is stitched, not split.  State is two longs
per ACTIVE user — never per event — and shards evenly on the user key.

Emission contract (what makes the replay gate exact): every event is
emitted exactly once, in the batch that carried it, labeled with its
session's START timestamp (micros).  A session is identified by its
start, so no "session close" flush is needed at drain time — the
label is already final for every emitted event (a later event can
only extend a session forward, never change its start), and the
drained stream equals the batch assignment row-for-row PROVIDED the
source feeds each user's events in event-time order across batches
(the replay entry splits its files by disjoint time ranges, which any
log-structured ingest satisfies).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 1800 * 1_000_000  # 30 minutes, matching the batch entry

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
    ]
)


def _assign_sessions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    # deterministic in-batch order: (ts, event_id) — the batch twin's
    # window ordering
    rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
    if state.exists:
        last_ts, sess_start = state.get
    else:
        last_ts, sess_start = None, None
    out = []
    for eid, ts in zip(rows["event_id"], rows["ts_us"]):
        ts = int(ts)
        if last_ts is None or ts - last_ts > GAP_US:
            sess_start = ts
        last_ts = ts
        out.append((int(user), int(eid), ts, int(sess_start)))
    state.update((int(last_ts), int(sess_start)))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "ts_us", "session_start_us"]
    )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts) -> per-event session
    labels with per-user state persisted across micro-batches."""
    prepped = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _assign_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming first-order transitions — the stateful twin of the batch
# events_markov_transitions entry (analytics_breadth.py).  The batch
# form lags within per-user windows; a stream needs each user's LAST
# (ts, event_id, event_type) to persist across triggers so the
# transition that straddles a micro-batch boundary is counted, not
# dropped.  State is two longs + one short string per ACTIVE user.
#
# Emission contract: one output row per event that HAS a predecessor
# (the user's first-ever event emits nothing), emitted in the batch
# that carried the successor event, labeled (from_type, to_type).
# Labels are final at emission (a later event never rewrites an
# earlier transition), so the drained sink folds to the batch matrix
# row-for-row under the same arrival-order precondition sessionize
# documents (per-user event-time order across batches).
# --------------------------------------------------------------------------

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)
TRANSITION_STATE = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _emit_transitions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
    if state.exists:
        last_ts, last_id, last_type = state.get
    else:
        last_ts, last_id, last_type = None, None, None
    out = []
    for eid, ts, et in zip(rows["event_id"], rows["ts_us"], rows["event_type"]):
        if last_type is not None:
            out.append((int(user), int(eid), last_type, str(et)))
        last_ts, last_id, last_type = int(ts), int(eid), str(et)
    state.update((last_ts, last_id, last_type))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "from_type", "to_type"]
    )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, event_type) -> one row per
    (predecessor, successor) transition with per-user state persisted
    across micro-batches."""
    prepped = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=TRANSITION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
