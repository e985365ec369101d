"""Custom stateful streaming operator — running per-user event stats
via ``applyInPandasWithState``.

The demonstration case for operators Spark's built-in windowed aggs
can't express: arbitrary per-key state evolved across micro-batches
(counters here; the same harness carries dedup-seen sets, rate
trackers, or online quality monitors).  State is one narrow row per
user — the 100 TB posture is "state size ~ |keys|, never ~ |events|".
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# built without fromDDL: parsing DDL needs an active session, and this
# module must be importable before one exists
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        [(user_id, n, s, m)], columns=["user_id", "n_events", "sum_value", "max_value"]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events stream -> one updated (user_id, n, sum, max) row per user
    per micro-batch in which the user appeared."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
