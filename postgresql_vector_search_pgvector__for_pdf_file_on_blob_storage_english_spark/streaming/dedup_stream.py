"""Streaming exact dedup — drop documents whose fingerprint was
already seen in ANY earlier micro-batch (cross-batch state), via
``applyInPandasWithState``.

The batch ``exact_dedup`` collapses duplicates within one dataset; a
continuously-arriving corpus needs the *seen set* to persist across
triggers.  State is one row per distinct fingerprint (first-seen doc id
+ count) — state size ~ |distinct docs|, never ~ |events|; partitioned
by fingerprint so the state store shards evenly (md5 keys are uniform
by construction).

Emitted per micro-batch: one row per fingerprint that appeared,
flagged ``is_new`` (first time ever) with the running duplicate count —
the information a downstream filter needs to keep exactly the first
occurrence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("first_doc_id", T.LongType()), T.StructField("n_seen", T.LongType())]
)


def _update_seen(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    batch_min_id, batch_n = None, 0
    for pdf in pdfs:
        batch_n += len(pdf)
        m = int(pdf["doc_id"].min())
        batch_min_id = m if batch_min_id is None else min(batch_min_id, m)
    if state.exists:
        first_id, n_seen = state.get
        is_new = False
    else:
        first_id, n_seen = batch_min_id, 0
        is_new = True
    n_seen += batch_n
    state.update((first_id, n_seen))
    yield pd.DataFrame(
        [(fp, first_id, n_seen, is_new)],
        columns=["fingerprint", "first_doc_id", "n_seen", "is_new"],
    )


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs stream -> per-batch (fingerprint, first_doc_id, n_seen,
    is_new) updates with the seen-set persisted in the state store."""
    from ..functions.text import normalize_whitespace_col

    fingerprinted = docs.select(
        "doc_id", F.md5(normalize_whitespace_col(text_col)).alias("fingerprint")
    )
    return fingerprinted.groupBy("fingerprint").applyInPandasWithState(
        _update_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
