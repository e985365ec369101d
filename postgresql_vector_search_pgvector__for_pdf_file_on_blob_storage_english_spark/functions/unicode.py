"""Unicode normalization for text-cleanup pipelines.

Web corpora mix composed (NFC) and decomposed (NFD) spellings of the
same grapheme ('é' vs 'e' + U+0301): every downstream equality — exact
dedup fingerprints, tokenizer vocab lookups, PII patterns — silently
treats them as different strings unless the corpus is normalized
first, which is why NFC is step one of most published cleanup stacks
(e.g. the mC4/OSCAR pipelines).

Spark has no built-in Unicode-normalization expression, so this is one
of the engine's few sanctioned Python hot-path UDFs: an Arrow-batched
pandas UDF over ``unicodedata.normalize`` (C-implemented, ~1e6 short
strings/s per core) — a pure map, zero shuffle, streamable.  The
cross-engine oracle is DuckDB's ``nfc_normalize``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def nfc_stats(df, text_col: str = "text", group_col: str | None = None):
    """Normalization impact report: per ``group_col`` (or corpus-wide),
    how many rows NFC actually changes and the total code-point length
    delta — the cheap pre-flight that tells a pipeline whether the
    normalization pass is a no-op for this corpus."""
    staged = df.withColumn("_nfc", nfc_normalize_udf(F.col(text_col)))
    changed = (F.col("_nfc") != F.col(text_col)).cast("long")
    delta = F.length(text_col) - F.length("_nfc")
    keys = [group_col] if group_col else []
    return staged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(changed).alias("n_changed"),
        F.sum(delta).alias("len_delta"),
    )
