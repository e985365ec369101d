"""Misra-Gries heavy hitters — the deterministic frequent-items summary.

The third mergeable-summary family next to count-min and KMV: a k-counter
Misra-Gries summary (Misra & Gries 1982) guarantees that after seeing N
items, every key's counter satisfies ``true - N/(k+1) <= counter <=
true`` — so every TRUE heavy hitter (frequency > N/(k+1)) survives in
the summary, with at most k counters of state.  Summaries MERGE
(Agarwal et al. 2012, "Mergeable Summaries"): sum counters key-wise,
then deduct the (k+1)-th largest and drop non-positives — the merged
summary keeps the same additive-error bound, which is what makes the
map-side shape work: one bounded summary per partition, one key-summed
reduction, never a full per-key aggregate.

Determinism contract: the SUMMARY's exact counter values depend on
arrival order and partitioning (inherent to MG), so they are never the
gated output.  What IS deterministic — and what :func:`heavy_hitters`
returns — is the verified report: candidates re-checked against exact
counts and filtered to true frequency > N/(k+1).  The guarantee makes
that report complete (a missing true heavy hitter is impossible), so
the output equals the exact answer while the heavy lifting stays
sketch-shaped — the same guarantee-gates-the-deterministic-subset
pattern the ANN recall entries use.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_partials(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most k ``(key, cnt)``
    rows per partition.  Each Arrow batch is reduced to exact value
    counts first (vectorized), then MG-merged into the partition's
    running summary with the sum-then-deduct rule."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_type = df.schema[key_col].dataType
    schema = T.StructType(
        [T.StructField(key_col, key_type), T.StructField("cnt", T.LongType())]
    )

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters = pd.Series(dtype="int64")
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf[key_col].value_counts()
            combined = counters.add(vc, fill_value=0).astype("int64")
            if len(combined) > k:
                d = int(combined.nlargest(k + 1).iloc[-1])
                combined = combined - d
                combined = combined[combined > 0]
            counters = combined
        if len(counters):
            yield pd.DataFrame(
                {key_col: counters.index, "cnt": counters.values}
            )

    return df.select(key_col).mapInPandas(summarize, schema)


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Verified heavy hitters: ``(key, n_true)`` for every key with
    exact frequency STRICTLY above N/(k+1), found via the MG candidate
    set and re-counted exactly.  The exact re-count scans only rows
    whose key is a candidate (a semi-join, <= numPartitions * k keys),
    so the full per-key aggregate never happens — at 100 TB the state
    that crosses the wire is one k-row summary per partition plus the
    candidates' own counts."""
    partials = mg_partials(df, key_col, k)
    candidates = partials.groupBy(key_col).agg(F.sum("cnt").alias("_est"))
    exact = (
        df.join(F.broadcast(candidates.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_true") * (k + 1) > F.col("_n"))
        .select(key_col, "n_true")
    )
