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

        # Null keys are a legitimate value (a null-keyed true heavy
        # hitter must survive — ADVICE r9), but value_counts() drops
        # them and NaN index alignment across batches is fragile, so
        # the null counter is tracked out-of-band as a scalar and takes
        # part in the (k+1)-th-largest deduction like any other key.
        counters = pd.Series(dtype="int64")
        null_cnt = 0
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[key_col]
            null_cnt += int(col.isna().sum())
            vc = col.dropna().value_counts()
            combined = counters.add(vc, fill_value=0).astype("int64")
            n_keys = len(combined) + (1 if null_cnt > 0 else 0)
            if n_keys > k:
                vals = sorted(
                    combined.tolist() + ([null_cnt] if null_cnt > 0 else []),
                    reverse=True,
                )
                d = int(vals[k])
                combined = combined - d
                combined = combined[combined > 0]
                null_cnt = max(0, null_cnt - d)
            counters = combined
        if len(counters) or null_cnt > 0:
            out = pd.DataFrame({key_col: counters.index, "cnt": counters.values})
            if null_cnt > 0:
                out = pd.concat(
                    [out, pd.DataFrame({key_col: [None], "cnt": [null_cnt]})],
                    ignore_index=True,
                )
            yield out

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
    # eqNullSafe: a null candidate key must still semi-join its rows
    # (plain equality never matches null = null, which would drop a
    # null-keyed heavy hitter right after the summary preserved it).
    cand_keys = F.broadcast(candidates.select(F.col(key_col).alias("_cand_k")))
    exact = (
        df.join(cand_keys, F.col(key_col).eqNullSafe(F.col("_cand_k")), "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_true") * (k + 1) > F.col("_n"))
        .select(key_col, "n_true")
    )
