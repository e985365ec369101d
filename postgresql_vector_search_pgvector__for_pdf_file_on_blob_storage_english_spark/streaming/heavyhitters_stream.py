"""Streaming maintenance of Misra-Gries heavy-hitter summaries.

MG summaries are mergeable (operators/heavyhitters.py), so the
streaming shape is the sketch-log pattern count-min and KMV use: each
micro-batch APPENDS its own bounded summary (<= numPartitions * k
rows) to a log-structured parquet, and the materialized candidate set
is the read-side key-sum of the log.  Batch stamps make replays
exactly-once exactly as in the count-min log (a retried batch rewrites
bit-identical... MG summaries are NOT bit-deterministic, so instead of
max-collapse dedup the stamp dedup keeps the FIRST write wins — see
``mg_read``).

The cross-batch guarantee: each batch's summary under-counts its own
slice by at most N_b/(k+1); sums telescope, so the merged candidates
contain every key with total frequency > N_total/(k+1) — the verified
report downstream stays complete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.heavyhitters import mg_partials
from .sketch_stream import _stamped_batch_id


def stream_into_mg(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    k: int = 8,
    available_now: bool = True,
):
    """readStream of keyed rows -> per-batch MG summary appended to the
    log at ``path``, stamped with the batch id.  Unlike count-min, a
    replayed batch's summary is NOT guaranteed bit-identical (MG is
    arrival-order-dependent), so the read side dedups whole batches by
    stamp (first file per (batch_id, key) wins) rather than cell-wise
    max — either replica is a valid MG summary of the same rows, so
    the guarantee is unaffected by which one survives."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        mg_partials(batch_df, key_col, k).groupBy(key_col).agg(
            F.sum("cnt").alias("cnt")
        ).withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(path)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mg_read(spark, path: str, key_col: str) -> DataFrame:
    """Materialize the merged candidate relation ``(key, est)`` from
    the log: per-(batch, key) dedup (min — a replayed batch may write a
    different but equally valid summary; picking one deterministic
    representative keeps the fold replayable), then key-wise sum.  The
    null-stamp guard rides in the fold's group key (zero extra jobs on
    clean logs, like every sketch log)."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(_stamped_batch_id(path).alias("batch_id"), key_col)
        .agg(F.min("cnt").alias("cnt"))
        .groupBy(key_col)
        .agg(F.sum("cnt").alias("est"))
    )


def verified_heavy_hitters_from_log(
    spark,
    path: str,
    df: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """The verified report over a streamed log: candidates from
    :func:`mg_read`, exact re-count against ``df`` (the same relation
    the stream consumed), filter to true frequency > N/(k+1) — the
    deterministic output the batch :func:`~..operators.heavyhitters.
    heavy_hitters` produces, now fed by streamed state."""
    candidates = mg_read(spark, path, key_col)
    # eqNullSafe mirrors the batch operator: a null-keyed candidate
    # must still match its rows in the exact re-count.
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
