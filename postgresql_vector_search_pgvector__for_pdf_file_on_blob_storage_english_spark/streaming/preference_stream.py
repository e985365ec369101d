"""Streaming maintenance of the Bradley-Terry pair matrix.

Preference data is inherently streaming — annotation batches, live
A/B judgments, judge-model verdicts — and the BT pair matrix
``(lo, hi, n, w_lo)`` (operators/preference.py::match_matrix) is a
MERGEABLE summary: counts add cell-wise, so each micro-batch appends
its own bounded matrix to a log-structured parquet and the
materialized matrix is the read-side fold.  Same law as the count-min
log (streaming/sketch_stream.py): addition is NOT replay-safe, so
every appended matrix is batch_id-stamped and the fold dedups
``(batch_id, lo, hi)`` by ``max`` before summing — a retried batch
writes bit-identical cells (``match_matrix`` is deterministic), so
the fold is exactly-once regardless of replays.

Strengths are recomputed from the folded matrix on read
(``bt_strengths_from_matrix``): the matrix is players^2-bounded, so
the MM iterations cost the same whether the log holds one batch or a
year of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.preference import match_matrix
from .sketch_stream import _stamped_batch_id


def stream_into_bt_matrix(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    winner_col: str = "winner",
    loser_col: str = "loser",
    available_now: bool = True,
):
    """readStream of match rows -> per-batch pair matrix appended to
    the log at ``path``, batch_id-stamped for exactly-once folding."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        match_matrix(batch_df, winner_col, loser_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(path)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bt_matrix_read(spark, path: str) -> DataFrame:
    """Materialize the pair matrix from its log: per-batch dedup
    (``max`` — replayed appends are bit-identical) then cell-wise sum
    across batches.  Rejects logs mixing stamped and unstamped rows
    (the silent-merge hazard the sketch logs guard against)."""
    log = spark.read.parquet(path)
    return (
        log.groupBy(_stamped_batch_id(path).alias("batch_id"), "lo", "hi")
        .agg(F.max("n").alias("n"), F.max("w_lo").alias("w_lo"))
        .groupBy("lo", "hi")
        .agg(F.sum("n").alias("n"), F.sum("w_lo").alias("w_lo"))
    )
