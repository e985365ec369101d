"""Streaming maintenance of the ROC-AUC score-count log.

AUC needs only the (quantized score, label) HISTOGRAM of the scored
stream (operators/evalmetrics.py — the Mann-Whitney identity runs on
per-score positive/negative counts), and histograms merge by ADDITION,
so the streaming shape is the count-min/quantile-sketch log pattern:
each micro-batch appends its own bounded per-score count table stamped
with the batch id, and the materialized AUC is the read-side fold.
The appended summary is bounded by the batch's distinct quantized
scores regardless of batch size; a retried batch writes bit-identical
counts (groupBy-count is deterministic), so the per-batch ``max``
dedup makes the fold exactly-once under replays — the same discipline
``stream_countmin_replay`` gates.

Use: score a live corpus stream with a quality classifier, log the
score histogram against a proxy label, and read back a running AUC —
scorer health monitoring without retaining a single scored row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.evalmetrics import _quantized, auc_from_score_counts
from .sketch_stream import _stamped_batch_id


def stream_into_score_counts(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    score_col: str,
    label_col: str,
    scale: int = 100,
    available_now: bool = True,
):
    """readStream of (score, label) rows -> per-batch per-score count
    table ``(_s, _pos, _neg, batch_id)`` appended to the log at
    ``path``.  Addition merge law -> batch-stamped appends, exactly as
    the count-min log."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                _quantized(score_col, scale).alias("_s"),
                F.col(label_col).cast("boolean").alias("_y"),
            )
            .groupBy("_s")
            .agg(
                F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
                F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_neg"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(path)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def score_counts_read(spark, path: str) -> DataFrame:
    """Materialize the merged per-score count relation from the log:
    per-(batch, score) dedup (``max`` — replayed counts are
    bit-identical) through the shared null-stamp guard, then score-wise
    sum (the merge law)."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(_stamped_batch_id(path).alias("batch_id"), "_s")
        .agg(F.max("_pos").alias("_pos"), F.max("_neg").alias("_neg"))
        .groupBy("_s")
        .agg(F.sum("_pos").alias("_pos"), F.sum("_neg").alias("_neg"))
    )


def auc_from_log(spark, path: str) -> DataFrame:
    """Running AUC from the streamed log — identical output contract to
    the batch ``auc_roc`` (``n_pos, n_neg, auc_micro``) on the same
    rows, gated by ``stream_auc_replay``.  The cumulative window runs
    on the distinct-quantized-score relation the log already reduced
    every batch to — bounded by the score DOMAIN (scale x range), never
    by stream volume."""
    return auc_from_score_counts(score_counts_read(spark, path), [])


def calibration_from_log(
    spark, path: str, n_bins: int = 10, scale: int = 100
) -> DataFrame:
    """Running reliability table from the SAME streamed log
    :func:`auc_from_log` reads — the score histogram determines both
    metrics, so one log feeds ranking health AND calibration health.
    Output contract identical to the batch ``calibration_bins`` on the
    same rows (gated by ``stream_calibration_replay``)."""
    from ..operators.evalmetrics import calibration_from_score_counts

    return calibration_from_score_counts(
        score_counts_read(spark, path), [], n_bins=n_bins, scale=scale
    )


def stream_into_residual_counts(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    group_col: str,
    resid_col: str,
    available_now: bool = True,
):
    """readStream of (group, nonconformity) rows -> per-batch per-group
    residual histogram ``(group, _r, _c, batch_id)`` appended to the
    log at ``path`` — the conformal-coverage twin of the score-count
    log (round 11).  The serving layer computes each row's
    nonconformity |y - yhat| against the FROZEN calibration model;
    monitoring needs only the histogram, which merges by addition ->
    batch-stamped appends, deterministic counts, ``max`` dedup."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                F.col(group_col).alias("_g"), F.col(resid_col).alias("_r")
            )
            .groupBy("_g", "_r")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(path)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def residual_counts_read(spark, path: str) -> DataFrame:
    """Merged per-group residual histogram from the log: per-(batch,
    group, r) dedup (counts are deterministic -> ``max``) through the
    shared null-stamp guard, then addition fold."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(_stamped_batch_id(path).alias("batch_id"), "_g", "_r")
        .agg(F.max("_c").alias("_c"))
        .groupBy("_g", "_r")
        .agg(F.sum("_c").alias("_c"))
    )
