"""Streaming changepoint monitoring: hourly event counts as a
log-structured summary, CUSUM scored on the read-side fold.

The hourly count relation is an ADDITIVE summary (per-hour sums merge
by addition), so it streams exactly like the count-min log
(sketch_stream.py): each micro-batch appends its own bounded (hour,
cnt) table stamped with ``batch_id``; the materialized series is the
read-side fold — per-batch dedup with ``max`` (a replayed batch's
counts are bit-identical, the build is deterministic) then per-hour
sum.  No state store, no watermark; the drained stream equals the
one-shot batch series exactly, so CUSUM over the fold is gated by the
SAME oracle SQL as the batch ``events_cusum_changepoint`` entry.

At scale: each batch appends at most |hours touched by the batch| rows
regardless of batch size; the monitor query reads the bounded hourly
log, never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch_stream import _compact_stamp, _stamped_batch_id


def stream_into_hourly_counts(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    available_now: bool = True,
):
    """readStream of timestamped rows -> per-batch hourly count table
    appended to the series log at ``path``, stamped for exactly-once
    folding (the additive-summary discipline of stream_into_countmin)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:00"
                ).alias("hour")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
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


def hourly_counts_read(spark, path: str) -> DataFrame:
    """Materialize the hourly series from its log: per-(batch, hour)
    dedup with ``max`` (replay-idempotent), then the per-hour sum (the
    merge law).  Mixed null/stamped logs raise inside the fold's group
    key (the shared guard)."""
    df = spark.read.parquet(path)
    if "batch_id" in df.columns:
        df = df.groupBy(
            _stamped_batch_id(path).alias("batch_id"), "hour"
        ).agg(F.max("cnt").alias("cnt"))
    return df.groupBy("hour").agg(F.sum("cnt").alias("cnt"))


def hourly_counts_compact(spark, path: str, dest: str) -> None:
    """Fold the series log to one summary at ``dest`` (new path + swap,
    never in-place), stamped strictly below any prior compact stamp."""
    if path == dest:
        raise ValueError("compact writes to a new path; swap after validation")
    src = spark.read.parquet(path)
    hourly_counts_read(spark, path).withColumn(
        "batch_id", F.lit(_compact_stamp(src)).cast("long")
    ).write.mode("overwrite").parquet(dest)
