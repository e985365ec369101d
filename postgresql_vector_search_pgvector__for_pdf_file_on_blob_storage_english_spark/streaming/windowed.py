"""Event-time streaming aggregations over the events stream.

The reference has no streaming aggregation surface (SURVEY.md §2.5:
stateless trigger only) — these operators are the engine-substrate
extension for training-data telemetry at scale: the same rollups the
batch registry runs (events_hourly_rollup, sessionize_events_30m),
expressed as Structured Streaming with watermarked event time, so they
run continuously over an arriving event log with bounded state.

Design notes (100 TB / unbounded-stream posture):

* watermark bounds state: hourly windows with a 2h watermark hold at
  most ~3 open windows per key group in the state store;
* the aggregation is partial-agg friendly (count/sum), so each
  micro-batch shuffles one partial row per (window, event_type) per
  task, not events;
* ``available_now`` drains a backlog with the same code that runs
  continuously — batch parity is tested (stream result == batch
  rollup), which is exactly the property ``foreachBatch`` pipelines
  rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, value double, props string, ts timestamp"
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming scan of an events directory (parquet, micro-second ts)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked hourly (window x event_type) counts/sums — the
    streaming twin of the batch ``events_hourly_rollup`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_hourly_rollup(
    spark: SparkSession,
    events_dir: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Drain the backlog into a parquet rollup (Trigger.AvailableNow).

    ``complete`` output over foreachBatch-overwrite keeps the sink
    idempotent per restart; in continuous mode the same query runs with
    ``update``/``append`` against an upsert sink.
    """
    rollup = hourly_rollup_stream(read_events_stream(spark, events_dir), watermark)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    return (
        rollup.writeStream.outputMode("complete")
        .foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_hourly_rollup_incremental(
    spark: SparkSession,
    events_dir: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
):
    """Incremental maintenance of the rollup: ``update`` output mode
    emits only the (window, event_type) rows each micro-batch changed;
    they are appended with the batch id, and :func:`read_rollup`
    resolves last-write-wins per key.

    Contrast with :func:`run_hourly_rollup` (complete mode, rewrites
    everything): at scale the complete rewrite is O(|all hours|) per
    trigger while this is O(|touched hours|) — the difference between
    re-materializing a year and touching the current hour.  On a
    transactional table the append+resolve becomes a keyed MERGE.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    rollup = hourly_rollup_stream(reader.parquet(events_dir), watermark)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id).cast("long")).write.mode("append").parquet(out_path)

    return (
        rollup.writeStream.outputMode("update")
        .foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, out_path: str) -> DataFrame:
    """Resolve the incremental append log: latest update per
    (hour, event_type) wins."""
    from pyspark.sql import Window

    log = spark.read.parquet(out_path)
    w = Window.partitionBy("hour", "event_type").orderBy(F.col("_batch_id").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )
