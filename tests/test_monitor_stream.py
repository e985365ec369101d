"""Streaming hourly-count monitor: drained stream == batch series,
replay idempotence, the shared mixed-log guard, and compaction."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.monitor_stream import (
    hourly_counts_compact,
    hourly_counts_read,
    stream_into_hourly_counts,
)


@pytest.fixture()
def event_rows(spark):
    d0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (i, d0 + datetime.timedelta(minutes=7 * i))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def _batch_hourly(df):
    return {
        r["hour"]: r["cnt"]
        for r in df.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


class TestHourlyCountStream:
    def test_drained_stream_equals_batch(self, spark, event_rows, tmp_path):
        src, log, ckpt = (str(tmp_path / d) for d in ("src", "log", "ckpt"))
        for i in range(3):
            event_rows.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        stream = (
            spark.readStream.schema(event_rows.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_into_hourly_counts(stream, log, ckpt)
        assert q.awaitTermination(120)
        got = {r["hour"]: r["cnt"] for r in hourly_counts_read(spark, log).collect()}
        assert got == _batch_hourly(event_rows)

    def test_replayed_batch_absorbed(self, spark, event_rows, tmp_path):
        log = str(tmp_path / "log")
        counts = event_rows.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        stamped = counts.withColumn("batch_id", F.lit(0).cast("long"))
        stamped.write.mode("append").parquet(log)
        stamped.write.mode("append").parquet(log)  # the replay
        got = {r["hour"]: r["cnt"] for r in hourly_counts_read(spark, log).collect()}
        assert got == _batch_hourly(event_rows)

    def test_mixed_null_stamp_log_raises(self, spark, event_rows, tmp_path):
        log = str(tmp_path / "log")
        counts = event_rows.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        counts.withColumn("batch_id", F.lit(0).cast("long")).write.mode(
            "append"
        ).parquet(log)
        counts.withColumn("batch_id", F.lit(None).cast("long")).write.mode(
            "append"
        ).parquet(log)
        with pytest.raises(Exception, match="mixes null and stamped"):
            hourly_counts_read(spark, log).collect()

    def test_compact_preserves_fold_and_descends_stamp(
        self, spark, event_rows, tmp_path
    ):
        log, c1, c2 = (str(tmp_path / d) for d in ("log", "c1", "c2"))
        counts = event_rows.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        for b in (0, 1):
            counts.withColumn("batch_id", F.lit(b).cast("long")).write.mode(
                "append"
            ).parquet(log)
        before = {
            (r["hour"],): r["cnt"] for r in hourly_counts_read(spark, log).collect()
        }
        hourly_counts_compact(spark, log, c1)
        after = {(r["hour"],): r["cnt"] for r in hourly_counts_read(spark, c1).collect()}
        assert after == before
        s1 = spark.read.parquet(c1).agg(F.min("batch_id")).first()[0]
        assert s1 == -1
        hourly_counts_compact(spark, c1, c2)
        s2 = spark.read.parquet(c2).agg(F.min("batch_id")).first()[0]
        assert s2 == -2
        with pytest.raises(ValueError, match="new path"):
            hourly_counts_compact(spark, log, log)
