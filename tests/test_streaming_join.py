"""Stream-stream interval join == batch range join on the same data."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    _events,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.joins import (
    stream_stream_interval_join,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.windowed import (
    EVENTS_SCHEMA,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_equals_batch(spark, tmp_path):
    ev = _events(spark, SF).filter(F.col("user_id") < 30)
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)

    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id")
    )
    errors = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
        .filter(F.col("event_type") == "error")
        .select("user_id", "ts", "event_id")
    )
    joined = stream_stream_interval_join(
        clicks, errors, key="user_id", lower_s=0.0, upper_s=7200.0, watermark="1 hour"
    )
    sink = str(tmp_path / "sink")

    def append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        joined.writeStream.foreachBatch(append)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["event_id"], r["event_id_r"]) for r in spark.read.parquet(sink).collect()
    }
    batch_clicks = ev.filter(F.col("event_type") == "click").alias("c")
    batch_errors = ev.filter(F.col("event_type") == "error").alias("e")
    naive = batch_clicks.join(
        batch_errors,
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("c.ts") >= F.col("e.ts"))
        & (F.col("c.ts") <= F.col("e.ts") + F.expr("INTERVAL 7200 SECONDS")),
    )
    expect = {
        (r[0], r[1])
        for r in naive.select(F.col("c.event_id"), F.col("e.event_id")).collect()
    }
    assert got == expect
    assert len(got) > 0
