"""applyInPandasWithState: per-user state accumulates across
micro-batches and ends equal to the batch aggregate."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    _events,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.stateful import (
    running_user_stats,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.windowed import (
    EVENTS_SCHEMA,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stateful_final_state_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = _events(spark, SF).filter(F.col("user_id") < 20)
    # two files -> with maxFilesPerTrigger=1, two micro-batches
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = running_user_stats(stream)
    sink = str(tmp_path / "sink")

    def append(batch_df, batch_id):
        # parquet sink doesn't accept update mode; append per micro-batch
        batch_df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(append)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(sink)
    # several update rows per user are appended; keep the one with the
    # highest n_events (the final state)
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["max_value"])
        for r in got_df.orderBy("n_events").collect()
    }
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m")
    )
    expect = {
        r["user_id"]: (r["n"], round(r["s"], 6), r["m"]) for r in batch.collect()
    }
    assert final == expect
    # state really did evolve across batches: some user appears twice
    multi = got_df.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0
