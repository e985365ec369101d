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


class TestStreamingSessionize:
    def test_session_spanning_batches_is_stitched(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sessionize_stream import (
            streaming_sessionize,
        )

        src = str(tmp_path / "src")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        # user 1: events at t=0m, 10m (batch 0) and 20m, 80m (batch 1):
        # 0-10-20 is ONE session across the batch boundary; 80m starts a
        # second (gap 60m > 30m).  user 2: single event per batch, gap
        # 5m -> one session.
        b0 = [(1, 100, "2024-03-01 10:00:00"), (1, 101, "2024-03-01 10:10:00"),
              (2, 200, "2024-03-01 10:00:00")]
        b1 = [(1, 102, "2024-03-01 10:20:00"), (1, 103, "2024-03-01 11:40:00"),
              (2, 201, "2024-03-01 10:05:00")]
        for i, rows in enumerate((b0, b1)):
            spark.createDataFrame(rows, "user_id long, event_id long, ts string") \
                .select("user_id", "event_id", F.to_timestamp("ts").alias("ts")) \
                .coalesce(1).write.parquet(f"{src}/f{i}")

        stream = (
            spark.readStream.schema("user_id long, event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        out = streaming_sessionize(stream)

        def _append(batch_df, _bid):
            batch_df.write.mode("append").parquet(sink)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(_append)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

        got = spark.read.parquet(sink).collect()
        by_event = {r.event_id: r.session_start_us for r in got}
        assert len(by_event) == 6  # every event exactly once
        t0 = by_event[100]
        assert by_event[101] == t0 and by_event[102] == t0  # stitched
        assert by_event[103] != t0  # 60m gap -> new session
        assert by_event[201] == by_event[200]  # user 2 stitched too
