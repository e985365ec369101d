"""Streaming hourly rollup == batch rollup (the foreachBatch-parity
property), with watermarked event-time windows."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    _events,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.windowed import (
    run_hourly_rollup,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # re-materialize events with microsecond timestamps (the raw fixture
    # is TIMESTAMP(NANOS), unreadable by a Spark stream scan)
    d = str(tmp_path_factory.mktemp("events_us"))
    _events(spark, SF).write.mode("overwrite").parquet(d)
    return d


def test_stream_rollup_equals_batch(spark, events_dir, tmp_path):
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    q = run_hourly_rollup(spark, events_dir, out, ckpt)
    q.awaitTermination(120)

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    expect = {(r["hour"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == expect
    assert len(got) > 0


def test_incremental_rollup_equals_batch(spark, events_dir, tmp_path):
    """Two micro-batches of updates, resolved last-write-wins, must
    equal the one-shot batch rollup."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.windowed import (
        read_rollup,
        run_hourly_rollup_incremental,
    )

    # split the fixture into two files so maxFilesPerTrigger=1 yields
    # two micro-batches with overlapping hours
    ev = spark.read.parquet(events_dir)
    split_dir = str(tmp_path / "split")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{split_dir}/f0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{split_dir}/f1")

    out = str(tmp_path / "rollup_inc")
    q = run_hourly_rollup_incremental(
        spark, f"{split_dir}/*", out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(180)

    log = spark.read.parquet(out)
    assert log.select("_batch_id").distinct().count() >= 2  # really incremental

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, out).collect()
    }
    batch = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    expect = {(r["hour"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == expect
