"""File-scoped corpus upsert + streaming dedup with cross-batch state."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ingest import (
    ingest_pages,
    upsert_corpus_files,
    write_corpus,
)
from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(rows, "fileName string, pageNumber int, text string")


class TestUpsertCorpusFiles:
    def test_reingest_replaces_only_touched_file(self, spark, tmp_path):
        path = str(tmp_path / "corpus")
        v1 = _pages(spark, [("a.pdf", 1, "alpha one"), ("a.pdf", 2, "alpha two"),
                            ("b.pdf", 1, "beta one")])
        corpus_v1, _ = ingest_pages(v1, dim=16)
        write_corpus(corpus_v1, path)

        # re-upload a.pdf with different content (one page now)
        v2 = _pages(spark, [("a.pdf", 1, "alpha REVISED")])
        corpus_v2, _ = ingest_pages(v2, dim=16)
        upsert_corpus_files(spark, path, corpus_v2)

        stored = spark.read.parquet(path)
        by_file = {
            r["fileName"]: r["n"]
            for r in stored.groupBy("fileName").agg(F.count("*").alias("n")).collect()
        }
        assert by_file == {"a.pdf": 1, "b.pdf": 1}
        a_text = stored.filter(F.col("fileName") == "a.pdf").first()["origntext"]
        assert a_text == "alpha REVISED"

    def test_reingest_identical_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "corpus")
        v1 = _pages(spark, [("a.pdf", 1, "same content")])
        corpus, _ = ingest_pages(v1, dim=16)
        write_corpus(corpus, path)
        ids_before = sorted(r["id"] for r in spark.read.parquet(path).collect())
        upsert_corpus_files(spark, path, corpus)
        ids_after = sorted(r["id"] for r in spark.read.parquet(path).collect())
        assert ids_before == ids_after


class TestStreamingDedup:
    def test_seen_state_spans_batches(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.dedup_stream import (
            streaming_exact_dedup,
        )

        src = str(tmp_path / "src")
        # batch 0: docs 1,2 (distinct); batch 1: doc 3 = duplicate of 1, doc 4 new
        b0 = spark.createDataFrame([(1, "hello world"), (2, "other text")], "doc_id long, text string")
        b1 = spark.createDataFrame([(3, "hello  world"), (4, "fresh text")], "doc_id long, text string")
        b0.coalesce(1).write.parquet(f"{src}/f0")
        b1.coalesce(1).write.parquet(f"{src}/f1")

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        out = streaming_exact_dedup(stream)
        sink = str(tmp_path / "sink")

        def append(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(append)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        rows = spark.read.parquet(sink).collect()
        # duplicate fingerprint (docs 1 & 3 normalize identically): the
        # second sighting must NOT be flagged new, and n_seen reaches 2
        dup = [r for r in rows if r["n_seen"] == 2]
        assert len(dup) == 1
        assert dup[0]["is_new"] is False
        assert dup[0]["first_doc_id"] == 1
        # three distinct fingerprints were new exactly once
        assert sum(1 for r in rows if r["is_new"]) == 3


class TestStreamingIncrementalDedup:
    """Persisted-state corpus admission (streaming/
    incremental_dedup_stream.py, r9): later micro-batches must see
    earlier batches' admissions as corpus."""

    def test_cross_batch_admission_is_exactly_once(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.incremental_dedup_stream import (
            seed_state,
            stream_admit_documents,
        )

        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        base = spark.createDataFrame(
            [(1, "corpus text one"), (2, "corpus text two")],
            "doc_id long, text string",
        )
        seed_state(base, state)

        # two files -> two micro-batches; 'fresh text' appears in BOTH,
        # 'corpus text one' arrives again, and an in-batch dup too
        spark.createDataFrame(
            [(10, "fresh text"), (11, "fresh text"), (12, "corpus text one")],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(20, "fresh text"), (21, "brand new text")],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_admit_documents(stream, state, sink, ckpt)
        q.awaitTermination(120)

        out = spark.read.parquet(sink)
        per_fp = {
            r["fingerprint"]: (r["n"], r["n_new"])
            for r in out.groupBy("fingerprint").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("status") == "new").cast("long")).alias("n_new"),
            ).collect()
        }
        # every fingerprint admitted at most once, 'fresh text' exactly
        # once across its 3 occurrences, the base dup never
        assert sorted(per_fp.values()) == sorted([(3, 1), (1, 0), (1, 1)])
        # the state table ends with base + the two admissions
        n_state = spark.read.parquet(state).select("fingerprint").distinct().count()
        assert n_state == 4
        # and doc 12 (base dup) was classified dup_of_base
        st = {r["doc_id"]: r["status"] for r in out.collect()}
        assert st[12] == "dup_of_base"
        assert os.path.exists(os.path.join(state, "_SUCCESS"))
