"""Streaming index maintenance (streaming/index_stream.py): vectors and
documents arriving as micro-batches land in the persisted IVF / BM25
index layouts, and a search after the stream drains equals a search
over an index built in one shot — the append-equals-rebuild invariant
holding THROUGH the streaming codepath."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ann import (
    assign_ivf,
    ivf_index_search,
    ivf_index_write,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
    bm25_index_search,
    bm25_index_write,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.index_stream import (
    stream_into_bm25_index,
    stream_into_ivf_index,
)

SF = "/root/testdata/sf0.001"
N_CENTROIDS = 16
PROBE_ID = 5
TERMS = ["spark", "vector", "join"]


class TestStreamIntoIvfIndex:
    def test_drained_stream_equals_bulk_build(self, spark, tmp_path):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        # two arrival files -> two micro-batches
        src = str(tmp_path / "src")
        emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
        emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        streamed = str(tmp_path / "streamed")
        q = stream_into_ivf_index(
            stream, centroids, streamed, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

        bulk = str(tmp_path / "bulk")
        ivf_index_write(assign_ivf(emb, centroids), bulk)
        qv = list(emb.filter(F.col("vec_id") == PROBE_ID).first()["embedding"])
        a = ivf_index_search(spark, streamed, centroids, qv, k=5, nprobe=2).collect()
        b = ivf_index_search(spark, bulk, centroids, qv, k=5, nprobe=2).collect()
        assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
        for x, y in zip(a, b):
            assert x["distance"] == pytest.approx(y["distance"], rel=1e-12)


class TestStreamIntoBm25Index:
    def test_drained_stream_equals_bulk_build(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
        src = str(tmp_path / "src")
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        streamed = str(tmp_path / "streamed")
        q = stream_into_bm25_index(
            stream, streamed, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

        bulk = str(tmp_path / "bulk")
        bm25_index_write(docs, bulk)
        a = bm25_index_search(spark, streamed, TERMS, k=10).collect()
        b = bm25_index_search(spark, bulk, TERMS, k=10).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        for x, y in zip(a, b):
            assert x["bm25"] == pytest.approx(y["bm25"], rel=1e-12)


class TestStreamIntoPqIndex:
    def test_drained_stream_equals_bulk_build(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.pq import (
            fixed_codebooks,
            pq_index_search,
            pq_index_write,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.index_stream import (
            stream_into_pq_index,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        books = fixed_codebooks(emb, m=4, ksub=16)
        src = str(tmp_path / "src")
        emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
        emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        streamed = str(tmp_path / "streamed")
        q = stream_into_pq_index(
            stream, centroids, books, streamed,
            checkpoint=str(tmp_path / "ckpt"), payload_cols=["label"],
        )
        q.awaitTermination(120)

        bulk = str(tmp_path / "bulk")
        pq_index_write(emb, centroids, books, bulk, payload_cols=["label"])
        qv = list(emb.filter(F.col("vec_id") == PROBE_ID).first()["embedding"])
        a = pq_index_search(
            spark, streamed, centroids, emb, qv, books, k=5, nprobe=2
        ).collect()
        b = pq_index_search(
            spark, bulk, centroids, emb, qv, books, k=5, nprobe=2
        ).collect()
        assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
        for x, y in zip(a, b):
            assert x["distance"] == pytest.approx(y["distance"], rel=1e-12)
