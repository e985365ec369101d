"""Robustness + engine-surface odds and ends: join strategy hints,
parquet codecs, null-embedding semantics, empty inputs."""

from __future__ import annotations

import glob

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.knn import (
    knn,
    knn_join,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (
    explain_str,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestJoinHints:
    def test_merge_hint_forces_sort_merge(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        joined = orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
        assert "SortMergeJoin" in explain_str(joined, "simple")

    def test_shuffle_hash_hint(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        joined = orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
        assert "ShuffledHashJoin" in explain_str(joined, "simple")

    def test_broadcast_hint(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        assert "BroadcastHashJoin" in explain_str(joined, "simple")


class TestParquetCodecs:
    @pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
    def test_roundtrip(self, spark, tmp_path, codec):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = str(tmp_path / codec)
        docs.write.option("compression", codec).parquet(out)
        assert spark.read.parquet(out).count() == docs.count()
        assert glob.glob(f"{out}/*.parquet")


class TestKnnEdgeCases:
    def test_null_embeddings_excluded_not_crashing(self, spark):
        rows = [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = knn(df.filter(F.col("embedding").isNotNull()), [1.0, 0.0], k=5,
                  payload_cols=["vec_id"]).collect()
        assert [r["vec_id"] for r in got] == [1, 3]

    def test_k_larger_than_corpus(self, spark):
        df = spark.createDataFrame([(1, [1.0]), (2, [2.0])], "vec_id long, embedding array<float>")
        got = knn(df, [0.0], k=100, payload_cols=["vec_id"]).collect()
        assert len(got) == 2

    def test_empty_corpus(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert knn(df, [0.0], k=5, payload_cols=["vec_id"]).collect() == []

    def test_empty_query_relation_in_join(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        assert knn_join(emb, queries, k=3, payload_cols=["vec_id"]).collect() == []
