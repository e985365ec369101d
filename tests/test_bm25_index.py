"""Persisted BM25 inverted index: layout, static pruning, parity.

The 100 TB lexical story mirrors the IVF one (test_ivf_index.py): the
postings must be *physically* partitioned by term bucket so a |Q|-term
query opens at most |Q| bucket directories.  Pinned here: the hive
layout exists, the driver-side bucket hash agrees with the executor-side
column, the probe's filter lands in PartitionFilters, results are
identical to the per-query-scan bm25_topk, and — the hard proof —
deleting every unprobed bucket directory changes nothing.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
    bm25_index_search,
    bm25_index_write,
    bm25_topk,
    term_bucket_col,
    term_bucket_py,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (
    partition_filters,
)

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "vector", "join"]
N_BUCKETS = 32


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path_factory.mktemp("bm25") / "index")
    bm25_index_write(docs, path, n_buckets=N_BUCKETS)
    return docs, path


class TestBm25Index:
    def test_layout_hive_partitioned_by_bucket(self, index):
        import os

        _, path = index
        dirs = sorted(
            d
            for d in os.listdir(f"{path}/postings/batch_id=0")
            if d.startswith("term_bucket=")
        )
        assert dirs, "postings must be hive-partitioned by term_bucket"
        assert len(dirs) <= N_BUCKETS
        tdirs = sorted(
            d for d in os.listdir(f"{path}/terms") if d.startswith("term_bucket=")
        )
        assert tdirs, "terms must share the bucket layout"

    def test_driver_and_executor_bucket_hash_agree(self, spark):
        words = ["spark", "vector", "join", "Émile", "x" * 100, "0"]
        df = spark.createDataFrame([(w,) for w in words], "term string").select(
            "term", term_bucket_col(F.col("term"), N_BUCKETS).alias("b")
        )
        got = {r["term"]: r["b"] for r in df.collect()}
        for w in words:
            assert got[w] == term_bucket_py(w, N_BUCKETS), w

    def test_probe_prunes_statically(self, spark, index):
        _, path = index
        out = bm25_index_search(spark, path, TERMS, k=10, n_buckets=N_BUCKETS)
        pf = [f for f in partition_filters(out) if "term_bucket" in f]
        assert pf, "bucket filter must land in PartitionFilters, not a row filter"

    def test_parity_with_scan_path(self, spark, index):
        docs, path = index
        scan = bm25_topk(docs, TERMS, k=10).collect()
        idx = bm25_index_search(spark, path, TERMS, k=10, n_buckets=N_BUCKETS).collect()
        assert [r["doc_id"] for r in idx] == [r["doc_id"] for r in scan]
        for a, b in zip(idx, scan):
            assert a["bm25"] == pytest.approx(b["bm25"], rel=1e-12)

    def test_unprobed_buckets_never_opened(self, spark, index, tmp_path):
        """Delete every bucket directory the query does NOT probe; the
        search must return the identical answer — proof the pruning is
        planning-time, not a post-scan filter."""
        import os

        _, path = index
        probed = {term_bucket_py(t, N_BUCKETS) for t in TERMS}
        work = str(tmp_path / "pruned")
        shutil.copytree(path, work)
        removed = 0
        for sub in ("postings/batch_id=0", "terms"):
            for d in os.listdir(f"{work}/{sub}"):
                if not d.startswith("term_bucket="):
                    continue
                if int(d.split("=")[1]) not in probed:
                    shutil.rmtree(f"{work}/{sub}/{d}")
                    removed += 1
        assert removed > 0, "fixture must have unprobed buckets to delete"
        before = bm25_index_search(spark, path, TERMS, k=10, n_buckets=N_BUCKETS).collect()
        after = bm25_index_search(spark, work, TERMS, k=10, n_buckets=N_BUCKETS).collect()
        assert [tuple(r) for r in after] == [tuple(r) for r in before]

    def test_empty_query_raises(self, spark, index):
        _, path = index
        with pytest.raises(ValueError):
            bm25_index_search(spark, path, [], k=10)


class TestBm25IndexAppend:
    def test_append_equals_full_rebuild(self, spark, tmp_path):
        """write(A); append(B) must equal write(A ∪ B) — including OLD
        docs' scores, which shift with corpus-relative df/avgdl."""
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            bm25_index_append,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        half_a = docs.filter(F.col("doc_id") % 2 == 0)
        half_b = docs.filter(F.col("doc_id") % 2 == 1)

        full = str(tmp_path / "full")
        incr = str(tmp_path / "incr")
        bm25_index_write(docs, full, n_buckets=N_BUCKETS)
        bm25_index_write(half_a, incr, n_buckets=N_BUCKETS)
        bm25_index_append(half_b, incr, n_buckets=N_BUCKETS)

        for terms in (TERMS, ["data", "query"], ["stream"]):
            a = bm25_index_search(spark, full, terms, k=10, n_buckets=N_BUCKETS).collect()
            b = bm25_index_search(spark, incr, terms, k=10, n_buckets=N_BUCKETS).collect()
            assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
            for x, y in zip(a, b):
                assert x["bm25"] == pytest.approx(y["bm25"], rel=1e-12)

    def test_append_refreshes_corpus_stats(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            bm25_index_append,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        path = str(tmp_path / "idx")
        bm25_index_write(docs.filter(F.col("doc_id") < 100), path, n_buckets=N_BUCKETS)
        n0 = spark.read.parquet(f"{path}/stats").first()["n_docs"]
        bm25_index_append(
            docs.filter(F.col("doc_id") >= 100), path, n_buckets=N_BUCKETS
        )
        n1 = spark.read.parquet(f"{path}/stats").first()["n_docs"]
        assert n0 == 100 and n1 == docs.count()
