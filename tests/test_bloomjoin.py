"""Bloom runtime semi-join: exactness (result never depends on the
hash configuration), the no-false-negative superset property of the
pre-filter, plan shape (broadcast bucket probes, no fact-side
exchange before the joins), and argument validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bloomjoin import (
    bloom_bucket_tables,
    bloom_prefilter,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def fact(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("payload")
    )


@pytest.fixture(scope="module")
def build(spark):
    # selective build side: multiples of 13, with duplicates
    base = spark.range(0, 1000, 13).select(F.col("id").alias("bk"))
    return base.union(base)


class TestExactness:
    def test_matches_plain_semi_join(self, fact, build):
        want = sorted(
            tuple(r) for r in fact.join(
                build.select(F.col("bk").alias("k")), "k", "left_semi"
            ).collect()
        )
        for n_buckets, n_hashes in [(2, 1), (16, 2), (1 << 13, 3)]:
            got = sorted(
                tuple(r)
                for r in bloom_semi_join(
                    fact, build, "k", "bk", n_buckets=n_buckets, n_hashes=n_hashes
                ).collect()
            )
            assert got == want, (n_buckets, n_hashes)

    def test_empty_build_side(self, spark, fact, build):
        got = bloom_semi_join(fact, build.where(F.col("bk") < 0), "k", "bk").count()
        assert got == 0


class TestPrefilter:
    def test_superset_no_false_negatives(self, fact, build):
        # even a pathologically small filter must keep every true match
        pre = bloom_prefilter(fact, build, "k", "bk", n_buckets=2, n_hashes=1)
        pre_keys = {r["k"] for r in pre.select("k").collect()}
        true_keys = {r["bk"] for r in build.collect()}
        assert true_keys <= pre_keys

    def test_selective_filter_prunes(self, fact, build):
        # with a real-sized filter the pre-filter output is far below the
        # fact count (77 true matches out of 1000 fact rows)
        pre = bloom_prefilter(fact, build, "k", "bk", n_buckets=1 << 13, n_hashes=2)
        n = pre.count()
        assert 77 <= n < 500

    def test_bucket_tables_bounded(self, build):
        tables = bloom_bucket_tables(build, "bk", n_buckets=16, n_hashes=3)
        assert len(tables) == 3
        for t in tables:
            assert t.count() <= 16


class TestPlanShape:
    def test_broadcast_probes_no_fact_exchange(self, fact, build):
        pre = bloom_prefilter(fact, build, "k", "bk", n_hashes=2)
        plan = pre._jdf.queryExecution().executedPlan().toString()
        assert plan.count("LeftSemi") == 2
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestValidation:
    def test_bad_buckets(self, build):
        with pytest.raises(ValueError, match="n_buckets"):
            bloom_bucket_tables(build, "bk", n_buckets=1)

    def test_bad_hashes(self, build):
        with pytest.raises(ValueError, match="n_hashes"):
            bloom_bucket_tables(build, "bk", n_hashes=0)

    def test_missing_seed_refused(self, spark, fact, build):
        # a filter built with fewer hashes than the probe expects would
        # semi-join against an empty bucket set and silently drop ALL
        # fact rows — the probe must refuse instead (ADVICE r6)
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bloomjoin import (
            bloom_bucket_rows,
            bloom_prefilter_with,
        )

        rows = bloom_bucket_rows(build, "bk", n_buckets=64, n_hashes=1)
        with pytest.raises(ValueError, match="covers seeds"):
            bloom_prefilter_with(fact, rows, "k", n_buckets=64, n_hashes=2)


class TestStreamingBloom:
    def test_drained_log_equals_batch_filter(self, spark, build, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bloomjoin import (
            bloom_bucket_rows,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            bloom_compact,
            bloom_read,
            stream_into_bloom,
        )

        src = str(tmp_path / "src")
        build.filter(F.col("bk") < 500).coalesce(1).write.parquet(f"{src}/f0")
        build.filter(F.col("bk") >= 500).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(build.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        log = str(tmp_path / "log")
        q = stream_into_bloom(
            stream, log, str(tmp_path / "ckpt"), "bk", n_buckets=64, n_hashes=3
        )
        q.awaitTermination(120)
        got = {
            (r["seed"], r["bucket"]) for r in bloom_read(spark, log).collect()
        }
        want = {
            (r["seed"], r["bucket"])
            for r in bloom_bucket_rows(build, "bk", n_buckets=64, n_hashes=3).collect()
        }
        assert got == want
        dest = str(tmp_path / "compact")
        bloom_compact(spark, log, dest)
        compacted = {
            (r["seed"], r["bucket"]) for r in spark.read.parquet(dest).collect()
        }
        assert compacted == want
        with pytest.raises(ValueError):
            bloom_compact(spark, log, log)

    def test_prefilter_with_matches_inline(self, spark, fact, build):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bloomjoin import (
            bloom_bucket_rows,
            bloom_prefilter_with,
        )

        rows = bloom_bucket_rows(build, "bk", n_buckets=64, n_hashes=2)
        via_rows = sorted(
            tuple(r)
            for r in bloom_prefilter_with(
                fact, rows, "k", n_buckets=64, n_hashes=2
            ).collect()
        )
        inline = sorted(
            tuple(r)
            for r in bloom_prefilter(
                fact, build, "k", "bk", n_buckets=64, n_hashes=2
            ).collect()
        )
        assert via_rows == inline
