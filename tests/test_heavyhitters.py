"""Misra-Gries heavy hitters (operators/heavyhitters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_partials,
)


def _skewed(spark, n=2000, partitions=7):
    # key 'A' ~ n/3, 'B' ~ n/5, everything else singletons
    df = spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit("A"))
        .when(F.col("id") % 5 == 0, F.lit("B"))
        .otherwise(F.concat(F.lit("z"), F.col("id").cast("string")))
        .alias("k")
    )
    return df.repartition(partitions)


class TestMgGuarantee:
    def test_true_heavy_hitters_always_candidates(self, spark):
        """The MG containment guarantee must hold for several k and
        partitionings: every key with freq > N/(k+1) appears in the
        merged candidate set."""
        for parts in (1, 7, 32):
            df = _skewed(spark, partitions=parts)
            n = df.count()
            exact = {r["k"]: r["c"] for r in
                     df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
            for k in (2, 4, 16):
                cands = {
                    r["k"]
                    for r in mg_partials(df, "k", k)
                    .groupBy("k").agg(F.sum("cnt"))
                    .collect()
                }
                true_hh = {key for key, c in exact.items() if c * (k + 1) > n}
                assert true_hh <= cands, (parts, k, true_hh - cands)

    def test_counters_never_exceed_truth(self, spark):
        df = _skewed(spark)
        exact = {r["k"]: r["c"] for r in
                 df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
        merged = {
            r["k"]: r["est"]
            for r in mg_partials(df, "k", 8)
            .groupBy("k").agg(F.sum("cnt").alias("est"))
            .collect()
        }
        for key, est in merged.items():
            assert est <= exact[key]

    def test_at_most_k_counters_per_partition(self, spark):
        df = _skewed(spark, partitions=4)
        per_part = (
            mg_partials(df, "k", 5)
            .select(F.spark_partition_id().alias("p"))
            .groupBy("p").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert all(r["n"] <= 5 for r in per_part)


class TestHeavyHittersReport:
    def test_report_equals_exact_answer(self, spark):
        df = _skewed(spark)
        n = df.count()
        for k in (2, 8):
            got = {(r["k"], r["n_true"])
                   for r in heavy_hitters(df, "k", k).collect()}
            exact = {
                (r["k"], r["c"])
                for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
                if r["c"] * (k + 1) > n
            }
            assert got == exact

    def test_rejects_bad_k(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            mg_partials(_skewed(spark), "k", 0)

    def test_null_keyed_heavy_hitter_reported(self, spark):
        """ADVICE r9: a null key at 50% frequency with k=3 must appear
        in the verified report (completeness guarantee covers null)."""
        df = spark.range(400).select(
            F.when(F.col("id") % 2 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("z"), (F.col("id") % 37).cast("string")))
            .alias("k")
        ).repartition(5)
        got = {r["k"]: r["n_true"] for r in heavy_hitters(df, "k", 3).collect()}
        assert got == {None: 200}

    def test_null_key_guarantee_across_partitionings(self, spark):
        """Null joins the candidate set whenever it is a true heavy
        hitter, for several k and partition counts."""
        df = spark.range(900).select(
            F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
            .when(F.col("id") % 3 == 0, F.lit("B"))
            .otherwise(F.concat(F.lit("z"), F.col("id").cast("string")))
            .alias("k")
        )
        n = 900
        exact = {
            r["k"]: r["c"]
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for parts in (1, 6):
            part = df.repartition(parts)
            for k in (2, 5):
                got = {r["k"]: r["n_true"]
                       for r in heavy_hitters(part, "k", k).collect()}
                want = {key: c for key, c in exact.items() if c * (k + 1) > n}
                assert got == want, (parts, k)


class TestStreamingMg:
    """Log-structured MG maintenance (streaming/heavyhitters_stream.py)."""

    def test_streamed_report_complete_and_replay_absorbed(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.heavyhitters_stream import (
            mg_read,
            stream_into_mg,
            verified_heavy_hitters_from_log,
        )

        src, log, ckpt = (str(tmp_path / n) for n in ("src", "log", "ckpt"))
        df = _skewed(spark, n=1000, partitions=3)
        df.write.parquet(src)

        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_into_mg(stream, log, ckpt, "k", k=4)
        q.awaitTermination(120)

        before = sorted(map(tuple, mg_read(spark, log, "k").collect()))
        # replay batch 0's summary verbatim: stamp dedup must absorb it
        first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
        first.write.mode("append").parquet(log)
        after = sorted(map(tuple, mg_read(spark, log, "k").collect()))
        assert after == before

        n = df.count()
        got = {(r["k"], r["n_true"])
               for r in verified_heavy_hitters_from_log(spark, log, df, "k", 4).collect()}
        exact = {
            (r["k"], r["c"])
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
            if r["c"] * 5 > n
        }
        assert got == exact

    def test_mixed_null_stamp_log_rejected(self, spark, tmp_path):
        import pytest

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.heavyhitters import (
            mg_partials,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.heavyhitters_stream import (
            mg_read,
        )

        log = str(tmp_path / "log")
        df = _skewed(spark, n=200, partitions=2)
        summary = mg_partials(df, "k", 4).groupBy("k").agg(F.sum("cnt").alias("cnt"))
        summary.withColumn("batch_id", F.lit(0).cast("long")).write.mode(
            "append"
        ).parquet(log)
        summary.withColumn("batch_id", F.lit(None).cast("long")).write.mode(
            "append"
        ).parquet(log)
        with pytest.raises(Exception, match="null and stamped"):
            mg_read(spark, log, "k").collect()
