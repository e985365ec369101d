"""Mixture sampling (operators/groupwise.py::mixture_sample): target
rates, determinism under repartition, threshold-subset nesting."""

from __future__ import annotations


class TestMixtureSample:
    def test_rates_and_determinism(self, spark):
        import pyspark.sql.functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            mixture_sample,
        )

        df = spark.range(0, 4000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        )
        rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
        out = mixture_sample(df, rates, default_rate=0.25)
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_src.get("s0") == 1000          # keep-all is exact
        assert "s2" not in by_src                # rate 0 drops everything
        assert 400 <= by_src.get("s1", 0) <= 600  # ~50% of 1000
        assert 150 <= by_src.get("s3", 0) <= 350  # default ~25%

        # determinism: re-evaluation and repartition select identical ids
        ids_a = sorted(r["doc_id"] for r in out.collect())
        ids_b = sorted(
            r["doc_id"]
            for r in mixture_sample(df.repartition(13), rates, default_rate=0.25).collect()
        )
        assert ids_a == ids_b

    def test_subset_nesting(self, spark):
        # lowering a source's rate must select a SUBSET of the higher
        # rate's rows (threshold semantics on one stable bucket) — the
        # property that makes mixtures monotonically tunable.
        import pyspark.sql.functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            mixture_sample,
        )

        df = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"), F.lit("web").alias("source")
        )
        lo = {r["doc_id"] for r in mixture_sample(df, {"web": 0.2}).collect()}
        hi = {r["doc_id"] for r in mixture_sample(df, {"web": 0.6}).collect()}
        assert lo <= hi
        assert len(lo) < len(hi)


class TestSourceCap:
    def _docs(self, spark):
        import pyspark.sql.functions as F

        return spark.range(0, 900).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 3).cast("string")).alias("source"),
        )

    def test_cap_respected_and_deterministic(self, spark):
        import pyspark.sql.functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            source_cap,
        )

        df = self._docs(spark)
        out = source_cap(df, cap=50)
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_src == {"d0": 50, "d1": 50, "d2": 50}
        ids_a = sorted(r["doc_id"] for r in out.collect())
        ids_b = sorted(
            r["doc_id"] for r in source_cap(df.repartition(13), cap=50).collect()
        )
        assert ids_a == ids_b

    def test_monotone_in_cap(self, spark):
        # raising the cap only ADDS survivors — hash-rank order means the
        # cap is a prefix cut, so incremental re-caps never churn rows.
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            source_cap,
        )

        df = self._docs(spark)
        lo = {r["doc_id"] for r in source_cap(df, cap=20).collect()}
        hi = {r["doc_id"] for r in source_cap(df, cap=80).collect()}
        assert lo < hi
        assert len(lo) == 60 and len(hi) == 240

    def test_small_groups_pass_through(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            source_cap,
        )

        df = self._docs(spark)
        assert source_cap(df, cap=1000).count() == 900

    def test_bad_cap_raises(self, spark):
        import pytest

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            source_cap,
        )

        with pytest.raises(ValueError):
            source_cap(self._docs(spark), cap=0)


class TestRebalanceClasses:
    def test_balances_toward_smallest(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            rebalance_classes,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        out = rebalance_classes(docs, label_col="lang", id_col="doc_id")
        after = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        mn = min(before.values())
        # smallest class fully kept; every class lands near min_count
        assert after[min(before, key=before.get)] == mn
        for lang, n in after.items():
            assert n <= before[lang]
            assert abs(n - mn) / mn < 0.35, (lang, n, mn)  # hash-rate tolerance

    def test_deterministic_and_partition_independent(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            rebalance_classes,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(r["doc_id"] for r in rebalance_classes(docs, label_col="lang").select("doc_id").collect())
        b = sorted(
            r["doc_id"]
            for r in rebalance_classes(docs.repartition(13), label_col="lang").select("doc_id").collect()
        )
        assert a == b


class TestStratifiedSplit:
    def test_exact_per_class_counts(self, spark):
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            stratified_split_exact,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = stratified_split_exact(docs, train_frac=0.8, label_col="lang")
        per = {
            (r["lang"], r["split"]): r["n"]
            for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
        }
        totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for lang, n in totals.items():
            assert per[(lang, "train")] == int(n * 0.8)
            assert per.get((lang, "test"), 0) == n - int(n * 0.8)

    def test_monotone_in_fraction(self, spark):
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            stratified_split_exact,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        t60 = {
            r["doc_id"]
            for r in stratified_split_exact(docs, 0.6, label_col="lang")
            .filter(F.col("split") == "train").select("doc_id").collect()
        }
        t80 = {
            r["doc_id"]
            for r in stratified_split_exact(docs, 0.8, label_col="lang")
            .filter(F.col("split") == "train").select("doc_id").collect()
        }
        assert t60 <= t80

    def test_rejects_bad_fraction(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            stratified_split_exact,
        )

        import pytest

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(ValueError):
            stratified_split_exact(docs, 1.5)


class TestTemperatureMixture:
    """Temperature-scaled mixture sampling (r7): rate law, smallest
    group kept whole, determinism, temperature monotonicity."""

    def _df(self, spark):
        rows = []
        for i in range(400):
            rows.append((i, "en"))
        for i in range(400, 500):
            rows.append((i, "fr"))
        for i in range(500, 525):
            rows.append((i, "zh"))
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_rate_law_t2(self, spark):
        import math

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            temperature_rates,
        )

        got = {
            r["lang"]: (r["n_docs"], r["rate_bp"])
            for r in temperature_rates(self._df(spark), "lang", 2.0).collect()
        }
        assert got["zh"] == (25, 10000)  # smallest group kept whole
        assert got["fr"] == (100, int(math.floor(math.sqrt(25 / 100) * 10000)))
        assert got["en"] == (400, int(math.floor(math.sqrt(25 / 400) * 10000)))

    def test_sample_respects_rates_and_is_deterministic(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            temperature_mixture_sample,
        )

        df = self._df(spark)
        a = sorted(r["doc_id"] for r in temperature_mixture_sample(df, "lang").collect())
        b = sorted(
            r["doc_id"]
            for r in temperature_mixture_sample(df.repartition(7), "lang").collect()
        )
        assert a == b
        from pyspark.sql import functions as F

        kept = temperature_mixture_sample(df, "lang")
        by_lang = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang["zh"] == 25  # rate 1.0 keeps everything
        # hash sampling tracks the rate (sqrt(25/400) = 0.25) loosely
        assert 0.15 <= by_lang["en"] / 400 <= 0.35

    def test_t1_keeps_everything_higher_t_flattens(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            temperature_mixture_sample,
            temperature_rates,
        )

        df = self._df(spark)
        assert temperature_mixture_sample(df, "lang", temperature=1.0).count() == df.count()
        r2 = {r["lang"]: r["rate_bp"] for r in temperature_rates(df, "lang", 2.0).collect()}
        r4 = {r["lang"]: r["rate_bp"] for r in temperature_rates(df, "lang", 4.0).collect()}
        # higher temperature -> stronger flattening -> lower big-group rates
        assert r4["en"] < r2["en"] and r4["zh"] == r2["zh"] == 10000

    def test_rejects_bad_temperature(self, spark):
        import pytest as _pytest

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            temperature_rates,
        )

        with _pytest.raises(ValueError, match="temperature"):
            temperature_rates(self._df(spark), "lang", 0.5)
