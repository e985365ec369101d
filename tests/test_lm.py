"""Bigram-LM perplexity filter (operators/lm.py): hand-computed model on
a tiny corpus, backoff arithmetic, the floor-margin quantization guard,
ntile-reconstruction equivalence, and fixture non-vacuity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.lm import (
    BACKOFF_PENALTY_MICRO,
    SCALE,
    bigram_lm_costs,
    doc_bigrams,
    perplexity_scores,
    quality_tiers,
)

from conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _cost(p: float) -> int:
    return int(math.floor(-math.log(p) * SCALE + 0.5))


class TestDocBigrams:
    def test_zip_and_edge_cases(self, spark):
        df = _docs(
            spark,
            [
                ("d1", "A b  a"),  # normalize + lower: bigrams (a,b) (b,a)
                ("d2", "solo"),  # 1 token -> no bigrams
                ("d3", " "),  # 0 tokens -> no bigrams
            ],
        )
        got = {
            (r.doc_id, r.w1, r.w2)
            for r in doc_bigrams(df).collect()
        }
        assert got == {("d1", "a", "b"), ("d1", "b", "a")}


class TestModel:
    def test_hand_computed_costs(self, spark):
        # corpus bigrams: (a,b)x2 from d1+d2, (b,a)x1 from d1
        df = _docs(spark, [("d1", "a b a"), ("d2", "a b")])
        bg = doc_bigrams(df)
        costs = {
            (r.w1, r.w2): (r.c2, r.cost_micro, r.backed_off)
            for r in bigram_lm_costs(bg, min_count=2).collect()
        }
        # (a,b): c2=2, c1 (bigrams starting a) = 2 -> MLE p=1, cost 0
        assert costs[("a", "b")] == (2, 0, False)
        # (b,a): c2=1 < min_count -> backoff; cu(a)=1, total=3
        assert costs[("b", "a")] == (
            1,
            BACKOFF_PENALTY_MICRO + _cost(1.0 / 3.0),
            True,
        )

    def test_scores_integer_sums(self, spark):
        df = _docs(spark, [("d1", "a b a"), ("d2", "a b")])
        got = {
            r.doc_id: (r.n_bigrams, r.total_cost_micro, r.avg_cost_micro, r.n_backoff)
            for r in perplexity_scores(df, min_count=2).collect()
        }
        ba = BACKOFF_PENALTY_MICRO + _cost(1.0 / 3.0)
        assert got["d1"] == (2, ba, ba // 2, 1)
        assert got["d2"] == (1, 0, 0, 0)


class TestFloorMargin:
    def test_fixture_ratios_sit_far_from_boundaries(self, spark):
        """Every quantized -ln ratio at the smoke fixture must sit
        >= 1e-6 cost units away from its floor boundary — the guard
        against the engine-vs-oracle last-ulp ln() divergence class
        (the unigram tokenizer's convention)."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        bg = doc_bigrams(docs)
        c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
        c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
        cu = c2.groupBy("w2").agg(F.sum("c2").alias("cu"))
        total = c2.agg(F.sum("c2").alias("t")).collect()[0].t
        pairs = (
            c2.join(c1, "w1")
            .select((F.col("c2") / F.col("c1")).alias("p"))
            .union(cu.select((F.col("cu") / F.lit(float(total))).alias("p")))
            .distinct()
            .collect()
        )
        worst = 0.5
        for r in pairs:
            x = -math.log(r.p) * SCALE + 0.5
            frac = x - math.floor(x)
            margin = min(frac, 1.0 - frac)
            worst = min(worst, margin)
        assert worst > 1e-6, f"floor margin too tight: {worst}"


class TestTiers:
    def test_matches_windowed_ntile(self, spark):
        """The global_rank + offset + ntile_from_rank reconstruction must
        equal the plain windowed ntile on the same ordering."""
        from pyspark.sql import Window

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        scored = perplexity_scores(docs)
        langs = docs.select("doc_id", "lang")
        got = {
            (r.lang, r.tier): (r.n_docs, r.min_cost_micro, r.max_cost_micro)
            for r in quality_tiers(scored, langs, tiles=3).collect()
        }
        w = Window.partitionBy("lang").orderBy("avg_cost_micro", "doc_id")
        want_rows = (
            scored.join(langs, "doc_id")
            .withColumn("tier", F.ntile(3).over(w))
            .groupBy("lang", "tier")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("avg_cost_micro").alias("lo"),
                F.max("avg_cost_micro").alias("hi"),
            )
            .collect()
        )
        want = {(r.lang, r.tier): (r.n, r.lo, r.hi) for r in want_rows}
        assert got == want
        assert len(got) >= 6  # several languages x 3 tiers

    def test_tier_sizes_follow_sql_ntile(self, spark):
        df = _docs(
            spark,
            [(f"d{i}", f"w{i} w{i + 1} w{i + 2}") for i in range(7)],
        )
        scored = perplexity_scores(df)
        langs = df.select("doc_id", F.lit("xx").alias("lang"))
        sizes = {
            r.tier: r.n_docs
            for r in quality_tiers(scored, langs, tiles=3).collect()
        }
        assert sizes == {1: 3, 2: 2, 3: 2}  # 7 = 3+2+2, big buckets first


class TestNonVacuity:
    def test_smoke_fixture_exercises_both_branches(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        agg = perplexity_scores(docs).agg(
            F.sum("n_backoff").alias("nb"),
            F.sum("n_bigrams").alias("n"),
            F.count(F.lit(1)).alias("docs"),
        ).collect()[0]
        assert agg.docs > 0 and agg.n > 0
        assert 0 < agg.nb < agg.n  # both MLE and backoff branches live


class TestKneserNey:
    def test_hand_computed_costs(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.lm import (
            KN_DISCOUNT,
            kneser_ney_costs,
        )

        # corpus bigrams: (a,b)x2 from d1+d2, (b,a)x1 from d1
        df = _docs(spark, [("d1", "a b a"), ("d2", "a b")])
        costs = {
            (r.w1, r.w2): (r.c2, r.cost_micro, r.backed_off)
            for r in kneser_ney_costs(doc_bigrams(df)).collect()
        }
        d = KN_DISCOUNT
        # marginals over the type table {(a,b): 2, (b,a): 1}:
        #   c1(a)=2, n1p(a)=1; c1(b)=1, n1p(b)=1; cut(a)=1, cut(b)=1; tott=2
        p_ab = ((2 - d) / 2) + ((d * 1 / 2) * (1 / 2))
        p_ba = ((1 - d) / 1) + ((d * 1 / 1) * (1 / 2))
        assert costs[("a", "b")] == (2, _cost(p_ab), False)
        assert costs[("b", "a")] == (1, _cost(p_ba), True)

    def test_probability_mass_under_one(self, spark):
        """Sanity: every KN cost is positive (p < 1) on the smoke
        fixture, and hapax flags match c2 == 1."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.lm import (
            kneser_ney_costs,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        t = kneser_ney_costs(doc_bigrams(docs))
        bad = t.filter(
            (F.col("cost_micro") <= 0)
            | (F.col("backed_off") != (F.col("c2") == 1))
        ).count()
        assert bad == 0

    def test_floor_margin_on_fixture(self, spark):
        """The two-term KN probability is quantized ONCE, so the guard
        runs on the composed p, mirroring the exact expression shape."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.lm import (
            KN_DISCOUNT,
            kneser_ney_costs,  # noqa: F401 (shape under test)
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        bg = doc_bigrams(docs)
        c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
        c1 = c2.groupBy("w1").agg(
            F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p")
        )
        cut = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("cut"))
        tott = c2.count()
        rows = (
            c2.join(c1, "w1")
            .join(cut, "w2")
            .select("c2", "c1", "n1p", "cut")
            .distinct()
            .collect()
        )
        worst = 0.5
        for r in rows:
            p = ((r.c2 - KN_DISCOUNT) / r.c1) + (
                ((KN_DISCOUNT * r.n1p) / r.c1) * (r.cut / tott)
            )
            x = -math.log(p) * SCALE + 0.5
            frac = x - math.floor(x)
            worst = min(worst, min(frac, 1.0 - frac))
        assert worst > 1e-6, f"floor margin too tight: {worst}"

    def test_scores_schema_and_determinism(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.lm import (
            perplexity_scores_kn,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = sorted(map(tuple, perplexity_scores_kn(docs).collect()))
        b = sorted(
            map(tuple, perplexity_scores_kn(docs.repartition(7)).collect())
        )
        assert a == b and len(a) > 0
