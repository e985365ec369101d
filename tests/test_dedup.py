"""Dedup operators: planted duplicates must be found; staged shingle
pipeline must equal the inline definition."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_stage,
    simhash,
    simhash_neardup_pairs,
    word_shingles,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and again today", "en"),  # near-dup
        (4, "completely different content about spark query engines at scale", "en"),
        (5, "der schnelle braune fuchs springt wieder", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_collapses_identical(spark, docs):
    out = exact_dedup(docs).collect()
    survivors = {r["doc_id"]: r["group_size"] for r in out}
    assert survivors[1] == 2      # doc 2 collapsed into 1 (lowest id wins)
    assert 2 not in survivors
    assert survivors[3] == 1 and survivors[4] == 1 and survivors[5] == 1


def test_exact_dedup_ignores_whitespace_differences(spark):
    df = spark.createDataFrame(
        [(1, "a  b\nc"), (2, "a b c")], "doc_id long, text string"
    )
    out = exact_dedup(df).collect()
    assert len(out) == 1 and out[0]["group_size"] == 2


def test_shingle_stage_equals_inline(spark, docs):
    staged = shingle_stage(docs, "text", 3, keep_cols=["doc_id"], out_col="s")
    inline = docs.select("doc_id", word_shingles("text", 3).alias("s"))
    a = {r["doc_id"]: r["s"] for r in staged.collect()}
    b = {r["doc_id"]: r["s"] for r in inline.collect()}
    assert a == b


def test_shingle_short_text_fallback(spark):
    df = spark.createDataFrame([(1, "two words")], "doc_id long, text string")
    out = shingle_stage(df, "text", 3, keep_cols=["doc_id"], out_col="s").first()
    assert out["s"] == ["two words"]


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sigs = {r["doc_id"]: tuple(r["signature"]) for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert len(sigs[1]) == 16


def test_lsh_finds_planted_pairs(spark, docs):
    sigs = minhash_signatures(docs, num_perm=16, shingle_n=3, seed=42)
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, bands=4).collect()}
    assert (1, 2) in pairs            # identical -> all bands collide
    assert (1, 3) in pairs            # near-dup -> >=1 band collides (16/4 perms)
    assert all(a < b for a, b in pairs)


def test_simhash_identical_equal_neardup_close(spark, docs):
    vals = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert vals[1] == vals[2]
    ham13 = bin(vals[1] ^ vals[3]).count("1")
    ham14 = bin(vals[1] ^ vals[4]).count("1")
    assert ham13 < ham14


def test_simhash_packed_bit_identical(spark, docs):
    # single-pass variant must produce the SAME 32-bit values as the
    # per-bit-fold original (it feeds the same oracle)
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
        simhash_packed,
    )

    a = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_packed(docs).collect()}
    assert a == b


def test_simhash_neardup_pairs_blocked(spark, docs):
    vals = simhash(docs).join(docs.select("doc_id", "lang"), "doc_id")
    pairs = simhash_neardup_pairs(vals, max_hamming=0, block_col="lang").collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_jaccard_thresholds(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, block_col="lang", threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.5 <= out[(1, 3)] < 1.0
    assert (1, 4) not in out


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], "g"),
        (2, [0.99, 0.01, 0.0], "g"),   # nearly parallel to 1
        (3, [0.0, 1.0, 0.0], "g"),     # orthogonal
        (4, [1.0, 0.0, 0.0], "other"), # parallel to 1 but different block
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    pairs = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in embedding_neardup_pairs(df, block_col="label", threshold=0.95).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs
    assert (1, 4) not in pairs  # blocked away


def test_embedding_neardup_numpy_parity(spark):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_numpy,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in embedding_neardup_pairs(emb, block_col="label", threshold=0.5).collect()
    }
    gemm = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in embedding_neardup_pairs_numpy(emb, block_col="label", threshold=0.5).collect()
    }
    assert set(fold) == set(gemm)
    assert all(abs(fold[k] - gemm[k]) <= 1e-4 for k in fold)


def test_semantic_dedup_flags_planted_duplicates(spark):
    """SemDeDup composition: planted 1.01x-scaled copies (cosine ~ 1.0
    with their base vector) must be flagged is_dup; every base vector
    survives (it is the lowest id of its group)."""
    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x.cast("double") * 1.01).cast("float")
        ).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(planted)
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    out = semantic_dedup(corpus, centroids, threshold=0.99)
    rows = {r["vec_id"]: r for r in out.collect()}

    assert len(rows) == corpus.count()  # one verdict per vector
    planted_ids = [r["vec_id"] for r in planted.select("vec_id").collect()]
    # every planted copy is a duplicate; its base survives
    for pid in planted_ids:
        assert rows[pid]["is_dup"], f"planted {pid} not flagged"
        assert not rows[pid - 1000000]["is_dup"], f"base {pid - 1000000} flagged"
    # copies land in the same cluster as their base (1.01x scaling is a
    # small L2 perturbation at unit-ish norms)
    for pid in planted_ids:
        assert rows[pid]["centroid_id"] == rows[pid - 1000000]["centroid_id"]


def test_semantic_dedup_pair_join_is_blocked(spark):
    """The near-dup join must carry the centroid equality in its join
    condition — the blocked-never-all-pairs contract."""
    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    plan = semantic_dedup(emb, centroids, threshold=0.99)._jdf.queryExecution().toString()
    assert "centroid_id" in plan
    # no cartesian product between the two assigned sides
    assert "CartesianProduct" not in plan


def test_semantic_dedup_gemm_matches_fold(spark):
    """The BLAS pair stage must produce the identical verdict set as the
    expression-fold stage (both threshold on 4-decimal-rounded sims)."""
    from pyspark.sql import functions as F

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    key = lambda r: (r["vec_id"], r["centroid_id"], r["is_dup"])  # noqa: E731
    fold = sorted(key(r) for r in semantic_dedup(emb, centroids, threshold=0.99).collect())
    gemm = sorted(key(r) for r in semantic_dedup(emb, centroids, threshold=0.99, gemm=True).collect())
    assert fold == gemm


class TestInterdocLineDedup:
    def _docs(self, spark):
        rows = [
            (0, "unique alpha line\nCOMMON BOILERPLATE\nunique beta line"),
            (1, "COMMON BOILERPLATE\nonly in doc one"),
            (2, "totally distinct text\nanother original line"),
            (3, "COMMON BOILERPLATE"),  # doc that is ONLY boilerplate
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cross_doc_lines_dropped_everywhere(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            interdoc_line_dedup,
        )

        out = {r["doc_id"]: r for r in interdoc_line_dedup(self._docs(spark)).collect()}
        assert out[0]["text"] == "unique alpha line\nunique beta line"
        assert out[1]["text"] == "only in doc one"
        assert out[2]["text"] == "totally distinct text\nanother original line"
        assert out[3]["text"] == "" and out[3]["n_kept"] == 0
        assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 2)

    def test_order_preserved_within_doc(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            interdoc_line_dedup,
        )

        df = spark.createDataFrame(
            [(0, "z last first\na middle\nm end"), (1, "noise")],
            "doc_id long, text string",
        )
        out = interdoc_line_dedup(df).filter("doc_id = 0").first()
        # original position order, NOT lexicographic
        assert out["text"] == "z last first\na middle\nm end"

    def test_max_docs_threshold(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            interdoc_line_dedup,
        )

        df = self._docs(spark)
        # boilerplate appears in 3 docs: survives at max_docs=3, dies at 2
        loose = interdoc_line_dedup(df, max_docs=3)
        assert loose.filter("doc_id = 3").first()["n_kept"] == 1
        strict = interdoc_line_dedup(df, max_docs=2)
        assert strict.filter("doc_id = 3").first()["n_kept"] == 0

    def test_within_doc_repeats_unaffected(self, spark):
        # a line repeated WITHIN one doc is not cross-doc boilerplate
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            interdoc_line_dedup,
        )

        df = spark.createDataFrame(
            [(0, "echo\necho\necho"), (1, "other")], "doc_id long, text string"
        )
        out = interdoc_line_dedup(df).filter("doc_id = 0").first()
        assert out["n_kept"] == 3 and out["text"] == "echo\necho\necho"


class TestIncrementalExactDedup:
    """New-batch admission dedup (operators/dedup.py::
    incremental_exact_dedup, round 9)."""

    def _frames(self, spark):
        base = spark.createDataFrame(
            [(1, "shared text"), (2, "base only text")],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [
                (10, "shared text"),        # dup_of_base
                (11, "fresh batch text"),   # new (first of its hash)
                (12, "fresh batch text"),   # dup_in_batch
                (13, "another new one"),    # new
            ],
            "doc_id long, text string",
        )
        return base, batch

    def test_three_way_classification(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            incremental_exact_dedup,
        )

        base, batch = self._frames(spark)
        got = {r["doc_id"]: r["status"]
               for r in incremental_exact_dedup(base, batch).collect()}
        assert got == {10: "dup_of_base", 11: "new",
                       12: "dup_in_batch", 13: "new"}

    def test_normalization_shared_with_exact_dedup(self, spark):
        """Whitespace-variant copies must match the base fingerprint —
        the same normalize-then-md5 contract exact_dedup uses."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            incremental_exact_dedup,
        )

        base = spark.createDataFrame([(1, "a  b\nc")], "doc_id long, text string")
        batch = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
        assert incremental_exact_dedup(base, batch).first()["status"] == "dup_of_base"

    def test_only_hashes_cross_the_exchange(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            incremental_exact_dedup,
        )

        base, batch = self._frames(spark)
        plan = (
            incremental_exact_dedup(base, batch)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        for m in re.finditer(r"Exchange [^\n]*", plan):
            assert "text#" not in m.group(0), m.group(0)


class TestNgramContainment:
    """Asymmetric containment pairs (round 9): doc-inside-doc that
    Jaccard dilutes below threshold."""

    def _docs(self, spark):
        inner = "one two three four five six seven eight"
        outer = inner + " " + " ".join(f"pad{i}" for i in range(40))
        return spark.createDataFrame(
            [(1, inner, "en"), (2, outer, "en"),
             (3, "totally different words entirely here now", "en")],
            "doc_id long, text string, lang string",
        )

    def test_contained_doc_found_where_jaccard_misses(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        docs = self._docs(spark)
        cont = ngram_containment_pairs(
            docs, block_col="lang", shingle_n=3, threshold=0.9
        ).collect()
        assert [(r["id_contained"], r["id_container"], r["containment"])
                for r in cont] == [(1, 2, 1.0)]
        # the same pair is invisible to Jaccard at any comparable bar
        jac = ngram_jaccard_pairs(
            docs, block_col="lang", shingle_n=3, threshold=0.5
        ).collect()
        assert jac == []

    def test_direction_is_smaller_into_larger(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        docs = self._docs(spark)
        r = ngram_containment_pairs(
            docs, block_col="lang", shingle_n=3, threshold=0.9
        ).first()
        assert r["id_contained"] == 1 and r["id_container"] == 2


class TestVerifyCandidatePairs:
    """Candidate-driven exact verification (round 9): the linear-at-
    scale half of the candidates -> verify split."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "one two three four five six seven"),
                (2, "one two three four five six seven"),     # exact dup of 1
                (3, "one two three four five six DIFFERENT"), # near-dup
                (4, "wholly unrelated content right here now"),
            ],
            "doc_id long, text string",
        )

    def test_verifies_only_given_candidates(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            verify_candidate_pairs,
        )

        docs = self._docs(spark)
        cands = spark.createDataFrame(
            [(1, 2), (1, 4)], "id_a long, id_b long"
        )
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in verify_candidate_pairs(cands, docs, threshold=0.5).collect()}
        # (1,2) verifies at 1.0; (1,4) fails the bar; (1,3) was NEVER a
        # candidate so it must not appear even though it would pass
        assert got == {(1, 2): 1.0}

    def test_matches_blocked_jaccard_on_full_pairs(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            ngram_jaccard_pairs,
            verify_candidate_pairs,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark).withColumn("lang", F.lit("en"))
        all_pairs = spark.createDataFrame(
            [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
            "id_a long, id_b long",
        )
        via_cand = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in verify_candidate_pairs(all_pairs, docs, threshold=0.3).collect()
        )
        via_block = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(docs, block_col="lang", threshold=0.3).collect()
        )
        assert via_cand == via_block

    def test_containment_metric_directed(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            verify_candidate_pairs,
        )

        inner = "a b c d e f g h"
        outer = inner + " " + " ".join(f"x{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, outer), (2, inner)], "doc_id long, text string"
        )
        cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = verify_candidate_pairs(
            cands, docs, metric="containment", threshold=0.9
        ).first()
        assert (r["id_contained"], r["id_container"], r["containment"]) == (2, 1, 1.0)

    def test_bad_metric_raises(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
            verify_candidate_pairs,
        )
        import pytest

        with pytest.raises(ValueError, match="unsupported metric"):
            verify_candidate_pairs(
                spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
                self._docs(spark),
                metric="dice",
            )
