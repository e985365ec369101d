"""DSIR importance resampling (operators/dsir.py): hashed-feature
log-ratio weights, document scoring, deterministic top-k selection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dsir import (
    SCALE,
    dsir_bucket_weights,
    dsir_scores,
    dsir_select,
)


@pytest.fixture()
def corpus(spark):
    # target docs repeat 'alpha'; raw background repeats 'beta'
    rows = [
        (0, "alpha alpha alpha gamma", True),
        (1, "alpha gamma alpha alpha", True),
        (2, "beta beta beta gamma", False),
        (3, "beta gamma beta beta", False),
        (4, "alpha beta gamma gamma", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_en boolean")


class TestBucketWeights:
    def test_matches_python_reference(self, spark, corpus):
        import hashlib

        def bucket(term, B=8):
            return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % B

        rows = corpus.collect()
        t_cnt, r_cnt = {}, {}
        for r in rows:
            for w in r["text"].split():
                b = bucket(w)
                r_cnt[b] = r_cnt.get(b, 0) + 1
                if r["is_en"]:
                    t_cnt[b] = t_cnt.get(b, 0) + 1
        T, R = sum(t_cnt.values()), sum(r_cnt.values())
        expect = {
            b: math.floor(
                (math.log((t_cnt.get(b, 0) + 1) / (T + 8))
                 - math.log((r_cnt.get(b, 0) + 1) / (R + 8))) * SCALE + 0.5
            )
            for b in r_cnt
        }
        got = {
            r["bucket"]: r["weight_micro"]
            for r in dsir_bucket_weights(
                corpus, F.col("is_en"), n_buckets=8
            ).collect()
        }
        assert got == expect

    def test_rejects_bad_buckets(self, spark, corpus):
        with pytest.raises(ValueError, match="n_buckets"):
            dsir_bucket_weights(corpus, F.col("is_en"), n_buckets=0)


class TestSelection:
    def test_target_like_docs_rank_first(self, spark, corpus):
        """Docs dominated by the target-distinctive token must outrank
        background docs; a mixed doc lands between."""
        got = [r["doc_id"] for r in
               dsir_select(corpus, F.col("is_en"), k=5, n_buckets=8).collect()]
        assert set(got[:2]) == {0, 1}
        assert set(got[-2:]) == {2, 3}

    def test_scores_are_token_weight_sums(self, spark, corpus):
        w = dsir_bucket_weights(corpus, F.col("is_en"), n_buckets=8)
        wmap = {r["bucket"]: r["weight_micro"] for r in w.collect()}
        import hashlib

        def bucket(term, B=8):
            return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % B

        got = {r["doc_id"]: (r["n_tokens"], r["score_micro"])
               for r in dsir_scores(corpus, w, n_buckets=8).collect()}
        for r in corpus.collect():
            toks = r["text"].split()
            expect = sum(wmap[bucket(t)] for t in toks)
            assert got[r["doc_id"]] == (len(toks), expect)

    def test_rejects_bad_k(self, spark, corpus):
        with pytest.raises(ValueError, match="k must be"):
            dsir_select(corpus, F.col("is_en"), k=0)

    def test_no_text_crosses_an_exchange(self, spark, corpus):
        """The corpus text must be reduced to (doc, bucket) counts and
        (bucket) partials before any shuffle."""
        plan = (
            dsir_select(corpus, F.col("is_en"), k=3, n_buckets=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        for m in re.finditer(r"Exchange [^\n]*", plan):
            assert "text#" not in m.group(0), m.group(0)
