"""Text-analysis operators on hand-built rows with known answers."""

from __future__ import annotations

import hashlib

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "the cat and the dog of a to"),          # english markers everywhere
        (2, "der hund und die katze nicht hier"),    # german markers
        (3, "xyzzy plugh qwertyuiop"),               # no markers at all
        (4, "hello, world! 42 times"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(spark, df):
    out = {r["doc_id"]: (r["pred_lang"], r["marker_hits"]) for r in language_id(df).collect()}
    assert out[1][0] == "en" and out[1][1] > 0
    assert out[2][0] == "de"
    assert out[3] == ("und", 0)


def test_token_stats_known_counts(spark, df):
    out = {r["doc_id"]: r for r in token_stats(df).collect()}
    # "hello, world! 42 times" -> ws tokens: 4
    # BPE-ish: hello , world ! 42 times -> 6
    assert out[4]["ws_tokens"] == 4
    assert out[4]["bpe_tokens"] == 6
    assert out[4]["chars_per_token"] == round(len("hello, world! 42 times") / 6, 4)


def test_quality_score_features(spark, df):
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    r = out[1]
    assert r["n_words"] == 8
    assert r["n_chars"] == len("the cat and the dog of a to")
    assert 0.0 <= r["quality"] <= 1.0
    # doc 1 (all stopwords) must out-score doc 3 (no stopwords)
    assert out[1]["quality"] > out[3]["quality"]
    # symbol-free text has symbol_ratio 0
    assert out[1]["symbol_ratio"] == 0.0
    assert out[4]["symbol_ratio"] > 0.0


def test_fingerprint_is_md5_of_normalized(spark):
    df = spark.createDataFrame([(1, "a  b\nc")], "doc_id long, text string")
    r = fingerprint(df).first()
    expect = hashlib.md5(b"a b c").hexdigest()
    assert r["fingerprint"] == expect
    assert r["fingerprint60"] == int(expect[:15], 16)


def test_gopher_flags_rules(spark):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
        gopher_quality_flags,
    )

    rows = [
        (1, " ".join(["word"] * 60)),                     # clean: passes all
        (2, "too short"),                                 # fails word_count
        (3, " ".join(["word"] * 30) + "\n" + "\n".join(f"- bullet {i}" for i in range(30))),  # bullet-heavy
        (4, " ".join(["####"] * 60)),                     # symbol + alpha fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["word_count_ok"] is False and out[2]["keep"] is False
    assert out[3]["bullet_ratio_ok"] is False
    assert out[4]["symbol_ratio_ok"] is False
    assert out[4]["alpha_word_ratio_ok"] is False


def test_hash_sample_deterministic_and_disjoint_salts(spark):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
        hash_sample,
        train_test_split_hash,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in hash_sample(df, "doc_id", 20).collect()}
    s2 = {r["doc_id"] for r in hash_sample(df.repartition(7), "doc_id", 20).collect()}
    assert s1 == s2                      # partitioning-independent
    assert 0.15 < len(s1) / 2000 < 0.25  # ~20%
    sub = {r["doc_id"] for r in hash_sample(df, "doc_id", 10).collect()}
    assert sub <= s1                     # rates nest (same salt, lower cutoff)

    split = train_test_split_hash(df, "doc_id", test_pct=10)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == 2000
    assert 0.05 < counts["test"] / 2000 < 0.15


class TestRepetitionStats:
    @pytest.fixture(scope="class")
    def rep(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            repetition_stats,
        )

        rows = [
            # 4 non-empty lines, "spam spam" twice (8 chars x2 of 22 total)
            (1, "spam spam\nham\nspam spam\neggs\n"),
            # all lines distinct
            (2, "alpha\nbeta\ngamma"),
            # one word: no bigrams
            (3, "loner"),
            # empty text
            (4, ""),
            # "buy now" dominates the bigrams: buy now buy now buy now
            (5, "buy now buy now buy now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in repetition_stats(df).collect()}

    def test_duplicate_lines(self, rep):
        r = rep[1]
        assert r["n_lines"] == 4
        assert r["dup_line_frac"] == pytest.approx(1 - 3 / 4)
        # dup chars: 2 x len("spam spam") = 18 of 18+3+4 = 25 line chars
        assert r["dup_line_char_frac"] == pytest.approx(round(18 / 25, 4))

    def test_no_duplicates(self, rep):
        assert rep[2]["dup_line_frac"] == 0.0
        assert rep[2]["dup_line_char_frac"] == 0.0

    def test_top_bigram(self, rep):
        # bigrams: (buy now) x3, (now buy) x2 -> "buy now" at 3/5
        assert rep[5]["top_bigram"] == "buy now"
        assert rep[5]["top_bigram_frac"] == pytest.approx(0.6)

    def test_edge_docs_survive(self, rep):
        assert rep[3]["top_bigram"] == "" and rep[3]["top_bigram_frac"] == 0.0
        assert rep[4]["n_lines"] == 0
        assert rep[4]["dup_line_frac"] == 0.0

    def test_tie_breaks_lexicographic(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            repetition_stats,
        )

        # "b c" and "a b" both occur once; the lex-smaller bigram wins
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        r = repetition_stats(df).collect()[0]
        assert r["top_bigram"] == "a b"


class TestLineQualityFilter:
    def test_c4_rules(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            line_quality_filter,
        )

        docs = spark.createDataFrame(
            [
                (1, "this line survives the filter.\nshort one.\n"
                    "no terminal punctuation here at all\n"
                    "please enable JavaScript to continue.\n"
                    "we use cookie banners everywhere.\n"
                    "another perfectly good sentence stays!"),
                (2, "every single line here fails\nso does this\nx y."),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in line_quality_filter(docs).collect()}

        r1 = out[1]
        assert r1["n_lines"] == 6
        # survivors: line 1 (punct+words) and line 6 (!); dropped: 2-word
        # "short one.", unpunctuated line, javascript line, cookie line
        assert r1["n_kept"] == 2
        assert r1["filtered_text"] == (
            "this line survives the filter.\nanother perfectly good sentence stays!"
        )

        r2 = out[2]
        assert r2["n_kept"] == 0 and r2["filtered_text"] == ""

    def test_punct_rule_optional(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            line_quality_filter,
        )

        docs = spark.createDataFrame(
            [(1, "three words unpunctuated\nanother three words")],
            ["doc_id", "text"],
        )
        strict = line_quality_filter(docs).collect()[0]
        lax = line_quality_filter(docs, require_terminal_punct=False).collect()[0]
        assert strict["n_kept"] == 0
        assert lax["n_kept"] == 2


class TestUnigramLM:
    def _docs(self, spark):
        rows = [
            (0, "the the the cat"),       # all high-frequency tokens
            (1, "the cat sat"),
            (2, "zyxqw the cat"),          # one hapax -> lower mean logprob
            (3, "zyxqw vvvqk pppqj"),      # all hapaxes -> lowest
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_logprob_orders_by_typicality(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            unigram_logprob,
        )

        out = {r["doc_id"]: r for r in unigram_logprob(self._docs(spark)).collect()}
        assert out[0]["logprob"] > out[2]["logprob"] > out[3]["logprob"]
        assert out[0]["n_tokens"] == 4
        # mean log-prob is a probability log: always < 0, >= -ln(N)
        import math

        n_total = 13
        for r in out.values():
            assert -math.log(n_total) - 1e-9 <= r["logprob"] < 0

    def test_exact_value_tiny_corpus(self, spark):
        import math

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            unigram_logprob,
        )

        df = spark.createDataFrame(
            [(0, "a a b"), (1, "b c")], "doc_id long, text string"
        )
        # counts: a=2 b=2 c=1, N=5
        out = {r["doc_id"]: r["logprob"] for r in unigram_logprob(df).collect()}
        exp0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
        exp1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
        assert out[0] == pytest.approx(exp0, rel=1e-12)
        assert out[1] == pytest.approx(exp1, rel=1e-12)

    def test_shuffle_join_variant_matches_broadcast(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            unigram_logprob,
        )

        df = self._docs(spark)
        a = sorted(map(tuple, unigram_logprob(df, broadcast_vocab=True).collect()))
        b = sorted(map(tuple, unigram_logprob(df, broadcast_vocab=False).collect()))
        assert a == pytest.approx(b)

    def test_ccnet_buckets_equal_frequency(self, spark):
        import pyspark.sql.functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            ccnet_buckets,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = ccnet_buckets(docs)
        sizes = {
            r["bucket"]: r["n"]
            for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert set(sizes) == {"head", "middle", "tail"}
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile contract
        # head docs score >= tail docs (bucket 1 = best)
        head_min = out.filter(F.col("bucket") == "head").agg(F.min("logprob")).first()[0]
        tail_max = out.filter(F.col("bucket") == "tail").agg(F.max("logprob")).first()[0]
        assert head_min >= tail_max

    def test_ccnet_bad_names_raise(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.textstats import (
            ccnet_buckets,
        )

        with pytest.raises(ValueError):
            ccnet_buckets(self._docs(spark), names=("a", "b"))
