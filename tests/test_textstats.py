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
