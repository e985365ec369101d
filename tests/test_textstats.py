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
