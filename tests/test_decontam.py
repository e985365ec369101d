"""Benchmark decontamination (operators/decontam.py): planted leaks are
flagged, clean docs are not, and the plan keeps the broadcast shape."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.decontam import (
    benchmark_grams,
    contamination_flags,
)
from pyspark.sql import functions as F

BENCH_SENT = "the quick brown fox jumps over the lazy dog every single day"


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            # verbatim copy of a benchmark doc — full contamination
            (1, BENCH_SENT),
            # contains the benchmark sentence inside a longer doc
            (2, "prefix words here " + BENCH_SENT + " and a suffix too"),
            # shares only a 7-word prefix (below n=8) — clean
            (3, "the quick brown fox jumps over the fence into the garden"),
            # disjoint vocabulary — clean
            (4, "completely unrelated text about distributed query engines and shuffles"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, BENCH_SENT)], ["doc_id", "text"])
    return train, bench


def test_flags_planted_leaks(spark, corpus):
    train, bench = corpus
    out = {r["doc_id"]: r for r in contamination_flags(train, bench, n=8).collect()}

    assert out[1]["contaminated"] and out[1]["n_hits"] == out[1]["n_grams"]
    assert out[2]["contaminated"] and 0 < out[2]["n_hits"] < out[2]["n_grams"]
    assert not out[3]["contaminated"] and out[3]["n_hits"] == 0
    assert not out[4]["contaminated"] and out[4]["n_hits"] == 0


def test_short_doc_fallback(spark, corpus):
    _, bench = corpus
    # docs under n words shingle to their full text: only an exact short
    # benchmark doc matches it
    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other tiny")], ["doc_id", "text"]
    )
    bench_short = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in contamination_flags(train, bench_short, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_grams"] == 1
    assert not out[2]["contaminated"]


def test_gram_side_is_distinct(spark, corpus):
    train, bench = corpus
    doubled = bench.union(bench)  # duplicate benchmark rows must not double-count
    a = {r["doc_id"]: r["n_hits"] for r in contamination_flags(train, bench, n=8).collect()}
    b = {r["doc_id"]: r["n_hits"] for r in contamination_flags(train, doubled, n=8).collect()}
    assert a == b
    assert benchmark_grams(doubled, n=8).count() == benchmark_grams(bench, n=8).count()


def test_plan_broadcasts_benchmark(spark, corpus):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (
        explain_str,
        has_broadcast_hash_join,
    )

    train, bench = corpus
    df = contamination_flags(train, bench, n=8)
    assert has_broadcast_hash_join(df)
    # the only non-broadcast exchanges: benchmark-side distinct (small)
    # and the final per-doc count — the train side itself never shuffles
    # exploded gram rows.
    plan = explain_str(df, "formatted")
    assert "partial_count" in plan or "partial_" in plan
