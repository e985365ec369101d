"""Round-6 additions: substring duplicated-span detection (python
reference parity, coverage semantics, short-doc/validation edges) and
Efraimidis-Spirakis deterministic weighted sampling (partitioning
invariance, weight proportionality, exclusion and validation)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
    substring_dup_spans,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
    weighted_sample_topn,
)


def _pos_tokens(spark, docs: dict[int, str]):
    rows = [
        (i, p, t)
        for i, text in docs.items()
        for p, t in enumerate(text.lower().split())
    ]
    return spark.createDataFrame(rows, "doc_id long, pos int, term string")


def _py_spans(docs: dict[int, str], k: int):
    toks = {i: t.lower().split() for i, t in docs.items()}
    grams: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams.setdefault(" ".join(ts[p : p + k]), set()).add(i)
    shared = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for i, ts in toks.items():
        cov: set[int] = set()
        for p in range(len(ts) - k + 1):
            if " ".join(ts[p : p + k]) in shared:
                cov.update(range(p, p + k))
        out[i] = (len(ts), len(cov))
    return out


class TestSubstringSpans:
    DOCS = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "once more the quick brown fox jumps over the lazy dog again and again",
        3: "entirely unrelated text with no shared phrases at all here",
        4: "short doc",  # below k, produces no grams
    }

    def test_matches_python_reference(self, spark):
        k = 4
        want = _py_spans(self.DOCS, k)
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_positions"])
            for r in substring_dup_spans(_pos_tokens(spark, self.DOCS), k=k).collect()
        }
        assert got == want

    def test_dup_frac_rounding(self, spark):
        k = 4
        for r in substring_dup_spans(_pos_tokens(spark, self.DOCS), k=k).collect():
            assert r["dup_frac"] == round(r["dup_positions"] / r["n_tokens"], 4)

    def test_unique_corpus_all_zero(self, spark):
        docs = {1: "alpha beta gamma delta epsilon", 2: "one two three four five"}
        out = substring_dup_spans(_pos_tokens(spark, docs), k=3).collect()
        assert all(r["dup_positions"] == 0 for r in out)

    def test_identical_docs_fully_covered(self, spark):
        docs = {1: "a b c d e f g h", 2: "a b c d e f g h"}
        out = {
            r["doc_id"]: r["dup_frac"]
            for r in substring_dup_spans(_pos_tokens(spark, docs), k=8).collect()
        }
        assert out == {1: 1.0, 2: 1.0}

    def test_rejects_bad_k(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            substring_dup_spans(_pos_tokens(spark, self.DOCS), k=1)


def _es_key(salt: str, ident: int, w: float) -> int:
    # quantized to integer 1e-8 units, matching the operator's
    # cross-engine ordering contract (ADVICE r6: no raw-double cuts)
    h = int(hashlib.md5(f"{salt}§{ident}".encode()).hexdigest()[:8], 16)
    u = (h + 1) / 2**32
    return math.floor((-math.log(u) / w) * 1e8 + 0.5)


class TestWeightedSample:
    @pytest.fixture(scope="class")
    def rows(self, spark):
        data = [(i, float((i * 73) % 997 + 1)) for i in range(500)]
        return spark.createDataFrame(data, "doc_id long, w double")

    def test_matches_python_keys(self, spark, rows):
        want = sorted(
            ((i, w) for i, w in ((r["doc_id"], r["w"]) for r in rows.collect())),
            key=lambda t: (_es_key("wsample", t[0], t[1]), t[0]),
        )[:25]
        got = [
            (r["doc_id"], r["w"])
            for r in weighted_sample_topn(rows, "w", 25).collect()
        ]
        assert got == [t for t in want]

    def test_partitioning_invariant(self, spark, rows):
        a = [r["doc_id"] for r in weighted_sample_topn(rows, "w", 30).collect()]
        b = [
            r["doc_id"]
            for r in weighted_sample_topn(rows.repartition(13), "w", 30).collect()
        ]
        assert a == b

    def test_weight_proportionality(self, spark):
        # one heavy row among uniform light rows: across many salts the
        # heavy row must appear in the top-1 far more often than 1/n
        data = [(i, 1.0) for i in range(100)] + [(1000, 500.0)]
        df = spark.createDataFrame(data, "doc_id long, w double")
        hits = sum(
            1
            for s in range(40)
            if weighted_sample_topn(df, "w", 1, salt=f"s{s}").collect()[0]["doc_id"]
            == 1000
        )
        assert hits >= 20  # expectation ~33 of 40; 1/n would be ~0.4

    def test_nonpositive_weights_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id long, w double"
        )
        got = [r["doc_id"] for r in weighted_sample_topn(df, "w", 10).collect()]
        assert got == [3]

    def test_rejects_bad_n(self, spark, rows):
        with pytest.raises(ValueError, match="n must be"):
            weighted_sample_topn(rows, "w", 0)
