"""Sequence packing (concat-and-chunk layout): parity with a
pure-Python fold over the same document order, straddler semantics,
zero-token drop, long-document spans, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.packing import (
    pack_concat_layout,
)


def _py_layout(counts: dict[int, int], budget: int):
    """Reference: sequential concat of counts in id order."""
    out = {}
    off = 0
    for doc_id in sorted(counts):
        n = counts[doc_id]
        if n <= 0:
            continue
        first = off // budget
        last = (off + n - 1) // budget
        out[doc_id] = (off, first, last - first + 1)
        off += n
    return out


@pytest.fixture(scope="module")
def toks(spark):
    rows = [(i, (i * 37) % 23 + 1) for i in range(200)] + [(500, 0), (501, 57)]
    return spark.createDataFrame(rows, "doc_id long, ws_tokens long")


class TestLayout:
    @pytest.mark.parametrize("budget", [7, 64, 10_000])
    def test_matches_python_fold(self, toks, budget):
        counts = {r["doc_id"]: r["ws_tokens"] for r in toks.collect()}
        want = _py_layout(counts, budget)
        got = {
            r["doc_id"]: (r["token_offset"], r["window_id"], r["windows_spanned"])
            for r in pack_concat_layout(toks, budget=budget).collect()
        }
        assert got == want

    def test_zero_token_docs_dropped(self, toks):
        ids = {r["doc_id"] for r in pack_concat_layout(toks, budget=64).collect()}
        assert 500 not in ids and 501 in ids

    def test_long_doc_spans_many_windows(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 1000), (3, 5)], "doc_id long, ws_tokens long")
        got = {
            r["doc_id"]: r["windows_spanned"]
            for r in pack_concat_layout(df, budget=10).collect()
        }
        # doc 2 starts at offset 5: tokens 5..1004 touch windows 0..100
        assert got == {1: 1, 2: 101, 3: 1}

    def test_total_conservation(self, toks):
        # offsets are a permutation-free exact prefix sum: max(offset+n)
        # == sum(n) over kept docs
        layout = pack_concat_layout(toks, budget=64)
        top = layout.agg(
            F.max(F.col("token_offset") + F.col("ws_tokens")).alias("hi"),
            F.sum("ws_tokens").alias("total"),
        ).collect()[0]
        assert top["hi"] == top["total"]


class TestPlanShape:
    def test_no_unpartitioned_window(self, toks):
        plan = (
            pack_concat_layout(toks, budget=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "No Partition Defined" not in plan


class TestValidation:
    def test_bad_budget(self, toks):
        with pytest.raises(ValueError, match="budget"):
            pack_concat_layout(toks, budget=0)
