"""Winnowing fingerprints and content-defined chunking: python-reference
parity, the winnowing coverage guarantee, CDC boundary stability under
edits, and guards."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (
    cdc_chunks,
    winnow_fingerprints,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _norm(text: str) -> str:
    import re

    return re.sub(r"\s{2,}", " ", text.replace("\n", " ")).strip()


def _py_winnow(text: str, k: int = 8, w: int = 4) -> set[int]:
    t = _norm(text)
    p = max(len(t) - k + 1, 1)
    keys = [
        _h32(t[i : i + k]) * (1 << 30) + ((1 << 30) - 1 - (i + 1)) for i in range(p)
    ]
    sel = set()
    for tpos in range(p):
        if tpos == 0 or tpos + 1 <= p - w + 1:
            sel.add(min(keys[tpos : tpos + w]) // (1 << 30))
    return sel


def _py_cdc(text: str, w: int = 16, mod: int = 64):
    t = _norm(text)
    ln = len(t)
    ends = [p for p in range(w, ln + 1) if _h32(t[p - w : p]) % mod == 0]
    if not ends or ends[-1] != ln:
        ends.append(ln)
    out, prev = [], 0
    for e in ends:
        out.append((prev + 1, e - prev, hashlib.md5(t[prev:e].encode()).hexdigest()))
        prev = e
    return sorted(out)


_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog and keeps running through the forest at night"),
    (2, "the quick brown fox jumps over the lazy dog and keeps walking through the meadow at dawn"),
    (3, "tiny"),
    (4, "a" * 200 + "b" * 50),
    (5, "x  y\nz   multiple   whitespace\n\nruns"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_TEXTS, "doc_id long, text string")


class TestWinnow:
    def test_matches_python_reference(self, docs):
        got: dict[int, set[int]] = {}
        for r in winnow_fingerprints(docs).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for i, t in _TEXTS:
            assert got.get(i, set()) == _py_winnow(t), f"doc {i}"

    def test_coverage_guarantee(self, spark):
        # any shared substring of length >= k + w - 1 must contribute at
        # least one SHARED fingerprint (the winnowing theorem)
        k, w = 8, 4
        shared = "this exact block of text is common to both documents"
        assert len(shared) >= k + w - 1
        df = spark.createDataFrame(
            [(1, "AAAA " + shared + " BBBB"), (2, "prefix words here " + shared + " other tail")],
            "doc_id long, text string",
        )
        got: dict[int, set[int]] = {1: set(), 2: set()}
        for r in winnow_fingerprints(df, k=k, w=w).collect():
            got[r["doc_id"]].add(r["fp"])
        assert got[1] & got[2]

    def test_short_doc_still_fingerprints(self, spark):
        df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        rows = winnow_fingerprints(df).collect()
        assert len(rows) == 1 and rows[0]["fp"] == _h32("ab")

    def test_empty_doc_dropped(self, spark):
        df = spark.createDataFrame([(1, "   "), (2, "")], "doc_id long, text string")
        assert winnow_fingerprints(df).count() == 0

    def test_partitioning_independent(self, docs):
        one = sorted(map(tuple, winnow_fingerprints(docs.repartition(1)).collect()))
        many = sorted(map(tuple, winnow_fingerprints(docs.repartition(7)).collect()))
        assert one == many

    def test_guards(self, docs):
        with pytest.raises(ValueError, match="k must"):
            winnow_fingerprints(docs, k=1)
        with pytest.raises(ValueError, match="w must"):
            winnow_fingerprints(docs, w=0)


class TestCdcChunks:
    def test_matches_python_reference(self, docs):
        got: dict[int, list] = {}
        for r in cdc_chunks(docs).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_pos"], r["chunk_len"], r["chunk_hash"])
            )
        for i, t in _TEXTS:
            assert sorted(got.get(i, [])) == _py_cdc(t), f"doc {i}"

    def test_chunks_tile_the_document(self, docs):
        rows = cdc_chunks(docs).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append((r["chunk_pos"], r["chunk_len"]))
        for i, t in _TEXTS:
            spans = sorted(by_doc[i])
            assert spans[0][0] == 1
            for (p1, l1), (p2, _) in zip(spans, spans[1:]):
                assert p2 == p1 + l1
            assert spans[-1][0] + spans[-1][1] - 1 == len(_norm(t))

    def test_boundary_stability_under_prefix_edit(self, spark):
        # CDC's point: prepending text shifts positions but chunk CONTENT
        # downstream of the first post-edit boundary is identical
        # hash-diverse deterministic body (a periodic pattern has too few
        # distinct 16-grams for any boundary to fire)
        body = "".join(
            chr(97 + b % 26)
            for i in range(80)
            for b in hashlib.md5(f"block{i}".encode()).digest()
        )
        df = spark.createDataFrame(
            [(1, body), (2, "EDITED PREFIX INSERTED " + body)],
            "doc_id long, text string",
        )
        got: dict[int, set[str]] = {1: set(), 2: set()}
        for r in cdc_chunks(df).collect():
            got[r["doc_id"]].add(r["chunk_hash"])
        n_common = len(got[1] & got[2])
        assert n_common >= 1, "no chunk survived a prefix edit"
        # a fixed-size chunker would share ~0 chunks here
        assert n_common >= len(got[1]) // 2

    def test_guards(self, docs):
        with pytest.raises(ValueError, match="w must"):
            cdc_chunks(docs, w=1)
        with pytest.raises(ValueError, match="modulus"):
            cdc_chunks(docs, modulus=1)
