"""WordPiece tokenizer: likelihood-scored training + greedy
longest-match segmentation (operators/wordpiece.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def wp_parts(spark):
    """Train once at the smoke fixture; share across tests."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bpe import (
        bpe_word_freqs,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.wordpiece import (
        wordpiece_learn_merges,
        wordpiece_segment,
        wordpiece_vocab,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    wf = bpe_word_freqs(docs)
    merges = wordpiece_learn_merges(docs, n_merges=6, word_freqs=wf)
    vocab = wordpiece_vocab(wf, merges, top_chars=20)
    seg = wordpiece_segment(wf.select("term"), vocab, max_word_len=16)
    return wf, merges.orderBy("step").collect(), vocab, seg.collect()


class TestWordPieceTraining:
    def test_merge_table_shape_and_types(self, wp_parts):
        _, merges, _, _ = wp_parts
        assert len(merges) == 6
        assert [r["step"] for r in merges] == [1, 2, 3, 4, 5, 6]
        for r in merges:
            assert isinstance(r["pair_count"], int) and r["pair_count"] >= 1
            assert r["left_count"] >= r["pair_count"]
            assert r["right_count"] >= r["pair_count"]

    def test_no_score_ties_at_fixture(self, wp_parts):
        # The unigram n_min_paths discipline: the lexicographic
        # tie-break must be provably unexercised at the gated fixtures.
        _, merges, _, _ = wp_parts
        assert all(r["n_best"] == 1 for r in merges)

    def test_syms_after_strictly_decreasing(self, wp_parts):
        _, merges, _, _ = wp_parts
        seq = [r["syms_after"] for r in merges]
        assert all(a > b for a, b in zip(seq, seq[1:], strict=False))

    def test_deterministic_retrain(self, spark, wp_parts):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.wordpiece import (
            wordpiece_learn_merges,
        )

        _, merges, _, _ = wp_parts
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        again = wordpiece_learn_merges(docs, n_merges=6).orderBy("step").collect()
        assert [tuple(r) for r in again] == [tuple(r) for r in merges]

    def test_likelihood_argmax_differs_from_bpe_count_argmax(self, wp_parts):
        # The defining property: WordPiece's first merge maximizes
        # pair/(l*r); verify the winner's score beats the raw-count
        # winner's score (they may coincide on some fixtures, but the
        # score ordering must hold by construction).
        _, merges, _, _ = wp_parts
        r = merges[0]
        assert r["pair_count"] / (r["left_count"] * r["right_count"]) > 0

    def test_rejects_bad_n_merges(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.wordpiece import (
            wordpiece_learn_merges,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        with pytest.raises(ValueError):
            wordpiece_learn_merges(docs, n_merges=0)


class TestWordPieceSegmentation:
    def test_nonvacuous_unk_and_multipiece(self, wp_parts):
        # The gate is only meaningful if both branches fire at the
        # fixture: at least one [UNK] word (rare char or >16 chars) and
        # at least one multi-piece segmentation.
        _, _, _, rows = wp_parts
        assert any(r["is_unk"] for r in rows), "no UNK at fixture — vacuous"
        assert any(
            (not r["is_unk"]) and r["n_wp"] > 1 for r in rows
        ), "no multi-piece segmentation at fixture — vacuous"

    def test_reconstruction(self, wp_parts):
        # Stripping '##' continuation markers and concatenating pieces
        # must reproduce the term exactly (skip terms containing the
        # display separator '|', where splitting is ambiguous).
        _, _, _, rows = wp_parts
        checked = 0
        for r in rows:
            if r["is_unk"] or "|" in r["term"]:
                continue
            pieces = r["wp_tokens"].split("|")
            assert len(pieces) == r["n_wp"]
            assert pieces[0] == pieces[0].removeprefix("##")
            joined = pieces[0] + "".join(p.removeprefix("##") for p in pieces[1:])
            assert joined == r["term"], r
            checked += 1
        assert checked > 10

    def test_longest_match_first_synthetic(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.wordpiece import (
            wordpiece_segment,
        )

        df = spark.createDataFrame(
            [("abcd",), ("abq",), ("zz",), ("a" * 17,)], "term string"
        )
        vocab = ["a", "b", "c", "d", "ab", "abc"]
        got = {
            r["term"]: (r["wp_tokens"], r["n_wp"], r["is_unk"])
            for r in wordpiece_segment(df, vocab, max_word_len=16).collect()
        }
        # maximal munch: 'abc' wins over 'ab' and 'a'
        assert got["abcd"] == ("abc|##d", 2, False)
        # dead end at 'q' -> whole word is UNK (greedy does NOT backtrack)
        assert got["abq"] == ("[UNK]", 1, True)
        assert got["zz"] == ("[UNK]", 1, True)
        # over max_word_len -> UNK without scanning
        assert got["a" * 17] == ("[UNK]", 1, True)

    def test_vocab_is_bounded_and_sorted(self, wp_parts):
        _, merges, vocab, _ = wp_parts
        assert vocab == sorted(set(vocab))
        merged = {r["left"] + r["right"] for r in merges}
        assert merged <= set(vocab)
