"""Unigram-LM tokenizer training (operators/unigram.py): DP vs
exhaustive reference, cost-boundary margins, determinism, coverage."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.unigram import (
    SCALE,
    SEP,
    _viterbi,
    costs_from_counts,
    piece_uses,
    segment_terms,
    select_seed_vocab,
    substring_stats,
    unigram_train,
)

SF = "/root/testdata/sf0.001"


def _enumerate(term, vocab):
    """All (pieces, cost) segmentations, by definition."""
    out = []

    def rec(pos, pieces, cost):
        if pos == len(term):
            out.append((SEP + SEP.join(pieces) if pieces else "", cost))
            return
        for ln in range(1, len(term) - pos + 1):
            p = term[pos : pos + ln]
            if p in vocab:
                rec(pos + ln, pieces + [p], cost + vocab[p])

    rec(0, [], 0)
    return out


class TestViterbi:
    VOCAB = {"a": 100, "b": 150, "c": 120, "ab": 180, "bc": 200, "abc": 330}

    @pytest.mark.parametrize("term", ["a", "ab", "abc", "abcabc", "cab", "bbbb"])
    def test_matches_exhaustive(self, term):
        pieces, cost, n_min = _viterbi(term, self.VOCAB, 3)
        all_segs = _enumerate(term, self.VOCAB)
        mc = min(c for _, c in all_segs)
        minimal = sorted(p for p, c in all_segs if c == mc)
        assert cost == mc
        assert n_min == len(minimal)
        if n_min == 1:
            assert pieces == minimal[0]

    def test_tie_counted(self):
        # "ab" as (ab)=100 or (a)(b)=100: two minimal paths
        vocab = {"a": 50, "b": 50, "ab": 100}
        pieces, cost, n_min = _viterbi("ab", vocab, 2)
        assert cost == 100 and n_min == 2

    def test_unreachable_term(self):
        pieces, cost, n_min = _viterbi("xyz", {"a": 1}, 1)
        assert cost is None and n_min == 0


class TestSeedAndCosts:
    def test_substring_stats_by_hand(self, spark):
        wf = spark.createDataFrame([("abab", 2), ("ab", 3)], "term string, freq long")
        got = {
            r["piece"]: r["cnt"]
            for r in substring_stats(wf, max_piece_len=3).collect()
        }
        # 'ab' occurs at 2 positions in 'abab' (freq 2) + 1 in 'ab' (freq 3)
        assert got["ab"] == 2 * 2 + 3
        assert got["a"] == 2 * 2 + 3 and got["b"] == 2 * 2 + 3
        assert got["aba"] == 2 and got["bab"] == 2
        assert "abab" not in got  # length 4 > max_piece_len

    def test_seed_keeps_all_chars_and_top_multi(self, spark):
        wf = spark.createDataFrame([("abcd", 1)], "term string, freq long")
        seed = select_seed_vocab(substring_stats(wf, 3), top_multi=2).collect()
        pieces = {r["piece"] for r in seed}
        assert {"a", "b", "c", "d"} <= pieces
        assert len([p for p in pieces if len(p) > 1]) == 2

    def test_cost_formula(self):
        costs = costs_from_counts([("a", 3), ("b", 1)])
        assert costs["a"] == int(math.floor(-math.log(3 / 4) * SCALE + 0.5))
        assert costs["b"] == int(math.floor(-math.log(1 / 4) * SCALE + 0.5))
        assert costs["b"] > costs["a"]

    def test_fixture_costs_far_from_floor_boundaries(self, spark):
        """The cross-engine determinism shield: ln() may differ by ~1 ulp
        between libm implementations; every fixture cost must sit far
        (>1e-3 units at 1e-10 ulp scale) from its floor boundary so no
        implementation can round differently."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bpe import (
            bpe_word_freqs,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        wf = bpe_word_freqs(docs)
        seed = select_seed_vocab(substring_stats(wf, 4), 24)
        seed_counts = [(r["piece"], int(r["cnt"])) for r in seed.collect()]

        def margins(counts):
            total = sum(c for _, c in counts)
            for p, c in counts:
                x = -math.log(c / total) * SCALE + 0.5
                yield p, min(x - math.floor(x), math.ceil(x) - x)

        bad = [(p, m) for p, m in margins(seed_counts) if m < 1e-3]
        assert not bad, f"round-1 costs near floor boundary: {bad}"

        # round 2: replicate the train path's vocab2
        costs1 = costs_from_counts(seed_counts)
        uses = {
            r["piece"]: int(r["uses"])
            for r in piece_uses(segment_terms(wf, costs1)).collect()
        }
        chars = sorted(p for p, _ in seed_counts if len(p) == 1)
        v2 = [(p, uses.get(p, 0) + 1) for p in chars]
        v2 += sorted(
            ((p, u) for p, u in uses.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:12]
        bad2 = [(p, m) for p, m in margins(v2) if m < 1e-3]
        assert not bad2, f"round-2 costs near floor boundary: {bad2}"


class TestTrain:
    def test_fixture_run_twice_is_identical(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        runs = []
        for _ in range(2):
            costs, seg, uses = unigram_train(docs)
            runs.append(
                (
                    costs,
                    sorted(tuple(r) for r in seg.collect()),
                    sorted(tuple(r) for r in uses.collect()),
                )
            )
        assert runs[0] == runs[1]

    def test_every_term_segments_uniquely_at_fixture(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        _, seg, _ = unigram_train(docs)
        rows = seg.collect()
        assert rows, "working set must be non-empty"
        assert all(r["n_min_paths"] == 1 for r in rows)
        # round-trip: pieces concatenate back to the term
        for r in rows:
            assert "".join(r["pieces"].split(SEP)[1:]) == r["term"]

    def test_multi_char_pieces_learned(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        _, _, uses = unigram_train(docs)
        multi = uses.filter(F.length("piece") > 1).count()
        assert multi > 0, "training must keep at least one multi-char piece"

    def test_uses_are_freq_weighted(self, spark):
        wf = spark.createDataFrame([("aa", 5), ("a", 2)], "term string, freq long")
        seg = segment_terms(wf, {"a": 10, "aa": 15})
        got = {r["piece"]: r["uses"] for r in piece_uses(seg).collect()}
        # 'aa' (cost 15) beats 'a'+'a' (20); 'a' used once with freq 2
        assert got == {"aa": 5, "a": 2}
