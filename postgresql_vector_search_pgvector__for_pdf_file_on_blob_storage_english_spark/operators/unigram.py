"""Unigram-LM (SentencePiece-class) tokenizer training (VERDICT r6 #5).

Kudo 2018's unigram language-model tokenizer (public algorithm) learns
a piece vocabulary by EM: seed candidate pieces from substring
statistics, segment the corpus with the current piece probabilities
(Viterbi), re-estimate counts from the segmentation, prune, repeat.
It is the other half of the tokenizer story next to merge-based BPE
(operators/bpe.py).

Scale shape (the same working-set discipline as BPE):

* ONE corpus pass builds the ``(term, freq)`` distinct-word relation
  (reusing :func:`bpe.bpe_word_freqs` — printable-ASCII pinned, so
  both engines segment characters identically);
* substring seeding is a per-row higher-order-function explode over
  that relation + a map-side-combined groupBy (shuffle ∝ distinct
  substrings) + a TakeOrdered top-M cut;
* each EM round's E-step is an Arrow-batched ``mapInPandas`` Viterbi
  over the distinct-word relation — cost ∝ distinct words x max piece
  length, never the token stream — followed by an explode + partial
  agg for the freq-weighted piece-usage counts;
* the M-step collects the vocabulary (a BOUNDED collect — the vocab
  IS the tokenizer artifact, |alphabet| + top-M rows, exactly like the
  BPE merge table) and re-derives integer costs.

Determinism contract (the oracle story):

* Piece costs are INTEGER micro-nats: ``floor(-ln(cnt/total) * 1e6
  + 0.5)``, computed driver-side over the bounded vocab.  The DuckDB
  oracle computes the same expression; ``ln`` could differ by 1 ulp
  across libm implementations, so tests/test_unigram.py asserts every
  fixture cost sits far from a rounding boundary (margin test) — any
  residual drift would change a cost by 1 and fail the gate loudly,
  never silently.
* Viterbi compares integer path costs; among equal-cost paths the
  lexicographically smallest encoded piece string wins, and the DP
  carries ``n_min_paths`` (the count of minimal-cost segmentations).
  The gated entries EXPOSE ``n_min_paths`` — at the fixtures it is 1
  for every term, which makes the tie-break provably unexercised (the
  r6 BPE argmax lesson); if data ever introduced a tie, the column
  itself would flag it.
* The oracle replays the E-step by EXHAUSTIVE enumeration (a recursive
  CTE over all segmentations — bounded because the fixture working set
  is ~31 short words), while the engine runs the linear-time DP; equal
  answers prove the DP against the definition, not against itself.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # integer micro-nat cost units
SEP = "\x1e"  # piece separator in encoded segmentations (below ASCII)


def substring_stats(word_freqs: DataFrame, max_piece_len: int = 4) -> DataFrame:
    """Freq-weighted occurrence counts of every substring of length
    1..``max_piece_len`` of the distinct-word relation — the unigram
    seed statistics.  Pure codegen explode + partial-agg groupBy; the
    shuffle carries (piece, partial count) only."""
    pieces = F.explode(
        F.expr(
            f"""flatten(transform(sequence(1, length(term)), s ->
                transform(sequence(1, least({int(max_piece_len)}, length(term) - s + 1)),
                          l -> substring(term, s, l))))"""
        )
    ).alias("piece")
    return (
        word_freqs.select(pieces, "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def select_seed_vocab(
    stats: DataFrame, top_multi: int = 24
) -> DataFrame:
    """Seed vocabulary: EVERY single character (coverage guarantee)
    plus the ``top_multi`` multi-character substrings by
    (count desc, piece asc) — a TakeOrdered cut, deterministic under
    the total order."""
    chars = stats.filter(F.length("piece") == 1)
    multi = (
        stats.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(top_multi)
    )
    return chars.unionByName(multi)


def costs_from_counts(counts: list[tuple[str, int]]) -> dict[str, int]:
    """Integer micro-nat costs from (piece, count) rows: the bounded
    driver-side M-step.  ``floor(-ln(cnt/total) * 1e6 + 0.5)`` — the
    exact expression the oracle replays in SQL."""
    total = sum(c for _, c in counts)
    return {
        p: int(math.floor(-math.log(c / total) * SCALE + 0.5))
        for p, c in counts
    }


def _viterbi(term: str, vocab: dict[str, int], max_len: int):
    """Linear-time min-cost segmentation.  Returns (encoded pieces
    string with a leading SEP, total cost, number of min-cost paths).
    Among equal-cost paths the lexicographically smallest encoded
    string is kept — unexercised at n_min_paths == 1 (module
    docstring)."""
    n = len(term)
    dp_cost: list[int | None] = [0] + [None] * n
    dp_n = [1] + [0] * n
    dp_str: list[str | None] = [""] + [None] * n
    for pos in range(1, n + 1):
        for ln in range(1, min(max_len, pos) + 1):
            prev = pos - ln
            if dp_cost[prev] is None:
                continue
            c = vocab.get(term[prev:pos])
            if c is None:
                continue
            cand = dp_cost[prev] + c
            if dp_cost[pos] is None or cand < dp_cost[pos]:
                dp_cost[pos] = cand
                dp_n[pos] = dp_n[prev]
                dp_str[pos] = dp_str[prev] + SEP + term[prev:pos]
            elif cand == dp_cost[pos]:
                dp_n[pos] += dp_n[prev]
                s = dp_str[prev] + SEP + term[prev:pos]
                if s < dp_str[pos]:
                    dp_str[pos] = s
    return dp_str[n], dp_cost[n], dp_n[n]


def segment_terms(
    word_freqs: DataFrame,
    vocab: dict[str, int],
    term_col: str = "term",
) -> DataFrame:
    """E-step / inference path: Viterbi-segment every term with the
    given piece->cost vocabulary.  Arrow-batched ``mapInPandas`` over
    the distinct-word relation; adds ``pieces`` (SEP-encoded), ``cost``
    (total micro-nats) and ``n_min_paths``.  The vocabulary rides the
    closure — the same bounded data movement a broadcast performs."""
    import pandas as pd

    max_len = max((len(p) for p in vocab), default=1)
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in word_freqs.schema
    )
    schema = f"{out_fields}, pieces string, cost long, n_min_paths long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            res = [
                _viterbi(t, vocab, max_len) for t in pdf[term_col]
            ]
            pdf = pdf.copy()
            pdf["pieces"] = [r[0] for r in res]
            pdf["cost"] = [r[1] for r in res]
            pdf["n_min_paths"] = [r[2] for r in res]
            yield pdf

    return word_freqs.mapInPandas(run, schema)


def piece_uses(segmented: DataFrame) -> DataFrame:
    """Freq-weighted piece-usage counts of a segmented relation — the
    E-step aggregate.  Explode + map-side-combined groupBy."""
    return (
        segmented.select(
            "freq",
            F.explode(
                F.split(F.expr("substring(pieces, 2, length(pieces) - 1)"), SEP)
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("uses"))
    )


def unigram_train(
    docs: DataFrame,
    max_piece_len: int = 4,
    top_multi: int = 24,
    keep_multi: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    word_freqs: DataFrame | None = None,
):
    """Two-round unigram-LM training.  Returns ``(vocab_costs,
    segmented, uses)`` for the FINAL round: the piece->cost dict (the
    artifact a tokenizer ships), the final segmentation relation and
    the final usage counts, all derived deterministically:

    round 1: seed substring stats -> top-M vocab -> costs -> Viterbi;
    round 2: usage counts (chars Laplace +1 so coverage survives zero
    use; multi pieces kept by (uses desc, piece asc) top-``keep_multi``)
    -> costs -> Viterbi.

    Two bounded vocab collects (|alphabet| + M rows each) are the only
    driver state — the tokenizer-artifact contract shared with BPE
    merge tables."""
    from .bpe import bpe_word_freqs

    if word_freqs is None:
        word_freqs = bpe_word_freqs(docs, text_col=text_col, id_col=id_col)
    # Materialize the bounded distinct-term working set once — it feeds
    # three downstream jobs (seed stats, round-1 E-step, round-2 E-step)
    # that would each re-execute the corpus tokenize + group-by lineage.
    word_freqs = word_freqs.select("term", "freq").localCheckpoint(eager=True)

    seed = select_seed_vocab(
        substring_stats(word_freqs, max_piece_len), top_multi
    )
    seed_counts = [(r["piece"], int(r["cnt"])) for r in seed.collect()]
    costs1 = costs_from_counts(seed_counts)

    seg1 = segment_terms(word_freqs, costs1)
    uses1 = piece_uses(seg1)

    # M-step: chars keep coverage with +1 smoothing; multi pieces must
    # earn their slot through round-1 usage.
    chars = {p for p, _ in seed_counts if len(p) == 1}
    use_rows = [(r["piece"], int(r["uses"])) for r in uses1.collect()]
    use_map = dict(use_rows)
    vocab2 = [(p, use_map.get(p, 0) + 1) for p in sorted(chars)]
    multi = sorted(
        ((p, u) for p, u in use_rows if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:keep_multi]
    vocab2 += multi
    costs2 = costs_from_counts(vocab2)

    seg2 = segment_terms(word_freqs, costs2)
    uses2 = piece_uses(seg2)
    return costs2, seg2, uses2
