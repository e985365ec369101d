"""WordPiece tokenizer: likelihood-scored merge training + greedy
longest-match-first segmentation (round 8).

Completes the trained-tokenizer triad next to BPE (operators/bpe.py,
merge by raw pair count) and unigram-LM (operators/unigram.py, Viterbi
over piece log-probs).  WordPiece (Schuster & Nakajima 2012; Wu et al.
2016, public algorithm) differs from BPE in exactly one place during
training — the merge argmax maximizes the likelihood gain

    score(L, R) = count(LR) / (count(L) * count(R))

instead of ``count(LR)`` alone — and differs at inference entirely:
the shipped vocabulary is applied by GREEDY LONGEST-MATCH-FIRST
(maximal munch) scanning, not by replaying merges in training order.

Scale shape (same as BPE training — see operators/bpe.py docstring):
ONE corpus pass builds the distinct ``(term, freq)`` working set; every
merge iteration runs map-side-combined aggregates over that relation
only, with three bounded driver collects per step (the 1-row argmax,
the tie-count cross-check, the 1-row ``syms_after`` cross-check) — the
merge table IS driver state, bounded by ``n_merges``.  Segmentation
runs Arrow-batched over DISTINCT terms against a broadcast vocabulary
(bounded: alphabet + n_merges pieces), the unigram-Viterbi pattern.

Cross-engine determinism:

* The working set is printable-ASCII (``^[!-~]+$``), inheriting every
  round-7 BPE segmentation guarantee (byte == code point == grapheme).
* The score is ONE IEEE division of exact integers (all counts and the
  ``count(L)*count(R)`` product stay far below 2^53), so Spark and
  DuckDB compute bit-identical doubles and the ``ORDER BY score DESC,
  left, right`` argmax is identical.  The merge table carries
  ``n_best`` — how many pairs attain the max score that step — so a
  tie, where the lexicographic tie-break would have to agree, is
  visible in the gated result (1 everywhere at the fixtures, the
  unigram ``n_min_paths`` discipline), plus the BPE ``syms_after``
  per-step segmentation cross-check.
* Greedy matching is positionless: the same vocabulary matches at
  every character offset (SentencePiece-style vocab, WordPiece-style
  scanning); continuation pieces are rendered with the classic ``##``
  prefix in the OUTPUT only.  Deviation from HuggingFace WordPiece
  (which trains a separate ``##``-prefixed continuation vocabulary) is
  deliberate and documented — the matching semantics, not the vocab
  bookkeeping, are what the oracle proves.
* A word with no vocabulary match at some position, or longer than
  ``max_word_len`` chars, maps to the single token ``[UNK]`` — the
  standard WordPiece contract (HF ``max_input_chars_per_word``).  The
  shipped alphabet keeps only characters with freq-weighted count >=
  ``min_char_freq``, so rare-character words genuinely exercise the
  UNK path at the fixtures (non-vacuity is test-gated).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import (
    ASCII_TERM_RE,
    SYM_CLOSE,
    SYM_OPEN,
    _adjacent_pairs,
    _wrap_chars,
    bpe_word_freqs,
    merge_pattern,
)

UNK_TOKEN = "[UNK]"


def wordpiece_learn_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges; returns the merge table
    ``(step, left, right, pair_count, left_count, right_count, n_best,
    syms_after)`` in learning order.

    Integer-only output (the r6 BPE HUGEINT lesson): the score doubles
    drive the argmax but never leave the loop; ``left_count`` /
    ``right_count`` let any consumer recompute them exactly."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    if word_freqs is None:
        word_freqs = bpe_word_freqs(docs, text_col=text_col, id_col=id_col)
    # Materialize the bounded working set once (localCheckpoint, the
    # graph.py fixed-point convention): without it every merge step's
    # three jobs re-execute the full corpus tokenize + group-by lineage
    # — measured 21 s -> flat at the 10x replication fixture.
    cur = word_freqs.select(
        _wrap_chars(F.col("term")).alias("seq"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int, int, int, int, int]] = []
    syms_arr = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), SYM_CLOSE + SYM_OPEN
    )
    for step in range(1, n_merges + 1):
        sym_counts = (
            cur.select(F.explode(syms_arr).alias("sym"), "freq")
            .groupBy("sym")
            .agg(F.sum("freq").alias("cnt"))
        )
        pairs = (
            cur.select("freq", F.explode(_adjacent_pairs("seq")).alias("p"))
            .select("freq", "p.left", "p.right")
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_count"))
        )
        scored = (
            pairs.join(
                F.broadcast(sym_counts.select(F.col("sym").alias("left"),
                                              F.col("cnt").alias("cl"))),
                "left",
            )
            .join(
                F.broadcast(sym_counts.select(F.col("sym").alias("right"),
                                              F.col("cnt").alias("cr"))),
                "right",
            )
            .withColumn(
                "score",
                F.col("pair_count").cast("double")
                / (F.col("cl") * F.col("cr")).cast("double"),
            )
        )
        best = (
            scored.orderBy(F.col("score").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        # Tie cross-check: both engines computed identical doubles, so
        # the count of max-score pairs is identical — and 1 at every
        # fixture, proving the lexicographic tie-break is unexercised.
        n_best = scored.filter(F.col("score") == F.lit(b["score"])).count()
        pat, rep = merge_pattern(b["left"], b["right"])
        cur = cur.select(
            F.replace("seq", F.lit(pat), F.lit(rep)).alias("seq"), "freq"
        )
        syms_after = int(
            cur.select(F.sum(F.col("freq") * F.size(syms_arr))).collect()[0][0]
        )
        merges.append(
            (
                step,
                b["left"],
                b["right"],
                int(b["pair_count"]),
                int(b["cl"]),
                int(b["cr"]),
                int(n_best),
                syms_after,
            )
        )
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, pair_count long,"
        " left_count long, right_count long, n_best long, syms_after long",
    )


def wordpiece_alphabet(
    word_freqs: DataFrame, top_chars: int = 20
) -> DataFrame:
    """Single-character pieces kept in the shipped vocabulary: the
    ``top_chars`` most frequent (freq-weighted, ties by char) of the
    working set.  A RANK cut, not an absolute count: it transfers
    unchanged across scale factors, and the excluded tail is how real
    WordPiece vocabularies force the ``[UNK]`` path for rare-script
    input."""
    return (
        word_freqs.select(
            F.explode(F.split(F.col("term"), "")).alias("piece"), "freq"
        )
        .filter(F.col("piece") != "")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(top_chars)
        .select("piece")
    )


def wordpiece_vocab(
    word_freqs: DataFrame,
    merge_table: DataFrame,
    top_chars: int = 20,
) -> list[str]:
    """The shipped vocabulary: filtered alphabet + one piece per merge
    (``left || right``), distinct.  Bounded by alphabet + n_merges —
    driver state by design, like the merge table itself."""
    alpha = [r["piece"] for r in wordpiece_alphabet(
        word_freqs, top_chars=top_chars).collect()]
    merged = [
        r["left"] + r["right"]
        for r in merge_table.select("left", "right").collect()
    ]
    return sorted(set(alpha) | set(merged))


def wordpiece_segment(
    df: DataFrame,
    vocab: list[str],
    max_word_len: int = 16,
    term_col: str = "term",
) -> DataFrame:
    """Greedy longest-match-first segmentation: adds ``wp_tokens``
    (``|``-joined, continuations ``##``-prefixed), ``n_wp`` and
    ``is_unk``.  Arrow-batched over whatever relation it is given —
    callers pass the DISTINCT-term working set and join back, so the
    scan cost is vocabulary-sized, not corpus-sized.

    ``n_wp`` is counted INSIDE the UDF, never parsed back out of the
    joined display string: ``|`` is printable ASCII, so a piece may
    legitimately contain it and a split-based count would overcount —
    the oracle's recursive walk carries its own counter, and this is
    its engine twin."""
    vocab_set = frozenset(vocab)
    max_piece = max((len(p) for p in vocab_set), default=1)

    def _seg_batch(batch: pd.Series) -> pd.DataFrame:
        toks_out: list[str] = []
        n_out: list[int] = []
        for term in batch:
            if term is None or len(term) > max_word_len:
                toks_out.append(UNK_TOKEN)
                n_out.append(1)
                continue
            toks: list[str] = []
            pos = 0
            n = len(term)
            while pos < n:
                for ln in range(min(max_piece, n - pos), 0, -1):
                    piece = term[pos : pos + ln]
                    if piece in vocab_set:
                        toks.append(("##" + piece) if pos else piece)
                        pos += ln
                        break
                else:
                    toks = [UNK_TOKEN]
                    break
            toks_out.append("|".join(toks) if toks else UNK_TOKEN)
            n_out.append(len(toks) if toks else 1)
        return pd.DataFrame({"toks": toks_out, "n": n_out})

    seg = F.pandas_udf(_seg_batch, "toks string, n long")
    return (
        df.withColumn("_wp", seg(F.col(term_col)))
        .withColumn("wp_tokens", F.col("_wp.toks"))
        .withColumn("n_wp", F.col("_wp.n"))
        .withColumn("is_unk", F.col("wp_tokens") == UNK_TOKEN)
        .drop("_wp")
    )
