# ==========================================================================
# Unigram-LM (SentencePiece-class) tokenizer training (round 7, VERDICT
# r6 #5) — operators/unigram.py.  Two EM rounds: substring-seeded vocab
# -> integer micro-nat costs -> Viterbi E-step -> usage-pruned vocab ->
# final segmentation.  The engine runs the linear-time DP over the
# distinct-word relation; the oracle replays the E-step by EXHAUSTIVE
# enumeration of all segmentations (a recursive CTE — bounded because
# the fixture working set is ~31 short ASCII words), so the DP is
# checked against the definition.  Both entries carry ``n_min_paths``:
# 1 everywhere at the fixtures, proving the tie-break is unexercised
# (the r6 BPE argmax lesson); ln() rounding sits far from every floor
# boundary (margin-gated in tests/test_unigram.py).
# ==========================================================================
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
from .retrieval import _DD_TOKENS  # noqa: F401

_UNI_MAXLEN = 4
_UNI_TOP_MULTI = 24
_UNI_KEEP_MULTI = 12


def _uni_train(spark: SparkSession, sf_dir: str):
    from ..operators.unigram import unigram_train

    docs = _t(spark, sf_dir, "documents")
    return unigram_train(
        docs,
        max_piece_len=_UNI_MAXLEN,
        top_multi=_UNI_TOP_MULTI,
        keep_multi=_UNI_KEEP_MULTI,
    )


def _vocab_unigram_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-round piece-usage table — the trained unigram vocabulary
    with its freq-weighted usage counts."""
    _, _, uses2 = _uni_train(spark, sf_dir)
    return uses2.select(
        "piece",
        F.length("piece").alias("piece_len"),
        F.col("uses").alias("n_uses"),
    ).orderBy(F.col("n_uses").desc(), "piece")


def _vocab_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-round Viterbi segmentation of every working-set term:
    (term, pieces, total integer cost, number of minimal-cost paths —
    the tie cross-check, 1 everywhere at the fixtures)."""
    _, seg2, _ = _uni_train(spark, sf_dir)
    return seg2.select(
        "term",
        F.replace(
            F.expr("substring(pieces, 2, length(pieces) - 1)"),
            F.lit("\x1e"),
            F.lit("|"),
        ).alias("pieces"),
        F.col("cost").alias("cost_micro"),
        "n_min_paths",
    ).orderBy("term")


def _round_ctes(i: int, cost_cte: str) -> str:
    """One EM round's oracle stages: exhaustive segmentation
    enumeration (recursive), per-term min-cost winner with tie count,
    freq-weighted piece uses.  Every non-recursive stage is
    MATERIALIZED (plain DuckDB CTEs inline — the r6 BPE lesson)."""
    return f"""seg{i} AS (
  SELECT term, freq, 0 AS pos, CAST('' AS VARCHAR) AS pieces, CAST(0 AS BIGINT) AS cost
  FROM wf
  UNION ALL
  SELECT s.term, s.freq, s.pos + length(v.piece),
         s.pieces || chr(30) || v.piece, s.cost + v.cost
  FROM seg{i} s JOIN {cost_cte} v
    ON substring(s.term, s.pos + 1, length(v.piece)) = v.piece
  WHERE s.pos < length(s.term)
),
done{i} AS MATERIALIZED (
  SELECT term, freq, pieces, cost FROM seg{i} WHERE pos = length(term)
),
mn{i} AS MATERIALIZED (SELECT term, min(cost) AS mc FROM done{i} GROUP BY term),
best{i} AS MATERIALIZED (
  SELECT d.term, d.freq, min(d.pieces) AS pieces, m.mc AS cost,
         count(*)::BIGINT AS n_min
  FROM done{i} d JOIN mn{i} m ON d.term = m.term AND d.cost = m.mc
  GROUP BY d.term, d.freq, m.mc
),
u{i} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS uses
  FROM (SELECT freq,
               unnest(string_split(substring(pieces, 2, length(pieces) - 1), chr(30))) AS piece
        FROM best{i})
  GROUP BY piece
),"""


def _dd_unigram_head() -> str:
    # cost formula: EXACTLY floor(-ln(cnt/total) * 1e6 + 0.5), the
    # expression costs_from_counts computes driver-side with math.log.
    cost = (
        "CAST(floor(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) "
        "* 1000000.0 + 0.5) AS BIGINT)"
    )
    return f"""WITH RECURSIVE {_DD_TOKENS},
wf AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS freq FROM tokens
  WHERE regexp_matches(term, '^[!-~]+$') GROUP BY term
),
subs AS MATERIALIZED (
  -- substring starts derived from each term's own length (no hard cap
  -- — the Spark side enumerates the full length too, ADVICE r7); the
  -- piece-length bound _UNI_MAXLEN is a genuine shared hyperparameter
  SELECT substring(term, s, l.l) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT term, freq, unnest(generate_series(1, length(term))) AS s
        FROM wf)
  CROSS JOIN range(1, {_UNI_MAXLEN + 1}) l(l)
  WHERE s + l.l - 1 <= length(term)
  GROUP BY 1
),
chars1 AS MATERIALIZED (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
v1 AS MATERIALIZED (
  SELECT piece, cnt FROM chars1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE length(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {_UNI_TOP_MULTI})
),
t1 AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v1),
c1 AS MATERIALIZED (SELECT piece, {cost} AS cost FROM v1, t1),
{_round_ctes(1, "c1")}
v2 AS MATERIALIZED (
  SELECT c.piece, CAST(coalesce(u.uses, 0) + 1 AS BIGINT) AS cnt
  FROM chars1 c LEFT JOIN u1 u ON u.piece = c.piece
  UNION ALL
  SELECT piece, uses AS cnt FROM (
    SELECT piece, uses FROM u1 WHERE length(piece) > 1
    ORDER BY uses DESC, piece LIMIT {_UNI_KEEP_MULTI})
),
t2 AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v2),
c2 AS MATERIALIZED (SELECT piece, {cost} AS cost FROM v2, t2),
{_round_ctes(2, "c2")}"""


_DD_UNI_PIECES = (
    _dd_unigram_head().rstrip(",\n")
    + """
SELECT piece, CAST(length(piece) AS INTEGER) AS piece_len, uses AS n_uses
FROM u2
ORDER BY n_uses DESC, piece
"""
)

_DD_UNI_SEGMENT = (
    _dd_unigram_head().rstrip(",\n")
    + """
SELECT term,
       replace(substring(pieces, 2, length(pieces) - 1), chr(30), '|') AS pieces,
       cost AS cost_micro, n_min AS n_min_paths
FROM best2
ORDER BY term
"""
)

_register("vocab_unigram_pieces", _vocab_unigram_pieces, _DD_UNI_PIECES)
_register("vocab_unigram_segment", _vocab_unigram_segment, _DD_UNI_SEGMENT)


# --------------------------------------------------------------------------
# Unigram fertility audit: pieces-per-word by language — directly
# comparable to vocab_bpe_fertility_by_lang, so the two trained
# tokenizers can be ranked per language on the same number.  The
# segmentation runs once over the DISTINCT-term working set; the
# per-language weighting is one (lang, term) aggregate joined back.
# --------------------------------------------------------------------------


def _vocab_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents")
    _, seg2, _ = _uni_train(spark, sf_dir)
    seg = seg2.select(
        "term",
        F.size(
            F.split(F.expr("substring(pieces, 2, length(pieces) - 1)"), "\x1e")
        ).alias("n_pieces"),
    )
    lt = (
        tokenize(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        lt.join(seg, "term")
        .groupBy("lang")
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_pieces")).alias("uni_tokens_total"),
            F.round(
                F.sum(F.col("freq") * F.col("n_pieces")).cast("double")
                / F.sum("freq"),
                4,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


_DD_UNI_FERTILITY = (
    _dd_unigram_head()
    + """
fert AS MATERIALIZED (
  SELECT term,
         len(string_split(substring(pieces, 2, length(pieces) - 1), chr(30))) AS n_pieces
  FROM best2
),
lt AS MATERIALIZED (
  SELECT d.lang, k.term, count(*) AS freq
  FROM tokens k JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang,
       sum(freq)::BIGINT AS n_words,
       sum(freq * n_pieces)::BIGINT AS uni_tokens_total,
       round(sum(freq * n_pieces) / sum(freq), 4) AS fertility
FROM lt JOIN fert USING (term)
GROUP BY lang
ORDER BY lang
"""
)

_register(
    "vocab_unigram_fertility",
    _vocab_unigram_fertility,
    _DD_UNI_FERTILITY,
)
