# ==========================================================================
# WordPiece tokenizer (round 8) — operators/wordpiece.py.  Completes the
# trained-tokenizer triad: BPE (merge argmax = raw pair count), unigram-LM
# (Viterbi over piece costs), WordPiece (merge argmax = likelihood score
# pair/(left*right); inference = greedy longest-match-first).  The oracle
# replays training as unrolled CTE stages sharing the round-7 BPE
# delimited-symbol machinery, and replays greedy matching as a
# best-match-at-position table (a plain argmax-by-length aggregate —
# unique per position, since equal-length matches at one offset are the
# same substring) followed by a recursive chain-follow: each term walks
# its single deterministic successor path, so the recursion is linear,
# not enumerative.  Determinism: the score is ONE IEEE division of exact
# integers (< 2^53) — bit-identical doubles on both engines — and the
# merge table carries n_best (max-score tie count, 1 at every fixture)
# plus the BPE syms_after segmentation cross-check.
# ==========================================================================
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
from .retrieval import _DD_TOKENS  # noqa: F401

_N_WP_MERGES = 6
_WP_TOP_CHARS = 20
_WP_MAX_WORD_LEN = 16


def _dd_wp_chain(n: int) -> str:
    # Every stage MATERIALIZED (plain DuckDB CTEs inline — the r6 BPE
    # lesson: b{i}'s scalar subqueries would re-expand the whole prefix
    # chain exponentially otherwise).
    parts = [
        f"WITH RECURSIVE {_DD_TOKENS},",
        "wf AS MATERIALIZED (SELECT term, count(*)::BIGINT AS freq FROM tokens"
        " WHERE regexp_matches(term, '^[!-~]+$') GROUP BY term),",
        "s0 AS MATERIALIZED (SELECT term,"
        " regexp_replace(term, '(.)', chr(30) || '\\1' || chr(31), 'g') AS seq,"
        " freq FROM wf),",
    ]
    for i in range(1, n + 1):
        parts.append(f"""y{i} AS MATERIALIZED (
  SELECT sym, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(substring(seq, 2, length(seq) - 2), chr(31) || chr(30))) AS sym,
               freq
        FROM s{i - 1})
  GROUP BY sym
),
p{i} AS MATERIALIZED (
  SELECT sy[j.j] AS l, sy[j.j + 1] AS r, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT string_split(substring(seq, 2, length(seq) - 2), chr(31) || chr(30)) AS sy, freq
        FROM s{i - 1}) t,
       unnest(range(1, len(sy))) AS j(j)
  GROUP BY 1, 2
),
sc{i} AS MATERIALIZED (
  SELECT p.l, p.r, p.pair_count, yl.cnt AS cl, yr.cnt AS cr,
         CAST(p.pair_count AS DOUBLE) / CAST(yl.cnt * yr.cnt AS DOUBLE) AS score
  FROM p{i} p JOIN y{i} yl ON yl.sym = p.l JOIN y{i} yr ON yr.sym = p.r
),
b{i} AS MATERIALIZED (SELECT * FROM sc{i} ORDER BY score DESC, l, r LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT term, replace(seq,
      chr(30) || (SELECT l FROM b{i}) || chr(31) || chr(30) || (SELECT r FROM b{i}) || chr(31),
      chr(30) || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || chr(31)) AS seq,
      freq
  FROM s{i - 1}
),""")
    return "\n".join(parts).rstrip(",\n") + "\n"


def _vocab_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.wordpiece import wordpiece_learn_merges

    docs = _t(spark, sf_dir, "documents")
    return wordpiece_learn_merges(docs, n_merges=_N_WP_MERGES)


def _dd_wp_merges_sql(n: int) -> str:
    union = "\nUNION ALL\n".join(
        f'SELECT {i} AS step, l AS "left", r AS "right", pair_count,'
        f" cl AS left_count, cr AS right_count,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM sc{i}"
        f"  WHERE score = (SELECT score FROM b{i})) AS n_best,"
        f" (SELECT CAST(sum(freq * len(string_split(substring(seq, 2, length(seq) - 2),"
        f" chr(31) || chr(30)))) AS BIGINT) FROM s{i}) AS syms_after FROM b{i}"
        for i in range(1, n + 1)
    )
    return f"{_dd_wp_chain(n)}\n{union}\nORDER BY step"


_register(
    "vocab_wordpiece_merges", _vocab_wordpiece_merges, _dd_wp_merges_sql(_N_WP_MERGES)
)


# --------------------------------------------------------------------------
# Inference: greedy longest-match-first over the shipped vocabulary
# (filtered alphabet + merged pieces).  The per-term chain-follow oracle
# and the [UNK] contract (no match at some offset, or word longer than
# _WP_MAX_WORD_LEN) are described in the module header; non-vacuity of
# both UNK causes at the fixtures is test-gated (tests/test_wordpiece.py).
# --------------------------------------------------------------------------


def _dd_wp_vocab_ctes(n: int) -> str:
    merged_union = "\nUNION ALL\n".join(
        f"SELECT l || r AS piece FROM b{i}" for i in range(1, n + 1)
    )
    return f"""cc AS MATERIALIZED (
  SELECT c AS piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(term, '')) AS c, freq FROM wf)
  GROUP BY c
),
vocabw AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT piece FROM (SELECT piece FROM cc ORDER BY cnt DESC, piece LIMIT {_WP_TOP_CHARS})
    UNION ALL
    {merged_union}
  )
),
bm AS MATERIALIZED (
  SELECT t.term, t.s AS pos, max(length(v.piece)) AS ml
  FROM (SELECT term, unnest(generate_series(1, length(term))) AS s
        FROM wf WHERE length(term) <= {_WP_MAX_WORD_LEN}) t
  JOIN vocabw v ON substring(t.term, t.s, length(v.piece)) = v.piece
  GROUP BY t.term, t.s
),
walk AS (
  SELECT term, 1 AS pos, CAST('' AS VARCHAR) AS toks, CAST(0 AS BIGINT) AS n
  FROM wf WHERE length(term) <= {_WP_MAX_WORD_LEN}
  UNION ALL
  SELECT w.term, w.pos + b.ml,
         w.toks || chr(30) ||
           (CASE WHEN w.pos > 1 THEN '##' ELSE '' END) ||
           substring(w.term, w.pos, b.ml),
         w.n + 1
  FROM walk w JOIN bm b ON b.term = w.term AND b.pos = w.pos
),
donew AS MATERIALIZED (
  SELECT term, toks, n FROM walk WHERE pos = length(term) + 1
),
segw AS MATERIALIZED (
  SELECT wf.term,
         CASE WHEN d.term IS NULL THEN '[UNK]'
              ELSE replace(substring(d.toks, 2, length(d.toks) - 1), chr(30), '|')
         END AS wp_tokens,
         CAST(coalesce(d.n, 1) AS BIGINT) AS n_wp,
         d.term IS NULL AS is_unk
  FROM wf LEFT JOIN donew d USING (term)
)"""


def _wp_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_word_freqs
    from ..operators.wordpiece import (
        wordpiece_learn_merges,
        wordpiece_segment,
        wordpiece_vocab,
    )

    docs = _t(spark, sf_dir, "documents")
    # one corpus pass, materialized: merges + alphabet + segment input
    # all consume this bounded distinct-term relation
    wf = bpe_word_freqs(docs).localCheckpoint(eager=True)
    merges = wordpiece_learn_merges(
        docs, n_merges=_N_WP_MERGES, word_freqs=wf
    )
    vocab = wordpiece_vocab(wf, merges, top_chars=_WP_TOP_CHARS)
    return wordpiece_segment(
        wf.select("term"), vocab, max_word_len=_WP_MAX_WORD_LEN
    )


def _vocab_wordpiece_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wp_segmented(spark, sf_dir).select(
        "term", "wp_tokens", "n_wp", "is_unk"
    ).orderBy("term")


_DD_WP_SEGMENT = (
    _dd_wp_chain(_N_WP_MERGES)
    + ",\n"
    + _dd_wp_vocab_ctes(_N_WP_MERGES)
    + """
SELECT term, wp_tokens, n_wp, is_unk
FROM segw
ORDER BY term
"""
)

_register("vocab_wordpiece_segment", _vocab_wordpiece_segment, _DD_WP_SEGMENT)


# --------------------------------------------------------------------------
# Fertility audit: wp-tokens-per-word by language, directly comparable
# to vocab_bpe_fertility_by_lang and vocab_unigram_fertility — the
# three trained tokenizers ranked per language on one number.  Plus
# n_unk_words, the WordPiece-specific coverage signal the other two
# cannot produce (BPE/unigram always segment down to characters).
# --------------------------------------------------------------------------


def _vocab_wordpiece_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents")
    seg = _wp_segmented(spark, sf_dir).select("term", "n_wp", "is_unk")
    lt = (
        tokenize(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("term").rlike("^[!-~]+$"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        lt.join(seg, "term")
        .groupBy("lang")
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_wp")).alias("wp_tokens_total"),
            F.round(
                F.sum(F.col("freq") * F.col("n_wp")).cast("double")
                / F.sum("freq"),
                4,
            ).alias("fertility"),
            F.sum(F.when(F.col("is_unk"), F.col("freq")).otherwise(F.lit(0)))
            .alias("n_unk_words"),
        )
        .orderBy("lang")
    )


_DD_WP_FERTILITY = (
    _dd_wp_chain(_N_WP_MERGES)
    + ",\n"
    + _dd_wp_vocab_ctes(_N_WP_MERGES)
    + """,
lt AS MATERIALIZED (
  SELECT d.lang, k.term, count(*) AS freq
  FROM tokens k JOIN documents d USING (doc_id)
  WHERE regexp_matches(k.term, '^[!-~]+$')
  GROUP BY 1, 2
)
SELECT lang,
       CAST(sum(freq) AS BIGINT) AS n_words,
       CAST(sum(freq * n_wp) AS BIGINT) AS wp_tokens_total,
       round(sum(freq * n_wp) / sum(freq), 4) AS fertility,
       CAST(sum(CASE WHEN is_unk THEN freq ELSE 0 END) AS BIGINT) AS n_unk_words
FROM lt JOIN segw USING (term)
GROUP BY lang
ORDER BY lang
"""
)

_register(
    "vocab_wordpiece_fertility",
    _vocab_wordpiece_fertility,
    _DD_WP_FERTILITY,
)
