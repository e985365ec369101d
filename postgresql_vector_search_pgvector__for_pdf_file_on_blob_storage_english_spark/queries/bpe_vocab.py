# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
from .retrieval import _DD_TOKENS  # noqa: F401
# Distributed BPE tokenizer-vocabulary training (round 6, VERDICT r5 #7)
# — operators/bpe.py.  One corpus pass builds (word, freq); each merge
# iteration runs over the distinct-word relation and broadcasts the
# winning pair back as a literal replace.  The oracle replays the SAME
# deterministic loop as {n} unrolled CTE stages: both engines share the
# leftmost-non-overlapping replace() scan over the \x1e/\x1f-delimited
# symbol strings (== canonical greedy BPE application; operators/bpe.py
# module docstring), so the merge tables are bit-identical.
# ==========================================================================

_N_BPE_MERGES = 6


def _vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, n_merges=_N_BPE_MERGES)


def _dd_bpe_chain(n: int) -> str:
    # Every stage CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # s{i}'s four b{i} scalar subqueries would otherwise re-expand the
    # whole prefix chain — 4^n replays of the corpus scan.  Shared by
    # the training oracle (reads b1..bn), the encode oracle (reads the
    # final segmented relation s{n}), and the fertility oracle (which
    # needs the carried-through ``term`` to join back to languages).
    #
    # Round-7 cross-engine pinning (operators/bpe.py module docstring):
    # the working set is printable-ASCII terms only, the per-char wrap
    # is a version-stable RE2 regexp_replace (no string_split(term,'')
    # grapheme-vs-codepoint ambiguity), and bracket slicing seq[2:..]
    # is replaced by substring(), which matches Spark exactly.
    parts = [
        f"WITH {_DD_TOKENS},",
        "wf AS (SELECT term, count(*) AS freq FROM tokens"
        " WHERE regexp_matches(term, '^[!-~]+$') GROUP BY term),",
        "s0 AS MATERIALIZED (SELECT term,"
        " regexp_replace(term, '(.)', chr(30) || '\\1' || chr(31), 'g') AS seq,"
        " freq FROM wf),",
    ]
    for i in range(1, n + 1):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT sy[j.j] AS l, sy[j.j + 1] AS r, sum(freq) AS cnt
  FROM (SELECT string_split(substring(seq, 2, length(seq) - 2), chr(31) || chr(30)) AS sy, freq
        FROM s{i - 1}) t,
       unnest(range(1, len(sy))) AS j(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT term, replace(seq,
      chr(30) || (SELECT l FROM b{i}) || chr(31) || chr(30) || (SELECT r FROM b{i}) || chr(31),
      chr(30) || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || chr(31)) AS seq,
      freq
  FROM s{i - 1}
),""")
    return "\n".join(parts).rstrip(",\n") + "\n"


def _dd_bpe_sql(n: int) -> str:
    # Final projection casts EVERY aggregate to BIGINT: the r6 driver
    # flake was this entry's pair_count reaching the driver as DuckDB
    # HUGEINT (arrow decimal128) — see operators/bpe.py docstring.
    # syms_after is the per-step segmentation cross-check.
    union = "\nUNION ALL\n".join(
        f'SELECT {i} AS step, l AS "left", r AS "right",'
        f" CAST(cnt AS BIGINT) AS pair_count,"
        f" (SELECT CAST(sum(freq * len(string_split(substring(seq, 2, length(seq) - 2),"
        f" chr(31) || chr(30)))) AS BIGINT) FROM s{i}) AS syms_after FROM b{i}"
        for i in range(1, n + 1)
    )
    return f"{_dd_bpe_chain(n)}\n{union}\nORDER BY step"


_register("vocab_bpe_merges", _vocab_bpe_merges, _dd_bpe_sql(_N_BPE_MERGES))


# --------------------------------------------------------------------------
# The tokenizer INFERENCE path: apply the learned merge table back to the
# corpus vocabulary (operators/bpe.py::bpe_segment — a pure codegen chain
# of literal replaces, zero shuffle) and report the resulting token
# distribution.  The merge-table collect is bounded by n_merges (driver
# state by design: the merge table IS the tokenizer artifact); the
# segmentation itself never leaves the executors.  Oracle = the same
# unrolled chain, reading the FINAL segmented relation s{n}.
# --------------------------------------------------------------------------

_N_BPE_TOP = 20


def _vocab_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_learn_merges, bpe_segment, bpe_word_freqs

    docs = _t(spark, sf_dir, "documents")
    wf = bpe_word_freqs(docs)
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn_merges(docs, n_merges=_N_BPE_MERGES, word_freqs=wf)
            .orderBy("step")
            .collect()
    ]
    seg = bpe_segment(wf, merges)
    return (
        seg.select(F.explode("bpe_tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), "token")
        .limit(_N_BPE_TOP)
    )


def _dd_bpe_encode_sql(n: int, top: int) -> str:
    return f"""{_dd_bpe_chain(n)},
final AS MATERIALIZED (
  SELECT unnest(string_split(substring(seq, 2, length(seq) - 2), chr(31) || chr(30))) AS token,
         freq
  FROM s{n}
)
SELECT token, CAST(sum(freq) AS BIGINT) AS occurrences
FROM final
GROUP BY token
ORDER BY occurrences DESC, token
LIMIT {top}
"""


_register(
    "vocab_bpe_encode", _vocab_bpe_encode, _dd_bpe_encode_sql(_N_BPE_MERGES, _N_BPE_TOP)
)


# ==========================================================================


# --------------------------------------------------------------------------
# Tokenizer FERTILITY audit: bpe-tokens-per-word by language — the
# number a multilingual pipeline watches to see which languages the
# trained vocabulary serves poorly (high fertility = more tokens per
# word = more compute per byte of that language).  Segmentation runs
# once over the DISTINCT-term working set (the tokenizer vocabulary,
# not the corpus); the per-language weighting is one (lang, term)
# aggregate joined back — shuffle is vocabulary-sized on both sides.
# --------------------------------------------------------------------------


def _vocab_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_learn_merges, bpe_segment, bpe_word_freqs
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents")
    wf = bpe_word_freqs(docs)
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn_merges(docs, n_merges=_N_BPE_MERGES, word_freqs=wf)
            .orderBy("step")
            .collect()
    ]
    seg = bpe_segment(wf.select("term"), merges).select(
        "term", F.size("bpe_tokens").alias("n_bpe")
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
            F.sum(F.col("freq") * F.col("n_bpe")).alias("bpe_tokens_total"),
            F.round(
                F.sum(F.col("freq") * F.col("n_bpe")).cast("double")
                / F.sum("freq"),
                4,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def _dd_bpe_fertility_sql(n: int) -> str:
    return f"""{_dd_bpe_chain(n)},
fert AS (
  SELECT term,
         len(string_split(substring(seq, 2, length(seq) - 2), chr(31) || chr(30))) AS n_bpe
  FROM s{n}
),
lt AS (
  SELECT d.lang, k.term, count(*) AS freq
  FROM tokens k JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang,
       sum(freq)::BIGINT AS n_words,
       sum(freq * n_bpe)::BIGINT AS bpe_tokens_total,
       round(sum(freq * n_bpe) / sum(freq), 4) AS fertility
FROM lt JOIN fert USING (term)
GROUP BY lang
ORDER BY lang
"""


_register(
    "vocab_bpe_fertility_by_lang",
    _vocab_bpe_fertility,
    _dd_bpe_fertility_sql(_N_BPE_MERGES),
)
