# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, SparkSession, _register, _t  # noqa: F401
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


def _dd_bpe_sql(n: int) -> str:
    # Every stage CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # s{i}'s four b{i} scalar subqueries would otherwise re-expand the
    # whole prefix chain — 4^n replays of the corpus scan.
    parts = [
        f"WITH {_DD_TOKENS},",
        "wf AS (SELECT term, count(*) AS freq FROM tokens GROUP BY term),",
        "s0 AS MATERIALIZED (SELECT array_to_string(list_transform(string_split(term, ''),"
        " c -> chr(30) || c || chr(31)), '') AS seq, freq FROM wf),",
    ]
    for i in range(1, n + 1):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT sy[j.j] AS l, sy[j.j + 1] AS r, sum(freq) AS cnt
  FROM (SELECT string_split(seq[2:length(seq)-1], chr(31) || chr(30)) AS sy, freq
        FROM s{i - 1}) t,
       unnest(range(1, len(sy))) AS j(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT replace(seq,
      chr(30) || (SELECT l FROM b{i}) || chr(31) || chr(30) || (SELECT r FROM b{i}) || chr(31),
      chr(30) || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || chr(31)) AS seq,
      freq
  FROM s{i - 1}
),""")
    body = "\n".join(parts).rstrip(",\n") + "\n"
    # the final s{n} CTE is written but unused; strip its trailing comma above
    union = "\nUNION ALL\n".join(
        f'SELECT {i} AS step, l AS "left", r AS "right", cnt AS pair_count FROM b{i}'
        for i in range(1, n + 1)
    )
    return f"{body}\n{union}\nORDER BY step"


_register("vocab_bpe_merges", _vocab_bpe_merges, _dd_bpe_sql(_N_BPE_MERGES))


# ==========================================================================
