"""Probabilistic record linkage — Fellegi & Sunter (1969).

The decision-theoretic framing every production matcher (Splink,
dedupe.io, census linkage) still uses: for a candidate pair, each
compared field contributes the log likelihood ratio of its agreement
state — ``ln(m/u)`` when the field agrees, ``ln((1-m)/(1-u))`` when it
disagrees — where ``m = P(agree | true match)`` and ``u = P(agree |
random non-match)``.  The pair's score is the sum; above-threshold
pairs are links.

Estimation here is the supervised variant: ``m`` comes from a labeled
truth sample (the entry weaves one deterministically; production uses
clerical labels or EM), and ``u`` from the value-frequency identity
``P(two random records agree on f) = sum_v (c_v / N)^2`` over the
clean side's distribution — both computed IN-PLAN as exact integer
ratios, then quantized to the engine's integer micro-nats
(``floor(ln(...)*1e6 + 0.5)`` of IEEE doubles both engines derive from
the same integers), so scores are int64 sums and bit-replayable.

Scale shape: u-statistics are per-field groupBy counts over the clean
side (map-side partial); m-statistics one keyed join over the bounded
truth sample; the per-field weight table is tiny and collected to
LITERALS (bounded by len(fields)), so pair scoring is a single codegen
projection over the blocked candidate join.  Blocking is the caller's
lever exactly as in the dedup family — candidates are quadratic only
within a block, and a pair that escapes a reasonable multi-pass block
is one whose fields all disagree, which the scorer would reject anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # integer micro-nat units (the engine-wide convention)


def fs_weights(
    clean: DataFrame,
    dirty: DataFrame,
    truth: DataFrame,
    fields: Sequence[str],
    id_col: str = "id",
    truth_clean_col: str = "clean_id",
    truth_dirty_col: str = "dirty_id",
) -> DataFrame:
    """Per-field agreement/disagreement weights ``(field, m_num, m_den,
    u_num, u_den, w_agree_micro, w_disagree_micro)``.

    ``truth`` is the labeled match sample (clean_id, dirty_id).  Raises
    on degenerate fields (m of 0 or 1, u of 0 or 1): a field that never
    disagrees on matches belongs in the block key, not the comparison
    vector, and ln(0) has no finite weight."""
    if not fields:
        raise ValueError("fs_weights needs at least one comparison field")
    n = clean.count()
    pairs = (
        truth.join(
            clean.select(
                F.col(id_col).alias(truth_clean_col),
                *[F.col(f).alias(f"_c_{f}") for f in fields],
            ),
            truth_clean_col,
        )
        .join(
            dirty.select(
                F.col(id_col).alias(truth_dirty_col),
                *[F.col(f).alias(f"_d_{f}") for f in fields],
            ),
            truth_dirty_col,
        )
    )
    m_row = pairs.agg(
        F.count(F.lit(1)).alias("m_den"),
        *[
            F.sum(
                (F.col(f"_c_{f}") == F.col(f"_d_{f}")).cast("long")
            ).alias(f"m_{f}")
            for f in fields
        ],
    ).collect()[0]
    m_den = m_row["m_den"]
    if m_den == 0:
        raise ValueError("fs_weights: empty truth sample")

    rows = []
    for f in fields:
        u_num = (
            clean.groupBy(f)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
            .collect()[0]["s"]
        )
        u_den = n * n
        m_num = m_row[f"m_{f}"]
        if not 0 < m_num < m_den:
            raise ValueError(
                f"fs_weights: field {f!r} has degenerate m={m_num}/{m_den}; "
                "an always/never-agreeing field cannot carry a finite weight "
                "(block on it instead)"
            )
        if not 0 < u_num < u_den:
            raise ValueError(f"fs_weights: field {f!r} has degenerate u")
        rows.append((f, m_num, m_den, u_num, u_den))

    spark = clean.sparkSession
    stats = spark.createDataFrame(
        rows, "field string, m_num long, m_den long, u_num long, u_den long"
    )
    w_agree = F.expr(
        f"CAST(floor((ln(CAST(m_num AS DOUBLE) / CAST(m_den AS DOUBLE))"
        f" - ln(CAST(u_num AS DOUBLE) / CAST(u_den AS DOUBLE)))"
        f" * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    w_disagree = F.expr(
        f"CAST(floor((ln(CAST(m_den - m_num AS DOUBLE) / CAST(m_den AS DOUBLE))"
        f" - ln(CAST(u_den - u_num AS DOUBLE) / CAST(u_den AS DOUBLE)))"
        f" * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    return stats.select(
        "field", "m_num", "m_den", "u_num", "u_den",
        w_agree.alias("w_agree_micro"),
        w_disagree.alias("w_disagree_micro"),
    )


def fs_score_pairs(
    clean: DataFrame,
    dirty: DataFrame,
    weights: DataFrame,
    fields: Sequence[str],
    block_col: str,
    id_col: str = "id",
) -> DataFrame:
    """Score every blocked candidate pair: ``(clean_id, dirty_id,
    score_micro)`` = sum over fields of the agreement-state weight.

    The weight table is collected to literals (bounded by
    ``len(fields)``), so the score is ONE codegen projection over the
    block-keyed join — no weight join at pair cardinality."""
    wmap = {
        r["field"]: (r["w_agree_micro"], r["w_disagree_micro"])
        for r in weights.collect()
    }
    missing = [f for f in fields if f not in wmap]
    if missing:
        raise ValueError(f"fs_score_pairs: no weights for fields {missing}")
    c = clean.select(
        F.col(id_col).alias("clean_id"),
        F.col(block_col).alias("_blk"),
        *[F.col(f).alias(f"_c_{f}") for f in fields],
    )
    d = dirty.select(
        F.col(id_col).alias("dirty_id"),
        F.col(block_col).alias("_blk"),
        *[F.col(f).alias(f"_d_{f}") for f in fields],
    )
    score = F.lit(0).cast("long")
    for f in fields:
        wa, wd = wmap[f]
        score = score + F.when(
            F.col(f"_c_{f}") == F.col(f"_d_{f}"), F.lit(wa).cast("long")
        ).otherwise(F.lit(wd).cast("long"))
    return c.join(d, "_blk").select(
        "clean_id", "dirty_id", score.alias("score_micro")
    )


# ==========================================================================
# Jaro-Winkler string similarity — the APPROXIMATE-agreement comparator
# the Fellegi-Sunter scorer above plugs in when exact field equality is
# too brittle (typos, token swaps).  Implemented as an Arrow-batched
# pandas UDF replicating the reference algorithm bit-for-bit (verified
# exactly equal to DuckDB's jaro_winkler_similarity on 4000 randomized
# cases in tests): Jaro with the max(l1,l2)/2 - 1 match window and
# sequential transposition count, then the Winkler boost
# j + p*0.1*(1-j) applied only when j > 0.7 with prefix p capped at 4.
# Empty strings score 0.0 (DuckDB convention), even against themselves.
# ==========================================================================


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Reference implementation (driver/UDF shared; pure python)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m2 = [False] * l2
    m1 = [False] * l1
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        j += p * 0.1 * (1 - j)
    return j


def jaro_winkler_col(a, b):
    """Column-level Jaro-Winkler via an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler_py(x or "", y or "") for x, y in zip(s1, s2)],
            dtype="float64",
        )

    return _jw(F.col(a) if isinstance(a, str) else a,
               F.col(b) if isinstance(b, str) else b)


def jw_blocked_pairs(
    names: DataFrame,
    name_col: str,
    block_col: str,
) -> DataFrame:
    """All within-block unordered pairs of DISTINCT name values scored
    with Jaro-Winkler.  ``names`` must already be the distinct-value
    relation (carry a count column alongside if row mass matters —
    the Ed-Join distinct-value discipline: candidate generation is
    quadratic only within a block and only over VALUES, never rows).

    Returns ``(name_a, name_b, jw)`` with name_a < name_b.
    """
    a = names.select(
        F.col(name_col).alias("name_a"), F.col(block_col).alias("_blk")
    )
    b = names.select(
        F.col(name_col).alias("name_b"), F.col(block_col).alias("_blk2")
    )
    pairs = a.join(
        b, (F.col("_blk") == F.col("_blk2")) & (F.col("name_a") < F.col("name_b"))
    ).select("name_a", "name_b")
    return pairs.withColumn("jw", jaro_winkler_col("name_a", "name_b"))
