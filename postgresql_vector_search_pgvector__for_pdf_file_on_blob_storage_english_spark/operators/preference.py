"""Pairwise-preference aggregation: Bradley-Terry strengths in
fixed-point integer arithmetic.

RLHF-style training data arrives as PAIRWISE preferences (human or
judge picks a winner between two completions/models/sources); the
training pipeline needs per-player strength scores — for filtering
low-quality sources, weighting mixtures, or building reward-model
targets.  The Bradley-Terry model (Bradley & Terry 1952) posits
``P(i beats j) = p_i / (p_i + p_j)`` and the classic MM estimator
(Hunter 2004, "MM algorithms for generalized Bradley-Terry models")
iterates

    p_i  <-  w_i / sum_j ( n_ij / (p_i + p_j) )

where ``w_i`` = player i's total wins and ``n_ij`` = matches between
i and j.

Scale shape: the raw match log (data-proportional — one row per
comparison) is aggregated ONCE into the bounded pair matrix
``(lo, hi, n, w_lo)`` — players x players rows at most, map-side
combinable.  Every MM iteration then runs over that bounded matrix
plus the |players| strength relation: joins and aggregates whose size
is independent of the corpus row count, exactly the
``graph.py::pagerank`` shape with |V| = players.

**Fixed-point arithmetic is the determinism contract** (same as
PageRank): strengths are BIGINT micro-units (UNIT = 1e6), every
division is the exact integer floor ``(x - x % y) / y``, and every
aggregate is a sum of longs — order-free, so results are bit-identical
across partitionings and engines.  Each iteration max-normalizes
(the leader pinned at exactly UNIT; Bradley-Terry is scale-invariant)
which also bounds every intermediate: ``p <= UNIT`` keeps
``n * UNIT^2 / (p_i + p_j)`` and ``w * UNIT^2`` well inside BIGINT
for corpus-scale match counts.  Zero-win players floor at 1 unit so
no denominator can vanish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import _idiv

UNIT = 1_000_000  # 1.0 of strength, in micro-units


def match_matrix(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Match log -> the bounded unordered pair matrix
    ``(lo, hi, n, w_lo)``: ``n`` comparisons between the pair, ``w_lo``
    won by the lexically smaller player.  This is the MERGEABLE summary
    (counts add cell-wise), so partial matrices from shards or
    micro-batches fold by plain summation — the streaming maintenance
    law ``streaming/preference_stream.py`` relies on.

    A ``winner == loser`` (or null-player) row is rejected IN-PLAN
    (ADVICE r8): a degenerate (x, x) pair would double-count x's
    matches in :func:`bt_strengths_from_matrix` (the sym union emits
    the pair twice) and silently skew every strength — mirror
    ``connected_components``' u != v guard, but loudly, since a match
    log with self-matches is corrupt input, not filterable noise."""
    w = F.col(winner_col)
    l = F.col(loser_col)  # noqa: E741
    ok = w.isNotNull() & l.isNotNull() & (w != l)
    lo = F.when(ok, F.least(w, l)).otherwise(
        F.raise_error(
            F.lit(
                "match_matrix: degenerate match row (winner == loser, or a "
                "null player) — a self-match would double-count in the MM "
                "denominator; clean the match log"
            )
        )
    )
    hi = F.greatest(w, l)
    return (
        matches.select(
            lo.alias("lo"),
            hi.alias("hi"),
            (w == lo).cast("long").alias("_wlo"),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_wlo").alias("w_lo"))
    )


def bt_strengths(
    matches: DataFrame,
    n_iters: int = 5,
    winner_col: str = "winner",
    loser_col: str = "loser",
    materialize: bool = True,
) -> DataFrame:
    """Bradley-Terry strengths from a match log.

    ``matches``: one row per comparison, ``winner_col``/``loser_col``
    naming the two players.  Returns ``(player, strength_units BIGINT,
    n_wins BIGINT, n_matches BIGINT)`` — ``strength_units`` in
    micro-units with the strongest player at exactly ``UNIT``.

    ``materialize`` localCheckpoints the bounded pair matrix once so
    the MM iterations re-read it from executor storage instead of
    re-aggregating the full match log per iteration (the
    iterative-lineage truncation every fixed-point operator here uses).
    """
    return bt_strengths_from_matrix(
        match_matrix(matches, winner_col, loser_col),
        n_iters=n_iters,
        materialize=materialize,
    )


def bt_strengths_from_matrix(
    mat: DataFrame,
    n_iters: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """The MM iterations over a prebuilt ``(lo, hi, n, w_lo)`` matrix —
    the entry point for matrices folded from a streaming log
    (:func:`..streaming.preference_stream.bt_matrix_read`)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if materialize:
        mat = mat.localCheckpoint(eager=True)
    players = (
        mat.select(F.col("lo").alias("player"), F.col("w_lo").alias("_w"), "n")
        .unionAll(
            mat.select(
                F.col("hi").alias("player"),
                (F.col("n") - F.col("w_lo")).alias("_w"),
                "n",
            )
        )
        .groupBy("player")
        .agg(F.sum("_w").alias("n_wins"), F.sum("n").alias("n_matches"))
    )
    if materialize:
        players = players.localCheckpoint(eager=True)
    sym = mat.select(F.col("lo").alias("i"), F.col("hi").alias("j"), "n").unionAll(
        mat.select(F.col("hi").alias("i"), F.col("lo").alias("j"), "n")
    )

    p = players.select("player", F.lit(UNIT).cast("long").alias("p"))
    for _ in range(n_iters):
        if materialize:
            # Each iteration reads p TWICE (both sides of the pair
            # join); without truncation the lineage doubles per step —
            # 2^n_iters recomputation.  The relation is |players| rows,
            # so the eager checkpoint is a tiny job.
            p = p.localCheckpoint(eager=True)
        d = (
            sym.join(
                p.select(F.col("player").alias("i"), F.col("p").alias("_pi")), "i"
            )
            .join(
                p.select(F.col("player").alias("j"), F.col("p").alias("_pj")), "j"
            )
            .select(
                F.col("i").alias("player"),
                _idiv(
                    F.col("n") * F.lit(UNIT) * F.lit(UNIT),
                    F.col("_pi") + F.col("_pj"),
                ).alias("_t"),
            )
            .groupBy("player")
            .agg(F.sum("_t").alias("_d"))
        )
        raw = players.join(d, "player").select(
            "player",
            _idiv(F.col("n_wins") * F.lit(UNIT) * F.lit(UNIT), F.col("_d")).alias(
                "_praw"
            ),
        )
        mx = raw.agg(F.max("_praw").alias("_mx"))
        p = raw.crossJoin(F.broadcast(mx)).select(
            "player",
            F.greatest(
                _idiv(F.col("_praw") * F.lit(UNIT), F.col("_mx")), F.lit(1).cast("long")
            ).alias("p"),
        )
    return players.join(p, "player").select(
        "player",
        F.col("p").alias("strength_units"),
        "n_wins",
        "n_matches",
    )
