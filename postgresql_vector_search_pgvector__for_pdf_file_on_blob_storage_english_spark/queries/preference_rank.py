# Pairwise-preference aggregation (round 8) — operators/preference.py.
# The match log is synthesized deterministically from `documents`
# (consecutive doc_ids compete; longer text wins, ties to the earlier
# doc) identically in Spark and the oracle, so the relation is
# bit-equal by construction; the 5 MM iterations are replayed in the
# oracle as chained CTEs in the same exact integer arithmetic.
# ==========================================================================
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
from ..operators.preference import UNIT, bt_strengths

_BT_ITERS = 5


def _synth_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One match per consecutive doc_id pair with distinct sources:
    the doc with more characters wins, ties to the lower doc_id."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    a = docs.select(
        F.col("doc_id").alias("_ida"),
        F.col("source").alias("_sa"),
        F.col("n_chars").alias("_na"),
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("_ida"),
        F.col("source").alias("_sb"),
        F.col("n_chars").alias("_nb"),
    )
    return (
        a.join(b, "_ida")
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.when(F.col("_na") >= F.col("_nb"), F.col("_sa"))
            .otherwise(F.col("_sb"))
            .alias("winner"),
            F.when(F.col("_na") >= F.col("_nb"), F.col("_sb"))
            .otherwise(F.col("_sa"))
            .alias("loser"),
        )
    )


def _pref_bt_source_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bt_strengths(_synth_matches(spark, sf_dir), n_iters=_BT_ITERS).select(
        F.col("player").alias("source"), "strength_units", "n_wins", "n_matches"
    )


def _dd_idiv(a: str, b: str) -> str:
    return f"CAST((({a}) - ({a}) % ({b})) / ({b}) AS BIGINT)"


def _dd_bt_sql(n_iters: int) -> str:
    u = UNIT
    head = f"""
WITH m AS MATERIALIZED (
  SELECT CASE WHEN a.n_chars >= b.n_chars THEN a.source ELSE b.source END AS winner,
         CASE WHEN a.n_chars >= b.n_chars THEN b.source ELSE a.source END AS loser
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.source != b.source
),
mat AS MATERIALIZED (
  SELECT least(winner, loser) AS lo, greatest(winner, loser) AS hi,
         count(*)::BIGINT AS n,
         sum(CASE WHEN winner = least(winner, loser) THEN 1 ELSE 0 END)::BIGINT AS w_lo
  FROM m GROUP BY 1, 2
),
players AS MATERIALIZED (
  SELECT player, sum(w)::BIGINT AS n_wins, sum(n)::BIGINT AS n_matches
  FROM (SELECT lo AS player, w_lo AS w, n FROM mat
        UNION ALL SELECT hi, n - w_lo, n FROM mat)
  GROUP BY player
),
sym AS MATERIALIZED (
  SELECT lo AS i, hi AS j, n FROM mat UNION ALL SELECT hi, lo, n FROM mat
),
p0 AS (SELECT player, {u}::BIGINT AS p FROM players),"""
    steps = []
    for k in range(1, n_iters + 1):
        term = _dd_idiv(f"s.n * {u * u}", "pi.p + pj.p")
        praw = _dd_idiv(f"pl.n_wins * {u * u}", "d.dd")
        pnorm = _dd_idiv(f"praw * {u}", "mx.mx")
        steps.append(f"""
d{k} AS (
  SELECT s.i AS player, sum({term}) AS dd
  FROM sym s
  JOIN p{k - 1} pi ON pi.player = s.i
  JOIN p{k - 1} pj ON pj.player = s.j
  GROUP BY s.i
),
r{k} AS (
  SELECT pl.player, {praw} AS praw
  FROM players pl JOIN d{k} d ON d.player = pl.player
),
p{k} AS (
  SELECT player, greatest({pnorm}, 1) AS p
  FROM r{k}, (SELECT max(praw) AS mx FROM r{k}) mx
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
SELECT pl.player AS source, p.p AS strength_units, pl.n_wins, pl.n_matches
FROM players pl JOIN p{n_iters} p ON p.player = pl.player
"""


_register(
    "pref_bt_source_strength", _pref_bt_source_strength, _dd_bt_sql(_BT_ITERS)
)


def _stream_bt_matrix_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BT maintenance through the gate: the match log arrives
    as 2 micro-batched files, each batch's bounded pair matrix appended
    batch_id-stamped, the drained log folded with per-batch dedup and
    the SAME MM iterations run on the folded matrix — cell-wise count
    addition is the exact merge law, so the oracle is identical to the
    one-shot batch entry."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ._base import _drain
    from ..operators.preference import bt_strengths_from_matrix
    from ..streaming.preference_stream import bt_matrix_read, stream_into_bt_matrix

    matches = _synth_matches(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_bt_{tag}_{os.getpid()}"
    )
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    split = F.crc32(F.concat_ws("|", "winner", "loser")) % 2
    matches.filter(split == 0).coalesce(1).write.parquet(f"{src}/f0")
    matches.filter(split == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(matches.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    _drain(stream_into_bt_matrix(stream, log, ckpt), 120)

    mat = bt_matrix_read(spark, log)
    return bt_strengths_from_matrix(mat, n_iters=_BT_ITERS).select(
        F.col("player").alias("source"), "strength_units", "n_wins", "n_matches"
    )


_register(
    "stream_bt_matrix_replay", _stream_bt_matrix_replay, _dd_bt_sql(_BT_ITERS)
)
