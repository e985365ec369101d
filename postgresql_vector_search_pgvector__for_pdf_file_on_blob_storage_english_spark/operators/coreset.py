"""k-center greedy coreset selection (Gonzalez farthest-point).

The diversity-selection counterpart of the DSIR/prototypes picks in
this engine's data-selection family: iteratively select the point
FARTHEST from its nearest already-chosen center.  The classic 2-approx
for the k-center objective, and the "pick a maximally diverse seed
set" primitive of active learning / coreset construction over an
embedded corpus.

Determinism contract (cross-engine): distances are the engine-wide
sequential-fold l2^2 in double (functions/vector.py — bit-identical to
the DuckDB list_transform fold); the running min is a ``least`` chain
applied in selection order; each round's argmax orders by the
UNROUNDED distance with a vec_id tiebreak.  The seed is the minimum
vec_id (no RNG anywhere).

100 TB design: each of the k rounds is one full scan + one
TakeOrdered(1) — a map-side-reduced argmax, never a global sort — and
the only driver transfer is the k selected rows themselves (bounded
collect: one row per round, the audited model-artifact pattern).  Work
is O(k * n * d) with k model-sized; for k beyond tens, the scale path
is the standard two-level variant (per-partition k-center, then
k-center over the union of partition candidates), which composes from
this same operator applied per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import l2_distance_sq


def kcenter_greedy(emb: DataFrame, vec_col: str, id_col: str, k: int) -> DataFrame:
    """Select k diverse rows; returns a DataFrame of
    ``(sel_order, <id_col>, dist)`` where ``dist`` is the distance
    (sqrt of the maintained min-l2^2, rounded to 4) from the selected
    point to its nearest PRIOR center — NULL for the seed row.

    The result is materialized (the selection is inherently
    sequential); k must be >= 1 and <= the row count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = emb.sparkSession
    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    def lit_vec(xs) -> F.Column:
        return F.array(*[F.lit(float(x)) for x in xs])

    seed = base.orderBy("_id").limit(1).collect()
    if not seed:
        raise ValueError("empty input relation")
    picked = [(1, seed[0]["_id"], None)]
    # Already-selected ids are filtered OUT of the candidate pool each
    # round (ADVICE r10): with duplicate vectors (or k > distinct
    # vectors) every remaining min-distance can be exactly 0 and the
    # (mind desc, _id asc) tiebreak would otherwise re-select a chosen
    # point, returning duplicate coreset rows.
    cur = base.filter(F.col("_id") != F.lit(seed[0]["_id"])).withColumn(
        "_mind", l2_distance_sq("_v", lit_vec(seed[0]["_v"]))
    )
    for i in range(2, k + 1):
        got = (
            cur.orderBy(F.col("_mind").desc(), F.col("_id"))
            .limit(1)
            .collect()
        )
        if not got:
            raise ValueError(
                f"k={k} exceeds the number of distinct points ({i - 1} available)"
            )
        row = got[0]
        picked.append((i, row["_id"], row["_mind"]))
        if i < k:
            cur = cur.filter(F.col("_id") != F.lit(row["_id"])).withColumn(
                "_mind", F.least("_mind", l2_distance_sq("_v", lit_vec(row["_v"])))
            )
    out = spark.createDataFrame(
        [(o, int(i), float(m) if m is not None else None) for o, i, m in picked],
        "sel_order int, _id long, _mindsq double",
    )
    return out.select(
        "sel_order",
        F.col("_id").alias(id_col),
        F.round(F.sqrt("_mindsq"), 4).alias("dist"),
    )
