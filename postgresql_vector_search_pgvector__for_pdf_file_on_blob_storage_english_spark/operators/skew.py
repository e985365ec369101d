"""Skew-mitigation operators: salted aggregation and salted broadcast
join.

AQE's skew-join handling covers sort-merge joins; these cover the two
places it doesn't:

* ``salted_agg`` — a hot grouping key (one key = 30% of a 100 TB scan)
  overloads a single reducer.  Two-phase aggregation over (key, salt)
  spreads the hot key across ``salts`` reducers; the final combine
  touches ``salts`` rows per key.  Exact for any algebraic aggregate
  (sum/count/min/max — anything with a partial form).
* ``salted_broadcast_join`` — when the *probe* side of a broadcast
  join is so hot that one task's output explodes, replicating the
  broadcast side over a salt column splits the hot key's output across
  ``salts`` tasks.  Row-identical to the plain join.

Both are plan rewrites, not semantics changes — the registry holds
them to the same oracle as their unsalted forms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column or '*', fn) with fn in
    {count, sum, min, max}.  Phase 1 groups by (group_cols, salt) —
    partial results, hot keys spread; phase 2 combines partials by
    group_cols (count combines with sum).
    """
    combine = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salts)).alias("_salt")

    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            *[
                (F.count("*") if fn == "count" else getattr(F, fn)(col)).alias(out)
                for out, (col, fn) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            getattr(F, combine[fn])(out).alias(out)
            for out, (_col, fn) in aggs.items()
        ]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated across a salt dimension.

    ``big`` rows get a pseudorandom salt; ``small`` is exploded to
    (row, salt=0..salts-1) and broadcast; the join key becomes
    (on, salt).  Output rows identical to ``big.join(small, on)``.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>"))
    )
    out = salted_big.join(F.broadcast(salted_small), [on, "_salt"], how)
    return out.drop("_salt")
