"""Count-min sketch: fixed-size frequency summaries for unbounded key
domains (Cormode & Muthukrishnan 2005, public algorithm).

The 100 TB use case: estimating per-key frequencies (terms, hosts,
user ids) where the exact groupBy's distinct-key shuffle is itself the
bottleneck or the summary must be tiny/mergeable (cross-day unioning of
sketches is cell-wise addition).  The sketch is a d x w integer matrix;
key k increments cell (i, h_i(k) mod w) for each of d independent
hashes, and the point estimate is the MINIMUM over the d cells — an
OVERESTIMATE with error <= 2N/w at probability 1 - 2^-d, never an
underestimate.

Determinism contract: hashes are the engine-wide stable md5 convention
(``'cm<i>' || '§' || key``), counts are longs — the whole sketch and
every estimate is bit-identical across engines and partitionings, so
the operator is hash-gateable (no engine-specific `hash()`).

Scale shape: building = one map-side-combined groupBy keyed on the
(row, col) CELL — shuffle bounded by d*w cells, NOT by distinct keys
(the whole point); estimating joins probes against the broadcast
d*w-bounded cell table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_hash(key: Column, row: int, width: int) -> Column:
    """Stable hash of ``key`` for sketch row ``row``, in [0, width)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit(f"cm{row}"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` for every non-zero cell
    (absent cell == 0).  One explode of d (row, col) pairs per input
    row, then a partial-aggregated groupBy over at most d*w cells."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth >= 1 and width >= 1, got {depth}, {width}")
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cm_hash(key, i, width).alias("col")
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("c"))
        .groupBy("c.row", "c.col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    est_col: str = "est",
) -> DataFrame:
    """Point-estimate each probe key: min over the d cells it hashes to
    (missing cell = 0).  The sketch is d*w-bounded, so it broadcasts;
    probe cost is independent of the original corpus."""
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cm_hash(key, i, width).alias("col")
            )
            for i in range(depth)
        ]
    )
    exploded = probes.select(key_col, F.explode(pairs).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )
