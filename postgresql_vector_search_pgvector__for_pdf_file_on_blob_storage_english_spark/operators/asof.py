"""As-of join — for every probe row, the most recent build row at or
before its timestamp (per key).  The temporal-join primitive Spark's
DataFrame API lacks; DuckDB/kdb/Pandas ship it natively (DuckDB's
``ASOF JOIN`` is this operator's oracle).

Physical strategy — **union + single window**, not a range join:

1. tag build rows 0 and probe rows 1, union them on (key, ts);
2. one window per key ordered by (ts, tag): ``last_value`` of the
   build payload with ``rowsBetween(unboundedPreceding, current)``
   ignoring nulls propagates the latest build row seen so far;
3. keep probe rows.

Cost = ONE shuffle of |build| + |probe| narrow rows and one sort per
key partition — no inequality join (which Spark plans as a
cross-product-per-key BroadcastNestedLoop at best), no per-row Python.
Skewed keys fall under the same salting levers as any window
(operators/skew.py).

Probe rows with no earlier build row get nulls (left-asof semantics,
matching DuckDB's ``ASOF LEFT JOIN``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    build_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """For each probe row: the build row with the greatest ``ts`` <=
    probe's ``ts`` (direction='backward', default) or smallest >=
    (direction='forward'), matching on ``key``.

    ``build_cols`` — build payload columns to attach (default: all
    non-key/ts); emitted as ``<name><suffix>`` plus ``<ts><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = (
        build_cols
        if build_cols is not None
        else [c for c in build.columns if c not in (key, ts)]
    )

    b = build.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_tag"),
        F.struct(F.col(ts).alias(ts), *[F.col(c) for c in payload]).alias("_payload"),
    )
    p = probe.withColumn("_tag", F.lit(1)).withColumn("_payload", F.lit(None).cast(b.schema["_payload"].dataType))

    probe_cols = [c for c in probe.columns]
    unioned = p.select(*probe_cols, "_tag", "_payload").unionByName(
        b.select(
            F.col(key),
            F.col(ts),
            *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols if c not in (key, ts)],
            "_tag",
            "_payload",
        )
    )

    if direction == "backward":
        # build (tag 0) sorts before probe (tag 1) at equal ts -> "at or before"
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).desc(), F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))

    out = carried.filter(F.col("_tag") == 1).drop("_tag", "_payload")
    out = out.withColumn(f"{ts}{suffix}", F.col(f"_match.{ts}"))
    for c in payload:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    return out.drop("_match")
