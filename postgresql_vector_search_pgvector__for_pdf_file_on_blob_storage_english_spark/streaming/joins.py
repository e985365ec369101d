"""Stream-stream join with watermarked state — correlating two live
event streams (the streaming twin of operators/rangejoin.py).

Spark buffers both sides in the state store until the watermark says
no match can still arrive; the join-time-bound condition is what lets
it *evict*: state holds only the trailing ``upper`` seconds per side,
so memory is bounded by rate x window, not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_s: float = 0.0,
    upper_s: float = 300.0,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pairs with ``r.ts + lower_s <= l.ts <= r.ts + upper_s`` per key,
    both sides streaming.  Both streams carry the same watermark; the
    interval condition bounds the buffered state.

    Right columns are suffixed ``_r``.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    collide = {c for c in right.columns if c in left.columns}
    r = (
        right.select(
            *[F.col(c).alias(f"{c}_r") if c in collide else F.col(c) for c in right.columns]
        )
        .withWatermark(f"{right_ts}_r" if right_ts in collide else right_ts, watermark)
        .alias("r")
    )
    rts = f"{right_ts}_r" if right_ts in collide else right_ts
    kr = f"{key}_r" if key in collide else key
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{kr}"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{rts}") + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{rts}") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, cond, "inner")
