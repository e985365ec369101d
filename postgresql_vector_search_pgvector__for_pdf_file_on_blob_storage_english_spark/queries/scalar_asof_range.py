# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import _drain, DataFrame, F, SparkSession, _events, _register, _t  # noqa: F401
# Scalar-function breadth: the string/math/date built-ins a user of the
# reference's serving path reaches for, exercised in one projection.
# ==========================================================================

def _scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("source")
    return docs.select(
        "doc_id",
        F.upper(t).alias("upper_src"),
        F.lower(t).alias("lower_src"),
        F.initcap(t).alias("initcap_src"),
        F.length(t).alias("len_src"),
        F.reverse(t).alias("rev_src"),
        F.substring(t, 1, 3).alias("sub_src"),
        F.lpad(t, 10, "_").alias("pad_src"),
        F.translate(t, "src", "XYZ").alias("trans_src"),
        F.levenshtein(t, F.lit("src0")).alias("lev_src"),
        F.round(F.sqrt(F.col("doc_id").cast("double") + 1), 4).alias("sqrt_id"),
        F.round(F.log(F.col("doc_id").cast("double") + 2.0), 4).alias("log_id"),
        F.pmod(F.col("doc_id") * 37 + 11, F.lit(97)).alias("mod_id"),
        F.conv(F.col("doc_id").cast("string"), 10, 16).alias("hex_id"),
    )


_register(
    "scalar_function_breadth",
    _scalar_functions,
    """
SELECT doc_id,
       upper(source) AS upper_src,
       lower(source) AS lower_src,
       -- initcap: first letter of each word upper, rest lower
       list_aggregate(list_transform(string_split(source, ' '),
         w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), 'string_agg', ' ') AS initcap_src,
       length(source) AS len_src,
       reverse(source) AS rev_src,
       substr(source, 1, 3) AS sub_src,
       lpad(source, 10, '_') AS pad_src,
       translate(source, 'src', 'XYZ') AS trans_src,
       levenshtein(source, 'src0') AS lev_src,
       round(sqrt(doc_id::DOUBLE + 1), 4) AS sqrt_id,
       round(ln(doc_id::DOUBLE + 2.0), 4) AS log_id,
       (doc_id * 37 + 11) % 97 AS mod_id,
       upper(to_hex(doc_id)) AS hex_id
FROM documents
""",
)


# ==========================================================================
# As-of join (operators/asof.py): for every click, the same user's most
# recent purchase at or before it.  Oracle = DuckDB's native ASOF JOIN.
# ==========================================================================

from ..operators.asof import asof_join  # noqa: E402


def _asof_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    out = asof_join(clicks, purchases, key="user_id", ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        "purchase_id_asof",
        F.round("value_asof", 4).alias("purchase_value_asof"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts_asof"),
    )


_register(
    "asof_join_click_purchase",
    _asof_clicks_purchases,
    """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       b.event_id AS purchase_id_asof,
       round(b.value, 4) AS purchase_value_asof,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts_asof
FROM (SELECT * FROM events WHERE event_type = 'click') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON p.user_id = b.user_id AND p.ts >= b.ts
""",
)


# ==========================================================================
# Range join (operators/rangejoin.py): clicks within 5 minutes after an
# error by the same user (2h window) — binned equi-join, not a per-key
# cross product.
# ==========================================================================

from ..operators.rangejoin import range_join  # noqa: E402


def _range_join_click_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    )
    out = range_join(clicks, errors, key="user_id", lower=0.0, upper=7200.0)
    return out.select(
        "user_id", "event_id", "error_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("error_ts"),
    )


_register(
    "range_join_click_after_error",
    _range_join_click_after_error,
    """
SELECT c.user_id, c.event_id, e.event_id AS error_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id
 AND epoch(c.ts) - epoch(e.ts) >= 0 AND epoch(c.ts) - epoch(e.ts) <= 7200
""",
)


def _stream_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM correlation through the driver gate: clicks and
    errors arrive as two independent micro-batched streams, joined live
    with the watermarked interval join (streaming/joins.py::
    stream_stream_interval_join — state bounded by rate x window in
    production).  The replay uses a fixture-spanning watermark so no
    pair is evicted before its partner arrives, making the drained sink
    equal the BATCH interval join — the same oracle as
    ``range_join_click_after_error`` by construction.  Inner
    stream-stream joins emit on match, so AvailableNow drains every
    pair once both sides' files have landed."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.joins import stream_stream_interval_join

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_join_{tag}_{os.getpid()}")
    src_l = os.path.join(base, "clicks")
    src_r = os.path.join(base, "errors")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    ev = _events(spark, sf_dir)
    ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    ).repartition(3).write.parquet(src_l)
    ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    ).repartition(3).write.parquet(src_r)

    clicks = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_l)
    )
    errors = (
        spark.readStream.schema("user_id long, ts timestamp, error_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_r)
    )
    joined = stream_stream_interval_join(
        clicks, errors, key="user_id", lower_s=0.0, upper_s=7200.0,
        watermark="90 days",
    )
    out = joined.select(
        F.col("l.user_id").alias("user_id"),
        "event_id",
        "error_id",
        F.date_format(F.col("l.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format(F.col("ts_r"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("error_ts"),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.read.parquet(sink)


_register(
    "stream_interval_join_replay",
    _stream_interval_join_replay,
    """
SELECT c.user_id, c.event_id, e.event_id AS error_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id
 AND epoch(c.ts) - epoch(e.ts) >= 0 AND epoch(c.ts) - epoch(e.ts) <= 7200
""",
)


# ==========================================================================


# ==========================================================================
# Forward as-of with tolerance (round 10): for every error event, the
# same user's NEXT purchase, kept only when it lands within 2 hours —
# the "time-to-recovery" join incident analytics runs.  Exercises
# operators/asof.py's direction='forward' path; the tolerance is a
# post-join filter expressed as a CASE that nulls out-of-window
# matches, preserving left-asof row counts.  Delays are exact
# microsecond integers (epoch-micro subtraction both engines).
# Oracle = DuckDB's native forward ASOF (p.ts <= b.ts).
# ==========================================================================

_ASOF_TOL_US = 7_200_000_000  # 2 hours


def _asof_error_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    out = asof_join(errors, purchases, key="user_id", ts="ts", direction="forward")
    delay = F.unix_micros(F.col("ts_asof")) - F.unix_micros(F.col("ts"))
    in_tol = F.col("ts_asof").isNotNull() & (delay <= _ASOF_TOL_US)
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("error_ts"),
        F.when(in_tol, F.col("purchase_id_asof")).alias("next_purchase_id"),
        F.when(in_tol, delay).alias("delay_us"),
        F.when(in_tol, F.round("value_asof", 4)).alias("next_purchase_value"),
    )


_register(
    "asof_join_forward_tolerance",
    _asof_error_next_purchase,
    f"""
WITH j AS (
  SELECT p.event_id, p.user_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
         b.event_id AS pid,
         epoch_us(b.ts) - epoch_us(p.ts) AS delay_us,
         round(b.value, 4) AS pval
  FROM (SELECT * FROM events WHERE event_type = 'error') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
    ON p.user_id = b.user_id AND p.ts <= b.ts
)
SELECT event_id, user_id, error_ts,
       CASE WHEN delay_us <= {_ASOF_TOL_US} THEN pid END AS next_purchase_id,
       CASE WHEN delay_us <= {_ASOF_TOL_US} THEN delay_us END AS delay_us,
       CASE WHEN delay_us <= {_ASOF_TOL_US} THEN pval END AS next_purchase_value
FROM j
""",
)
