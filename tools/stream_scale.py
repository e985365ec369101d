"""Streaming SCALE protocol (VERDICT r10 #5).

The sf1 batch tables exclude every ``stream_*_replay`` entry because a
replay rewrites its own source fixture — timing it measures the
harness.  What a 100x user actually needs from the streaming layer is:

1. **State vs active keys** — does the persistent footprint track the
   KEY population (bounded by the business domain) or the EVENT volume
   (unbounded)?  For sessionize that is the state store's
   ``numRowsTotal`` vs distinct users; for the sketch-log operators
   (Misra-Gries heavy hitters, reservoir) it is the log's row count vs
   distinct keys / total events.
2. **Per-trigger throughput at 10x events** — rows/s from the engine's
   own StreamingQueryProgress, medians across triggers, so a 10x event
   rate can be provisioned as (rate / throughput) executors.

Protocol: split the events table into 8 disjoint time-range files
(mtime-pinned arrival order, maxFilesPerTrigger=1 -> 8 triggers), run
each operator with trigger(availableNow) to a throwaway sink, then read
the numbers out of ``recentProgress`` and the logs.  Run at sf0.1 and
/tmp/sf1 (10x events) and compare.

Usage: python tools/stream_scale.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (  # noqa: E402
    _drain,
    _events,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

N_FILES = 8


def _split_events(spark, sf_dir: str, base: str):
    """events -> N_FILES disjoint time-range parquet files with strictly
    increasing mtimes (the sessionize replay's arrival-order pin)."""
    src = os.path.join(base, "src")
    ev = _events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    span = (hi - lo) + 1
    epoch = None
    for i in range(N_FILES):
        a = lo + (span * i) // N_FILES
        b = lo + (span * (i + 1)) // N_FILES
        ev.filter(
            (F.unix_micros("ts") >= a) & (F.unix_micros("ts") < b)
        ).coalesce(1).write.parquet(f"{src}/f{i}")
        for root, _d, files in os.walk(f"{src}/f{i}"):
            for fn in files:
                p = os.path.join(root, fn)
                if epoch is None:
                    epoch = os.stat(p).st_mtime
                os.utime(p, (epoch + i, epoch + i))
    n = ev.count()
    keys = ev.select("user_id").distinct().count()
    types = ev.select("event_type").distinct().count()
    return src, ev.schema, n, keys, types


def _progress_stats(q):
    progs = [json.loads(p) if isinstance(p, str) else p for p in q.recentProgress]
    per_trigger = [
        p for p in progs if p.get("numInputRows", 0) > 0
    ]
    rows = [p["numInputRows"] for p in per_trigger]
    rps = [
        p.get("processedRowsPerSecond", 0.0) for p in per_trigger
    ]
    state_rows = None
    for p in reversed(progs):
        ops = p.get("stateOperators") or []
        if ops and ops[0].get("numRowsTotal") is not None:
            state_rows = ops[0]["numRowsTotal"]
            break
    return {
        "triggers": len(per_trigger),
        "median_rows_per_trigger": int(statistics.median(rows)) if rows else 0,
        "median_rows_per_sec": round(statistics.median(rps), 1) if rps else 0.0,
        "state_rows": state_rows,
    }


def probe_sessionize(spark, src, schema, base):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sessionize_stream import (
        streaming_sessionize,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .select("user_id", "event_id", "ts")
    )
    out = streaming_sessionize(stream)
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, _i: df.write.mode("overwrite").format("noop").save())
        .option("checkpointLocation", os.path.join(base, "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 600)
    return _progress_stats(q), None


def probe_heavy_hitters(spark, src, schema, base):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.heavyhitters_stream import (
        stream_into_mg,
    )

    log = os.path.join(base, "mg_log")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .select("event_type")
    )
    q = stream_into_mg(
        stream, log, os.path.join(base, "ckpt_mg"), "event_type", k=8
    )
    _drain(q, 600)
    log_rows = spark.read.parquet(log).count()
    return _progress_stats(q), log_rows


def probe_reservoir(spark, src, schema, base):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
        stream_into_reservoir,
    )

    log = os.path.join(base, "res_log")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .select("event_id", "user_id", "event_type")
    )
    q = stream_into_reservoir(
        stream,
        log,
        os.path.join(base, "ckpt_res"),
        "event_id",
        ["user_id", "event_type"],
        k=64,
    )
    _drain(q, 600)
    log_rows = spark.read.parquet(log).count()
    return _progress_stats(q), log_rows


def _split_table(spark, sf_dir: str, base: str, table: str, id_col: str, cols):
    """generic N_FILES range split (by id) with the mtime pin — for the
    non-events sources (documents, embeddings)."""
    src = os.path.join(base, f"src_{table}")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(*cols)
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
    span = (hi - lo) + 1
    epoch = None
    for i in range(N_FILES):
        a = lo + (span * i) // N_FILES
        b = lo + (span * (i + 1)) // N_FILES
        df.filter((F.col(id_col) >= a) & (F.col(id_col) < b)).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        for root, _d, files in os.walk(f"{src}/f{i}"):
            for fn in files:
                p = os.path.join(root, fn)
                if epoch is None:
                    epoch = os.stat(p).st_mtime
                os.utime(p, (epoch + i, epoch + i))
    return src, df.schema, df.count()


# --------------------------------------------------------------------------
# Round-12 probes (VERDICT r11 #7): the four remaining stateful replays.
# All four persist LOGS or an INDEX, not a state store, so "persistent
# rows" reads the artifact row count; the active-key population is the
# quantity the log's merge law is keyed on.
# --------------------------------------------------------------------------


def probe_hourly_cusum(spark, src, schema, base):
    """stream_cusum_replay's log: per-(batch, hour) counts — keyed on
    the HOUR CALENDAR, so persistent rows are bounded by
    triggers x hours regardless of event volume."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.monitor_stream import (
        stream_into_hourly_counts,
    )

    log = os.path.join(base, "hourly_log")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .select("ts")
    )
    q = stream_into_hourly_counts(stream, log, os.path.join(base, "ckpt_hr"))
    _drain(q, 600)
    return _progress_stats(q), spark.read.parquet(log).count()


def probe_score_counts(spark, sf_dir, base):
    """stream_calibration_replay / stream_auc_replay's shared log:
    per-(batch, quantized score) counts — keyed on the SCORE DOMAIN."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.evalmetrics_stream import (
        stream_into_score_counts,
    )

    scored = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id"),
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    src = os.path.join(base, "src_scores")
    lo, hi = scored.agg(F.min("event_id"), F.max("event_id")).first()
    span = (hi - lo) + 1
    epoch = None
    for i in range(N_FILES):
        a = lo + (span * i) // N_FILES
        b = lo + (span * (i + 1)) // N_FILES
        scored.filter(
            (F.col("event_id") >= a) & (F.col("event_id") < b)
        ).select("score", "label").coalesce(1).write.parquet(f"{src}/f{i}")
        for root, _d, files in os.walk(f"{src}/f{i}"):
            for fn in files:
                p = os.path.join(root, fn)
                if epoch is None:
                    epoch = os.stat(p).st_mtime
                os.utime(p, (epoch + i, epoch + i))
    stream = (
        spark.readStream.schema("score double, label boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    log = os.path.join(base, "score_log")
    q = stream_into_score_counts(
        stream, log, os.path.join(base, "ckpt_sc"), "score", "label", scale=100
    )
    _drain(q, 600)
    key_pop = scored.select(
        F.floor(F.col("score") * 100 + 0.5).cast("long")
    ).distinct().count()
    return _progress_stats(q), spark.read.parquet(log).count(), key_pop


def probe_residual_counts(spark, sf_dir, base):
    """stream_conformal_replay's log: per-(batch, source, residual)
    histogram — keyed on source x the n_chars-domain-bounded residual."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.evalmetrics_stream import (
        stream_into_residual_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("sc")
    )
    mu = docs.groupBy("source").agg(
        F.expr("CAST(sum(sc) div count(*) AS BIGINT)").alias("mu")
    )
    scored = docs.join(F.broadcast(mu), "source").select(
        "doc_id", "source", F.abs(F.col("sc") - F.col("mu")).alias("r")
    )
    src = os.path.join(base, "src_resid")
    lo, hi = scored.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = (hi - lo) + 1
    epoch = None
    for i in range(N_FILES):
        a = lo + (span * i) // N_FILES
        b = lo + (span * (i + 1)) // N_FILES
        scored.filter(
            (F.col("doc_id") >= a) & (F.col("doc_id") < b)
        ).select("source", "r").coalesce(1).write.parquet(f"{src}/f{i}")
        for root, _d, files in os.walk(f"{src}/f{i}"):
            for fn in files:
                p = os.path.join(root, fn)
                if epoch is None:
                    epoch = os.stat(p).st_mtime
                os.utime(p, (epoch + i, epoch + i))
    stream = (
        spark.readStream.schema("source string, r bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    log = os.path.join(base, "resid_log")
    q = stream_into_residual_counts(
        stream, log, os.path.join(base, "ckpt_rs"), "source", "r"
    )
    _drain(q, 600)
    key_pop = scored.select("source", "r").distinct().count()
    return _progress_stats(q), spark.read.parquet(log).count(), key_pop


def probe_ivf_upsert(spark, sf_dir, base):
    """stream_ivf_upsert_replay's artifact: the partitioned IVF index —
    rows track the CORPUS by design (an index holds every vector), so
    the honest ratio is persistent/events == 1.0 with per-vector bytes
    constant; the measured quantity is append throughput."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.index_stream import (
        stream_into_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    src, schema, n = _split_table(
        spark, sf_dir, base, "embeddings", "vec_id",
        ["vec_id", "embedding", "label"],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    idx = os.path.join(base, "ivf_idx")
    q = stream_into_ivf_index(stream, centroids, idx, os.path.join(base, "ckpt_ivf"))
    _drain(q, 600)
    return _progress_stats(q), spark.read.parquet(idx).count(), n


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_spark("stream_scale")
    print(
        "| operator | sf | events | active keys | triggers | "
        "rows/trigger (med) | rows/s (med) | persistent rows | persistent/keys |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    only = set(sys.argv[3:])
    for sf_name, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        base = tempfile.mkdtemp(prefix=f"stream_scale_{sf_name}_")
        try:
            src, schema, n, keys, types = _split_events(spark, sf_dir, base)
            hours = (
                _events(spark, sf_dir)
                .select(F.date_trunc("hour", "ts"))
                .distinct()
                .count()
            )
            for name, fn, key_pop in (
                ("sessionize", probe_sessionize, keys),
                ("heavy_hitters(MG k=8)", probe_heavy_hitters, types),
                ("reservoir(k=64)", probe_reservoir, None),
                ("hourly_cusum_log", probe_hourly_cusum, hours),
            ):
                if only and name not in only:
                    continue
                stats, log_rows = fn(spark, src, schema, base)
                persistent = (
                    stats["state_rows"] if log_rows is None else log_rows
                )
                ratio = (
                    f"{persistent / key_pop:.2f}" if key_pop else "n/a (vs events: "
                    f"{persistent / n:.5f})"
                )
                print(
                    f"| {name} | {sf_name} | {n} | {key_pop or '-'} | "
                    f"{stats['triggers']} | {stats['median_rows_per_trigger']} | "
                    f"{stats['median_rows_per_sec']} | {persistent} | {ratio} |",
                    flush=True,
                )
            # r12 probes with their own sources / key populations
            for name, fn in (
                ("score_count_log", probe_score_counts),
                ("conformal_residual_log", probe_residual_counts),
                ("ivf_upsert_index", probe_ivf_upsert),
            ):
                if only and name not in only:
                    continue
                stats, persistent, key_pop = fn(spark, sf_dir, base)
                n_in = stats["triggers"] * stats["median_rows_per_trigger"]
                print(
                    f"| {name} | {sf_name} | ~{n_in} | {key_pop} | "
                    f"{stats['triggers']} | {stats['median_rows_per_trigger']} | "
                    f"{stats['median_rows_per_sec']} | {persistent} | "
                    f"{persistent / key_pop:.2f} |",
                    flush=True,
                )
        finally:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
