"""Streaming corpus admission: incremental exact dedup against a
PERSISTED fingerprint state table.

The continuous corpus-build loop (the batch operator's docstring made
the claim; this module makes it executable): the corpus-side dedup
state is a parquet table of admitted fingerprints, each arriving
micro-batch is classified against it (``dup_of_base`` /
``dup_in_batch`` / ``new``), the classifications land in an append-only
sink, and the batch's ADMITTED fingerprints are appended to the state
table — so the next micro-batch sees them as corpus.  No Spark state
store: the state is an ordinary table (inspectable, compactable,
shared with the batch path), and the per-batch work is one hash
semi-join bounded by the batch.

Replay semantics: a retried micro-batch re-appends the same
fingerprints (classification is deterministic), and every consumer of
the state table reads it through ``distinct()`` — duplicate state rows
are absorbed, so the pipeline is idempotent without coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import classify_against_fingerprints


def seed_state(base: DataFrame, state_path: str, text_col: str = "text") -> None:
    """Initialize the state table with the existing corpus's distinct
    fingerprints (one normalize+md5 pass; only hashes are written)."""
    from ..functions.text import normalize_whitespace_col

    base.select(
        F.md5(normalize_whitespace_col(text_col)).alias("fingerprint")
    ).distinct().write.mode("overwrite").parquet(state_path)


def stream_admit_documents(
    stream: DataFrame,
    state_path: str,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """readStream of documents -> per-batch classification appended to
    ``sink_path`` (id, fingerprint, status, batch_id) + admitted
    fingerprints appended to ``state_path``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = spark.read.parquet(state_path)
        classified = classify_against_fingerprints(
            state, batch_df, text_col=text_col, id_col=id_col
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        # the window inside the classification makes `classified` lazy
        # over the batch twice (sink + state appends); batches are
        # bounded, so materialize once
        classified = classified.localCheckpoint(eager=True)
        classified.write.mode("append").parquet(sink_path)
        classified.filter(F.col("status") == "new").select(
            "fingerprint"
        ).write.mode("append").parquet(state_path)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
