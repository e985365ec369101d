"""Arrival-driven ingestion — the reference's blob trigger as
Structured Streaming (SURVEY.md §1.4, §2.5).

The reference processes each uploaded blob independently, with no
cross-event state, no watermarks, no event-time windows
(Function.java:73-90): the correct Spark mapping is **stateless**
streaming — the same batch transformation applied per micro-batch via
``foreachBatch``.  One codepath, two execution modes:

* batch: ``ingest_pages(pdf_source(spark, dir))``
* incremental: this module — ``readStream.format("binaryFile")`` with
  the same downstream pipeline; ``Trigger.AvailableNow`` drains the
  backlog and stops (the "catch up, then exit" operational mode),
  omit it for continuous arrival processing.

File-arrival tracking (which blobs are new) is the source's checkpoint
state — exactly the bookkeeping the Functions host does for the
reference's trigger, but transactional with the sink writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import ingest_pages, write_corpus
from ..sources.pdf import extract_pages


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_path: str,
    status_path: str,
    checkpoint_dir: str,
    glob: str = "*.pdf",
    dim: int = 64,
    embed_fn=None,
    available_now: bool = True,
):
    """Start the arrival-driven ingest; returns the StreamingQuery.

    ``foreachBatch`` runs the identical batch pipeline per micro-batch,
    so batch and streaming results are the same relation (stateless by
    design — the reference has no cross-event semantics to preserve).
    """
    # Streaming sources require an explicit schema; binaryFile's is fixed.
    binary_schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    binary = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", glob)
        .load(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        paged = extract_pages(batch_df)
        pages = paged.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("fileName"),
            F.posexplode_outer(F.col("pages")).alias("_pos", "page"),
        ).select(
            "fileName",
            F.col("page.pageNumber").alias("pageNumber"),
            F.col("page.text").alias("text"),
        )
        corpus, status_events = ingest_pages(pages, dim=dim, embed_fn=embed_fn)
        write_corpus(corpus, corpus_path)
        status_events.write.mode("append").parquet(status_path)

    writer = binary.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
