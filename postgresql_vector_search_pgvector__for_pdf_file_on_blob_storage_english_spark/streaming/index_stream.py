"""Streaming maintenance of the persisted indexes: arriving vectors /
documents appended into the IVF and BM25 index layouts via
``foreachBatch``.

The reference ingests per-blob and bulk-inserts into its vector table
as each upload lands (Function.java:73-90, BulkExecution.java) — its
index (pgvector ivfflat) absorbs rows incrementally.  The Spark mapping:
the persisted-index append operators (``ann.ivf_index_append``,
``retrieval.bm25_index_append``) ARE the micro-batch bodies; this module
just binds them to a stream.  Stateless streaming — each batch's work
depends only on the batch (plus, for BM25's corpus-relative stats, an
index-sized refresh aggregation) — so there are no watermarks and no
state store; exactly-once lands on the source checkpoint + the
batch_id-keyed directory layout: every foreachBatch body passes its
``batch_id`` to the append operator, which dynamic-partition-overwrites
exactly that batch's directories — a batch replayed after a failure
between write and checkpoint commit rewrites itself instead of
appending duplicates (operators/index_maint.py; ADVICE r6).

``Trigger.AvailableNow`` drains the backlog then stops ("catch up and
exit"); omit for continuous maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.ann import ivf_index_append
from ..operators.retrieval import bm25_index_append


def stream_into_ivf_index(
    stream: DataFrame,
    centroids: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """readStream of (vec_id, embedding, ...) -> per-batch centroid
    assignment + append into the partitioned IVF index.  Centroids stay
    fixed across batches (the IVF contract), so searches see old and new
    vectors with identical semantics at every point in time."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ivf_index_append(
            batch_df, centroids, path, vec_col=vec_col, id_col=id_col,
            batch_id=batch_id + 1,  # foreachBatch ids start at 0; 0 is the bulk level
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_bm25_index(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    n_buckets: int = 32,
    available_now: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """readStream of (doc_id, text, ...) -> per-batch postings append +
    corpus-stats refresh.  After every batch the index equals a full
    rebuild over everything ingested so far (the append-equals-rebuild
    invariant, tests/test_bm25_index.py), so searches interleaved with
    ingestion are always exact for the corpus seen to that point."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_append(
            batch_df, path, n_buckets=n_buckets, text_col=text_col, id_col=id_col,
            batch_id=batch_id + 1,  # foreachBatch ids start at 0; 0 is the bulk level
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_pq_index(
    stream: DataFrame,
    centroids: DataFrame,
    codebooks,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols=None,
):
    """readStream of (vec_id, embedding, ...) -> per-batch coarse
    assignment + residual PQ encoding + append into the codes-only
    IVF-PQ index (operators/pq.py::pq_index_append).  Centroids and
    codebooks stay fixed across batches, so every appended code equals
    what a bulk rebuild would produce — append-equals-rebuild holds
    through the streaming codepath, and probes interleaved with
    ingestion stay exact for the corpus seen so far."""
    from ..operators.pq import pq_index_append

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pq_index_append(
            batch_df, centroids, codebooks, path,
            vec_col=vec_col, id_col=id_col, payload_cols=payload_cols,
            batch_id=batch_id + 1,  # foreachBatch ids start at 0; 0 is the bulk level
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_hnsw_index(
    stream: DataFrame,
    path: str,
    n_shards: int,
    checkpoint: str,
    available_now: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """readStream of (vec_id, embedding, ...) -> per-batch append into a
    maintained HNSW tree's FLAT delta buffer (operators/nsw.py::
    hnsw_index_append — no online graph mutation; searches exact-scan
    the buffer and compaction folds it into the graph).  The batch_id
    lands in the shared dynamic-partition-overwrite layout, so a
    replayed batch rewrites itself — idempotent like the IVF/BM25/PQ
    streams."""
    from ..operators.nsw import hnsw_index_append

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hnsw_index_append(
            batch_df, path, n_shards=n_shards, vec_col=vec_col, id_col=id_col,
            batch_id=batch_id + 1,  # foreachBatch ids start at 0; 0 is the bulk level
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
