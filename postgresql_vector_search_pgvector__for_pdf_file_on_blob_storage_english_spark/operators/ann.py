"""Approximate nearest-neighbor search — the scale path beyond exact KNN.

The reference's search is exact brute force (SURVEY.md §2/Q2) and
``operators.knn`` keeps that as the baseline/default.  These operators
add the two standard partition-the-corpus strategies for corpora where
even a narrow full scan per query is too much:

* **IVF (inverted-file)** — assign every vector to its nearest
  centroid once (an offline ``knn_join`` against the centroid
  relation), partition/cluster the corpus by ``centroid_id``, and at
  query time scan only ``nprobe`` centroids' buckets.  With the corpus
  written partitioned-by-centroid, Catalyst turns the bucket filter
  into partition pruning: the 100 TB scan becomes a few-GB scan.
* **Random-hyperplane LSH** — k seeded hyperplanes -> k-bit signature
  as the bucket key; cosine-similar vectors collide.  Deterministic
  (LCG-seeded hyperplanes), so buckets are reproducible across engines
  and runs.

Both return *exact distances within the probed buckets*; recall is
traded via nprobe / signature bits.  Both are oracle-checkable because
every step is portable arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import DISTANCE_FNS, dot_product
from .knn import knn_join


def _lcg_doubles(n: int, seed: int) -> list[float]:
    """Deterministic pseudo-uniform doubles in [-1, 1) (portable LCG)."""
    state = seed & 0x7FFFFFFF
    out = []
    for _ in range(n):
        state = (1103515245 * state + 12345) % (1 << 31)
        out.append(state / float(1 << 30) - 1.0)
    return out


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    vals = _lcg_doubles(dim * n_planes, seed)
    return [vals[i * dim : (i + 1) * dim] for i in range(n_planes)]


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Signature bit b = 1 iff dot(vec, plane_b) >= 0; bucket = Σ bit<<b."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_product(v, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, b)
    return bucket


def assign_ivf(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    metric: str = "l2",
) -> DataFrame:
    """Tag every corpus row with its nearest centroid.

    ``centroids`` is small — it broadcasts; the argmin over centroids is
    a ``min_by`` groupBy keyed on the corpus id, which Spark partially
    aggregates map-side: each task reduces its |centroids| candidate
    rows per corpus row to one *before* the exchange, so the shuffle
    carries exactly one row per corpus row.  Ties break on
    (distance, centroid_id) — declared, like every tiebreak here.
    Persist the result partitioned by ``centroid_id`` to get partition
    pruning at query time (see ``ivf_search``).
    """
    dist_fn = DISTANCE_FNS[metric]
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "_cdist", dist_fn(F.col(vec_col), F.col(centroid_vec_col))
    )
    row = F.struct(*[F.col(c) for c in corpus.columns], F.col(centroid_id_col))
    return (
        scored.groupBy(id_col)
        .agg(F.min_by(row, F.struct(F.col("_cdist"), F.col(centroid_id_col))).alias("_best"))
        .select("_best.*")
    )


def ivf_search(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    query_vec,
    k: int = 5,
    nprobe: int = 1,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    payload_cols=None,
) -> DataFrame:
    """Probe the ``nprobe`` nearest centroids' buckets, exact top-k inside.

    The bucket filter is a semi-join on ``centroid_id`` — on a corpus
    stored partitioned by that column this is partition pruning, not a
    scan.  ``query_vec`` may be a literal sequence or a 1-row DataFrame
    whose single column is the vector.
    """
    from .knn import knn

    dist_fn = DISTANCE_FNS[metric]
    if isinstance(query_vec, DataFrame):
        qname = query_vec.columns[0]
        probe = (
            centroids.crossJoin(F.broadcast(query_vec))
            .withColumn("_qd", dist_fn(F.col(centroid_vec_col), F.col(qname)))
        )
    else:
        probe = centroids.withColumn(
            "_qd", dist_fn(F.col(centroid_vec_col), knn_query_col(query_vec))
        )
    probe = probe.orderBy("_qd", centroid_id_col).limit(nprobe).select(centroid_id_col)
    bucket = assigned_corpus.join(F.broadcast(probe), centroid_id_col, "left_semi")
    return knn(
        bucket, query_vec, k=k, metric=metric, vec_col=vec_col, id_col=id_col,
        payload_cols=payload_cols,
    )


def knn_query_col(query_vec) -> Column:
    if isinstance(query_vec, Column):
        return query_vec
    return F.array(*[F.lit(float(v)) for v in query_vec])


def lsh_search(
    corpus: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 5,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols=None,
) -> DataFrame:
    """Exact top-k restricted to the query's LSH bucket."""
    from .knn import knn

    tagged = corpus.withColumn("_bucket", lsh_bucket(vec_col, planes))
    qbucket = lsh_bucket(knn_query_col(query_vec), planes)
    bucket = tagged.filter(F.col("_bucket") == qbucket).drop("_bucket")
    return knn(
        bucket, query_vec, k=k, metric=metric, vec_col=vec_col, id_col=id_col,
        payload_cols=payload_cols,
    )
