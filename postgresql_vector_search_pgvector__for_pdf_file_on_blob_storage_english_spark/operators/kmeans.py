"""Deterministic Lloyd k-means over an embedding column — the trainer
for the IVF coarse quantizer (operators/ann.py takes any centroid
relation; this produces a data-adaptive one).

Pure DataFrame implementation:

* init — the k lowest-id vectors (deterministic; k-means|| adds RNG
  for quality, wrong trade here where reproducibility gates everything);
* assign — broadcast centroids, argmin via ``min_by`` over a
  (distance, centroid_id) struct: map-side partial, one shuffled row
  per vector, declared tiebreak;
* update — per-centroid mean of member vectors: ``posexplode`` to
  (dim_index, value), sum/count per (centroid, index), rebuild with
  ``array_agg`` sorted by index.  Empty clusters keep their previous
  centroid.

Floating-point note: cross-partition summation order makes the last
ulps of centroid means run-dependent, so k-means is *not* oracle-gated
bit-for-bit (the fixed-centroid IVF queries are); determinism claims
here are "same partitioning -> same result", tested, plus invariants
(inertia non-increasing, assignment = nearest centroid).

Two trainers:

* :func:`kmeans_fit` — fully distributed Lloyd (assign/update as Spark
  jobs).  Use when the training set itself must stay distributed.
* :func:`kmeans_fit_sampled` — the production IVF topology: a coarse
  quantizer is trained on a bounded *sample* regardless of corpus size
  (a 100 TB corpus trains its quantizer on 10^5-10^6 vectors, then only
  the cheap assignment pass is distributed — the same split FAISS
  ``train`` vs ``add`` makes).  The sample collects to the driver
  (bounded by ``train_limit``), Lloyd runs in numpy (single accumulation
  order -> deterministic for a fixed sample), and the centroids re-enter
  the plan as a broadcastable relation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vector import l2_distance_sq
from .ann import assign_ivf


def kmeans_fit(
    corpus: DataFrame,
    k: int = 16,
    max_iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> DataFrame:
    """Returns (centroid_id int, centroid_vec array<double>)."""
    vecs = corpus.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    centroids = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    ).localCheckpoint(eager=True)

    prev_inertia = None
    for _ in range(max_iters):
        assigned = assign_ivf(
            vecs, centroids, vec_col=vec_col, id_col=id_col, metric="l2"
        )
        # inertia (sum of squared distances) — the convergence scalar
        inertia = (
            assigned.join(F.broadcast(centroids), "centroid_id")
            .select(l2_distance_sq(vec_col, "centroid_vec").alias("d2"))
            .agg(F.sum("d2"))
            .first()[0]
        )
        # update step: mean per (centroid, dimension index)
        comps = assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("i", "v")
        )
        means = (
            comps.groupBy("centroid_id", "i")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_im"))
            .select(
                "centroid_id",
                F.transform("_im", lambda s: s["m"]).alias("centroid_vec"),
            )
        )
        # empty clusters retain their previous centroid
        centroids = (
            centroids.alias("old")
            .join(means.alias("new"), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new.centroid_vec"), F.col("old.centroid_vec")).alias(
                    "centroid_vec"
                ),
            )
        ).localCheckpoint(eager=True)

        if prev_inertia is not None and abs(prev_inertia - inertia) <= tol * prev_inertia:
            break
        prev_inertia = inertia

    return centroids


def kmeans_fit_sampled(
    corpus: DataFrame,
    k: int = 16,
    max_iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
    train_limit: int = 100_000,
) -> DataFrame:
    """Sample-trained Lloyd: same init (k lowest-id vectors), same
    assignment tiebreak (lowest centroid_id), same empty-cluster rule as
    :func:`kmeans_fit`, but the Lloyd loop runs in numpy over a
    deterministic bounded sample (the ``train_limit`` lowest-id vectors —
    a TakeOrdered, never a full sort).  One Spark job total instead of
    2 per iteration."""
    rows = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
        .orderBy(id_col)
        .limit(train_limit)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors to train, got {len(rows)}")
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)

    C = X[:k].copy()  # k lowest-id vectors (rows are already id-ordered)
    prev_inertia = None
    for _ in range(max_iters):
        # ||x-c||^2 via the GEMM identity; argmin ties -> lowest centroid_id
        d2 = (
            (X * X).sum(axis=1)[:, None]
            + (C * C).sum(axis=1)[None, :]
            - 2.0 * (X @ C.T)
        )
        assign = d2.argmin(axis=1)
        inertia = float(d2[np.arange(len(X)), assign].sum())
        for c in range(k):  # empty clusters keep their previous centroid
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        if prev_inertia is not None and abs(prev_inertia - inertia) <= tol * prev_inertia:
            break
        prev_inertia = inertia

    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("centroid_vec", T.ArrayType(T.DoubleType())),
        ]
    )
    return corpus.sparkSession.createDataFrame(
        [(i, [float(v) for v in C[i]]) for i in range(k)], schema
    )
