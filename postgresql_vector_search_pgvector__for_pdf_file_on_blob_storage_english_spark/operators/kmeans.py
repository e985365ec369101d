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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
