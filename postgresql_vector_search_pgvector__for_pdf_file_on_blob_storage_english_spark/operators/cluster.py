"""Duplicate-cluster resolution: connected components over a candidate-
pair edge list (the step after any near-dup detector — MinHash/SimHash/
cosine pairs in, one canonical representative per duplicate *group*
out).

Algorithm: min-label propagation to fixpoint.  Each vertex starts
labeled with its own id; every iteration each vertex takes the min of
its label and its neighbors' labels; at fixpoint label = min id of the
connected component.  Iterations = O(component diameter) — near-dup
clusters are shallow (stars/cliques around a template), so 2-4 rounds
in practice.

Scale posture:

* per-iteration work is one shuffle keyed on vertex id (narrow
  (id, label) rows — never text or vectors);
* convergence is checked with a single aggregated scalar
  (sum of labels is monotonically non-increasing and integral, so
  equality <=> fixpoint) — the driver never collects the label table;
* ``localCheckpoint`` every iteration truncates the lineage, keeping
  plan size constant across rounds (on a cluster with a checkpoint
  dir, ``checkpoint`` gives the same effect fault-tolerantly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (id, component) with component =
    min vertex id reachable; deterministic for any edge order."""
    # materialize the symmetric edge list once — the upstream pair
    # detector (minhash/simhash/cosine) must not re-run per iteration
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)

    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iters):
        msgs = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "label")
        )
        labels = (
            labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.select("id", F.col("label").alias("component"))


def duplicate_clusters(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Corpus + near-dup pairs -> (id, cluster_id, cluster_size, is_canonical).

    Rows with no duplicate edge form singleton clusters.  The canonical
    representative (the row a dedup pipeline keeps) is the min-id member
    — the same survivor rule as ``exact_dedup``.
    """
    comp = connected_components(pairs, id_a, id_b)
    joined = (
        corpus.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("component", F.col("id")))
        .drop("component")
    )
    sized = joined.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
    )
    return sized.select(
        "id",
        "cluster_id",
        "cluster_size",
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )
