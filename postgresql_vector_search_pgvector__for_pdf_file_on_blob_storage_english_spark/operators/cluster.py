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

* **small-graph fast path**: near-dup edge lists are orders of magnitude
  smaller than the corpus (pairs of *duplicates*, not documents) — when
  the deduplicated edge list fits under ``small_graph_threshold`` it is
  collected once and solved with driver-side union-find: one Spark job
  total instead of 2 per fixpoint round.  The collect is bounded by the
  threshold (narrow id pairs), and the result re-enters the plan as a
  broadcastable relation;
* **distributed path** (over threshold): per-iteration work is one
  shuffle keyed on vertex id (narrow (id, label) rows — never text or
  vectors); convergence is checked with a single aggregated scalar
  (sum of labels is monotonically non-increasing and integral, so
  equality <=> fixpoint) — the driver never collects the label table;
  ``localCheckpoint`` every iteration truncates the lineage, keeping
  plan size constant across rounds (on a cluster with a checkpoint
  dir, ``checkpoint`` gives the same effect fault-tolerantly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _union_find_components(pairs: list[tuple]) -> list[tuple]:
    """Driver-side union-find over (src, dst) pairs -> (id, min-id-of-
    component) rows; the small-graph twin of the label-propagation loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    return [(v, comp_min[find(v)]) for v in parent]


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (id, component) with component =
    min vertex id reachable; deterministic for any edge order.

    Edge lists at or under ``small_graph_threshold`` distinct pairs are
    solved driver-side (union-find, one job); larger graphs run the
    distributed min-label-propagation fixpoint.  Both paths produce the
    identical labeling (parity-tested)."""
    id_type = edges.schema[id_a].dataType
    dedup_pairs = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).distinct()

    # Probe for the fast path with a bounded collect: threshold+1 rows of
    # narrow id pairs, one job over the upstream pair detector.
    probe = dedup_pairs.limit(small_graph_threshold + 1).collect()
    if len(probe) <= small_graph_threshold:
        out_schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("component", id_type)]
        )
        rows = _union_find_components([(r["src"], r["dst"]) for r in probe])
        return edges.sparkSession.createDataFrame(rows, out_schema)

    # Distributed fixpoint.  Materialize the symmetric edge list once —
    # the upstream pair detector (minhash/simhash/cosine) must not re-run
    # per iteration.
    sym = (
        dedup_pairs.union(
            dedup_pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
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


def cluster_survivors(
    corpus: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """:func:`duplicate_clusters` with a QUALITY survivorship rule:
    the kept row per near-dup cluster is the highest-``score_col``
    member (ties by min id), not the min id — the policy real cleanup
    pipelines want (keep the longest / best-formatted / least-boiler-
    plate version of a page, not whichever crawl got the smaller id).

    Returns ``(id, cluster_id, cluster_size, score, is_survivor)``.
    Shape: the CC labeling plus one cluster-keyed window — the cluster
    relation is corpus-sized but narrow (id, cluster, score)."""
    comp = connected_components(pairs, id_a, id_b)
    labeled = (
        corpus.select(F.col(id_col).alias("id"), F.col(score_col).alias("score"))
        .join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("component", F.col("id")))
        .drop("component")
    )
    w = Window.partitionBy("cluster_id")
    # row_number over (score desc, id asc) instead of max(struct(score,
    # -id)): negating the id fails analysis for string doc ids, which
    # the id_col parameter (and exact_dedup's min_by survivor rule)
    # supports.  Same semantics: exactly one survivor per cluster, the
    # max-score member, ties broken by the smallest id.
    wo = w.orderBy(F.col("score").desc(), F.col("id").asc())
    return labeled.select(
        "id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        "score",
        (F.row_number().over(wo) == 1).alias("is_survivor"),
    )


def leakage_safe_split(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_pct: int = 10,
    salt: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup-aware train/test split: every member of a near-duplicate
    cluster lands on the SAME side, so a test document's near-copy can
    never sit in train (the contamination a row-hash split like
    ``groupwise.train_test_split_hash`` silently permits — eval numbers
    inflate when the model has memorized the training-side twin).

    The split key is the CLUSTER id (min-id member via connected
    components; singletons key on themselves), bucketed by the same
    stable md5 hash as the row-level split, so membership is
    deterministic across runs, engines, partitionings and appends.

    Returns ``(id, cluster_id, split)``.  Shape: the CC labeling
    (linear-in-|pairs| star rounds) plus one codegen hash — no window,
    no extra exchange beyond the CC join.
    """
    comp = connected_components(pairs, id_a, id_b)
    labeled = (
        corpus.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("component", F.col("id")))
        .drop("component")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col("cluster_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long") % 100
    return labeled.select(
        "id",
        "cluster_id",
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


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
