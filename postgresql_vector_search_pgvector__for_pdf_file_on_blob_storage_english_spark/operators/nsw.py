"""Sharded NSW graph ANN — the graph-index scale path (HNSW-class).

Beyond reference parity (the reference has no index at all,
create-env-en.sh:172-180); this is the builder's-backlog item from
VERDICT r2 #10.  Design is Spark-first sharding, not a distributed
graph: the corpus hash-partitions into shards, each shard builds an
independent navigable-small-world graph inside one ``applyInPandas``
task (numpy, no cross-shard edges), and a query beam-searches every
shard in parallel before a tiny global top-k merge.  That is how
graph indexes actually deploy on clusters (one sub-index per
partition, scatter-gather search): shard count scales out with the
corpus, shard size is bounded by executor memory, and the search
fan-out is ``n_shards`` embarrassingly-parallel tasks.

Everything is deterministic by construction — insertion order is id
ascending, every candidate ordering ties on (distance, id), the entry
point is the shard's min id — so build and search are exactly
reproducible (pytest replicates both in pure numpy).  The iterative
build/search cannot be expressed in one SQL statement, so the registry
entry is rows-only (like ``ann_ivf_kmeans_search``), with recall
measured against the exact top-k instead (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _shard_col(id_col: str, n_shards: int) -> Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")


def _np_build_shard(ids, mat, m: int, ef: int):
    """NSW insert loop for one shard: greedy beam search the partial
    graph for each new node's ``m`` nearest, link bidirectionally, prune
    every adjacency back to its ``m`` best by (distance, id)."""
    import numpy as np

    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n = len(ids)
    adj: list[set[int]] = [set() for _ in range(n)]  # positional indices

    def dist(i, j):
        d = mat[i] - mat[j]
        return float(np.sqrt(np.dot(d, d)))

    def beam(qi: int, upto: int, width: int) -> list[int]:
        """Best-first search of graph[0:upto] for qi's nearest; returns
        candidate positions sorted by (distance, id)."""
        entry = 0  # min id — deterministic entry point
        visited = {entry}
        frontier = [(dist(qi, entry), int(ids[entry]), entry)]
        best = list(frontier)
        while frontier:
            frontier.sort()
            d0, _, cur = frontier.pop(0)
            best.sort()
            if len(best) >= width and d0 > best[min(width, len(best)) - 1][0]:
                break
            for nb in sorted(adj[cur]):
                if nb < upto and nb not in visited:
                    visited.add(nb)
                    cand = (dist(qi, nb), int(ids[nb]), nb)
                    frontier.append(cand)
                    best.append(cand)
        best.sort()
        return [p for _, _, p in best[:width]]

    def prune(node: int) -> None:
        if len(adj[node]) > m:
            ranked = sorted((dist(node, nb), int(ids[nb]), nb) for nb in adj[node])
            keep = {p for _, _, p in ranked[:m]}
            for drop in adj[node] - keep:
                adj[drop].discard(node)
            adj[node] = keep

    for i in range(1, n):
        for nb in beam(i, upto=i, width=ef)[:m]:
            adj[i].add(nb)
            adj[nb].add(i)
            prune(nb)
        prune(i)

    return ids, mat, [sorted(int(ids[nb]) for nb in adj[i]) for i in range(n)]


def nsw_build(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_shards: int = 8,
    m: int = 8,
    ef_construction: int = 32,
) -> DataFrame:
    """Build the sharded graph: one NSW per shard, no cross-shard edges.

    Returns ``(shard, id, embedding, neighbors array<bigint>)`` — the
    index is self-contained (vectors travel with adjacency, as in any
    serialized graph index), so search needs no join back to the corpus.
    Persist partitioned by ``shard`` for one-task-per-shard search.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
            T.StructField("neighbors", T.ArrayType(T.LongType())),
        ]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        ids, mat, neighbors = _np_build_shard(ids, mat, m=m, ef=ef_construction)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[0],
                id_col: ids,
                vec_col: [r.astype(np.float32) for r in mat],
                "neighbors": neighbors,
            }
        )

    return (
        corpus.select(id_col, vec_col)
        .withColumn("shard", _shard_col(id_col, n_shards))
        .groupBy("shard")
        .applyInPandas(build, schema)
    )


def nsw_search(
    graph: DataFrame,
    query_vec,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scatter-gather beam search: every shard's graph walks toward the
    query independently (one Arrow batch per shard), then a global
    ``orderBy(distance, id) LIMIT k`` merges ``n_shards * k`` candidate
    rows — driver-side work is O(n_shards * k), never corpus-sized.
    """
    import pandas as pd

    q = [float(v) for v in query_vec]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def search(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        order = pdf[id_col].argsort()
        pdf = pdf.iloc[order]
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        nbr_lists = list(pdf["neighbors"])
        pos = {int(v): i for i, v in enumerate(ids)}
        qv = np.array(q, dtype=np.float64)

        def dist(i):
            d = mat[i] - qv
            return float(np.sqrt(np.dot(d, d)))

        entry = 0
        visited = {entry}
        frontier = [(dist(entry), int(ids[entry]), entry)]
        best = list(frontier)
        while frontier:
            frontier.sort()
            d0, _, cur = frontier.pop(0)
            best.sort()
            if len(best) >= ef_search and d0 > best[ef_search - 1][0]:
                break
            for nb_id in nbr_lists[cur]:
                nb = pos[int(nb_id)]
                if nb not in visited:
                    visited.add(nb)
                    cand = (dist(nb), int(ids[nb]), nb)
                    frontier.append(cand)
                    best.append(cand)
        best.sort()
        top = best[: max(k, 1)]
        return pd.DataFrame(
            {id_col: [i for _, i, _ in top], "distance": [d for d, _, _ in top]}
        )

    per_shard = graph.groupBy("shard").applyInPandas(search, schema)
    return (
        per_shard.orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
        .select(id_col, "distance")
    )


def nsw_index_write(graph: DataFrame, path: str) -> None:
    """Persist the sharded graph: parquet partitioned by ``shard`` —
    one directory per sub-index, so a search schedules exactly one
    task per shard directory (the scatter-gather layout the module
    docstring promises).  The expensive part of NSW is the BUILD
    (iterative insert per shard); persisting amortizes it across every
    subsequent query, the same build-once/probe-many contract as the
    IVF / LSH / SQ8 / BM25 index artifacts."""
    graph.write.mode("overwrite").partitionBy("shard").parquet(path)


def nsw_index_search(
    spark,
    path: str,
    query_vec,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Beam search over the persisted graph: read back the shard
    directories (schema identical to ``nsw_build`` output; the
    partition column round-trips as the same int) and run the standard
    scatter-gather walk.  Unlike the IVF probe there is no partition
    PRUNING — every shard walks, by design: NSW shards are independent
    sub-indexes, and the walk inside each touches ``O(ef_search * m)``
    nodes, not the shard."""
    graph = spark.read.parquet(path).withColumn(
        "shard", F.col("shard").cast("int")
    )
    return nsw_search(
        graph, query_vec, k=k, ef_search=ef_search, vec_col=vec_col, id_col=id_col
    )


# --------------------------------------------------------------------------
# Hierarchical layer (HNSW-class, round 7 — VERDICT r6 engine-depth item).
# Same sharded deployment shape as the single-layer NSW above; within a
# shard, nodes draw a deterministic geometric level from a stable md5 of
# their id (P(level >= l) = m_level^-l, the Malkov-Yashunin ladder), each
# layer >= 1 is a sparser NSW over its members, and a search greedily
# descends from the top layer's entry before running the full beam on
# layer 0 — the hierarchy replaces the fixed min-id entry point with one
# already near the query, cutting layer-0 hops on large shards.
# Determinism is preserved end to end: levels are pure id hashes, every
# layer inserts in id order with (distance, id) tie-breaks, the global
# entry is (max level, min id).
# --------------------------------------------------------------------------


def _hnsw_level(id_: int, max_level: int, m_level: int) -> int:
    """Deterministic geometric level from a stable md5 of the id."""
    import hashlib
    import math

    h = int.from_bytes(hashlib.md5(f"hnsw§{id_}".encode()).digest()[:8], "big")
    u = (h + 1) / 2.0**64
    return min(int(-math.log(u) / math.log(m_level)), max_level)


def _np_build_hnsw(ids, mat, m: int, ef: int, max_level: int, m_level: int):
    """Per-shard hierarchical build: one NSW insert loop per layer over
    that layer's members (id order, (distance, id) ties)."""
    import numpy as np

    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n = len(ids)
    levels = [_hnsw_level(int(ids[i]), max_level, m_level) for i in range(n)]
    # adj[layer][pos] -> set of positions (only for pos with level >= layer)
    adj: list[dict[int, set[int]]] = [dict() for _ in range(max_level + 1)]

    def dist(i, j):
        d = mat[i] - mat[j]
        return float(np.sqrt(np.dot(d, d)))

    for layer in range(max_level + 1):
        members = [i for i in range(n) if levels[i] >= layer]
        graph = adj[layer]
        for i in members:
            graph[i] = set()
        if not members:
            continue

        def beam(qi: int, inserted: list[int], width: int) -> list[int]:
            entry = inserted[0]  # min id among inserted members
            visited = {entry}
            frontier = [(dist(qi, entry), int(ids[entry]), entry)]
            best = list(frontier)
            while frontier:
                frontier.sort()
                d0, _, cur = frontier.pop(0)
                best.sort()
                if len(best) >= width and d0 > best[min(width, len(best)) - 1][0]:
                    break
                for nb in sorted(graph[cur]):
                    if nb not in visited:
                        visited.add(nb)
                        cand = (dist(qi, nb), int(ids[nb]), nb)
                        frontier.append(cand)
                        best.append(cand)
            best.sort()
            return [p for _, _, p in best[:width]]

        def prune(node: int) -> None:
            if len(graph[node]) > m:
                ranked = sorted(
                    (dist(node, nb), int(ids[nb]), nb) for nb in graph[node]
                )
                keep = {p for _, _, p in ranked[:m]}
                for drop in graph[node] - keep:
                    graph[drop].discard(node)
                graph[node] = keep

        for k_i in range(1, len(members)):
            i = members[k_i]
            for nb in beam(i, members[:k_i], ef)[:m]:
                graph[i].add(nb)
                graph[nb].add(i)
                prune(nb)
            prune(i)

    neighbors_by_layer = [
        [
            sorted(int(ids[nb]) for nb in adj[layer][i])
            for layer in range(levels[i] + 1)
        ]
        for i in range(n)
    ]
    return ids, mat, levels, neighbors_by_layer


def hnsw_build(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_shards: int = 8,
    m: int = 8,
    ef_construction: int = 32,
    max_level: int = 3,
    m_level: int = 4,
) -> DataFrame:
    """Build the sharded hierarchical graph.  Output adds ``level`` and
    nests adjacency per layer (``neighbors array<array<bigint>>``,
    index = layer); persist partitioned by ``shard`` exactly like the
    flat NSW artifact."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
            T.StructField("level", T.IntegerType()),
            T.StructField("neighbors", T.ArrayType(T.ArrayType(T.LongType()))),
        ]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        ids, mat, levels, nbl = _np_build_hnsw(
            ids, mat, m=m, ef=ef_construction,
            max_level=max_level, m_level=m_level,
        )
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[0],
                id_col: ids,
                vec_col: [r.astype(np.float32) for r in mat],
                "level": levels,
                "neighbors": nbl,
            }
        )

    return (
        corpus.select(id_col, vec_col)
        .withColumn("shard", _shard_col(id_col, n_shards))
        .groupBy("shard")
        .applyInPandas(build, schema)
    )


def hnsw_search(
    graph: DataFrame,
    query_vec,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scatter-gather hierarchical walk: per shard, greedy-descend the
    upper layers from the (max level, min id) entry, then run the
    layer-0 beam from the descended entry; global merge unchanged."""
    import pandas as pd

    q = [float(v) for v in query_vec]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def search(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        order = pdf[id_col].argsort()
        pdf = pdf.iloc[order]
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        levels = pdf["level"].to_numpy(dtype=np.int64)
        nbr_layers = list(pdf["neighbors"])
        pos = {int(v): i for i, v in enumerate(ids)}
        qv = np.array(q, dtype=np.float64)

        def dist(i):
            d = mat[i] - qv
            return float(np.sqrt(np.dot(d, d)))

        # entry: max level, then min id (ids are sorted -> first argmax)
        top = int(levels.max())
        cur = int(np.flatnonzero(levels == top)[0])
        # greedy descent through layers top..1
        for layer in range(top, 0, -1):
            improved = True
            while improved:
                improved = False
                here = (dist(cur), int(ids[cur]))
                for nb_id in nbr_layers[cur][layer]:
                    nb = pos[int(nb_id)]
                    cand = (dist(nb), int(ids[nb]))
                    if cand < here:
                        here, cur, improved = cand, nb, True
        # layer-0 beam from the descended entry
        visited = {cur}
        frontier = [(dist(cur), int(ids[cur]), cur)]
        best = list(frontier)
        while frontier:
            frontier.sort()
            d0, _, c = frontier.pop(0)
            best.sort()
            if len(best) >= ef_search and d0 > best[ef_search - 1][0]:
                break
            for nb_id in nbr_layers[c][0]:
                nb = pos[int(nb_id)]
                if nb not in visited:
                    visited.add(nb)
                    cand = (dist(nb), int(ids[nb]), nb)
                    frontier.append(cand)
                    best.append(cand)
        best.sort()
        topk = best[: max(k, 1)]
        return pd.DataFrame(
            {id_col: [i for _, i, _ in topk], "distance": [d for d, _, _ in topk]}
        )

    per_shard = graph.groupBy("shard").applyInPandas(search, schema)
    return (
        per_shard.orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
        .select(id_col, "distance")
    )


def hnsw_index_search(
    spark,
    path: str,
    query_vec,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hierarchical walk over a persisted graph (write with
    :func:`nsw_index_write` — the artifact layout is shared)."""
    graph = spark.read.parquet(path).withColumn(
        "shard", F.col("shard").cast("int")
    )
    return hnsw_search(
        graph, query_vec, k=k, ef_search=ef_search, vec_col=vec_col, id_col=id_col
    )


def hnsw_search_join(
    graph: DataFrame,
    queries,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batched hierarchical search: N queries against every shard in
    ONE ``applyInPandas`` pass — the shard's vectors and adjacency are
    deserialized once and all queries walk them, instead of N separate
    jobs.  ``queries`` is a DataFrame (query_id, query_vec); it is
    collected to the closure (bounded by the query batch — the same
    data movement broadcasting the batch performs).  Output:
    ``(query_id, rank, vec_id, distance)`` per query after the global
    per-query merge (a partitioned window over n_shards * k rows per
    query, never corpus-sized)."""
    import pandas as pd
    from pyspark.sql import Window

    from .knn import collect_query_batch

    qrows = collect_query_batch(queries, [query_id_col, query_vec_col])
    qlist = [(r[query_id_col], [float(v) for v in r[query_vec_col]]) for r in qrows]
    schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def search(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        order = pdf[id_col].argsort()
        pdf = pdf.iloc[order]
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        levels = pdf["level"].to_numpy(dtype=np.int64)
        nbr_layers = list(pdf["neighbors"])
        pos = {int(v): i for i, v in enumerate(ids)}
        top = int(levels.max())
        entry0 = int(np.flatnonzero(levels == top)[0])

        out_q, out_i, out_d = [], [], []
        for qid, q in qlist:
            qv = np.array(q, dtype=np.float64)

            def dist(i):
                d = mat[i] - qv
                return float(np.sqrt(np.dot(d, d)))

            cur = entry0
            for layer in range(top, 0, -1):
                improved = True
                while improved:
                    improved = False
                    here = (dist(cur), int(ids[cur]))
                    for nb_id in nbr_layers[cur][layer]:
                        nb = pos[int(nb_id)]
                        cand = (dist(nb), int(ids[nb]))
                        if cand < here:
                            here, cur, improved = cand, nb, True
            visited = {cur}
            frontier = [(dist(cur), int(ids[cur]), cur)]
            best = list(frontier)
            while frontier:
                frontier.sort()
                d0, _, c = frontier.pop(0)
                best.sort()
                if len(best) >= ef_search and d0 > best[ef_search - 1][0]:
                    break
                for nb_id in nbr_layers[c][0]:
                    nb = pos[int(nb_id)]
                    if nb not in visited:
                        visited.add(nb)
                        cand = (dist(nb), int(ids[nb]), nb)
                        frontier.append(cand)
                        best.append(cand)
            best.sort()
            for d, i, _ in best[: max(k, 1)]:
                out_q.append(qid)
                out_i.append(i)
                out_d.append(d)
        return pd.DataFrame(
            {query_id_col: out_q, id_col: out_i, "distance": out_d}
        )

    per_shard = graph.groupBy("shard").applyInPandas(search, schema)
    w = Window.partitionBy(query_id_col).orderBy("distance", id_col)
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "distance")
    )


# --------------------------------------------------------------------------
# Graph maintenance (round 8 — VERDICT r7 #5).  The IVF/IVF-PQ/BM25
# trees get batch-keyed appends, tombstones and compaction from
# operators/index_maint.py; a graph index needs its own discipline
# because deleting a node breaks adjacency (it may be a navigation
# waypoint) and inserting one out of id order changes the deterministic
# build.  The classic LSM-for-ANN shape fits both constraints:
#
# * deletes   -> tombstone markers (shared _tombstones layout).  The
#   walk still TRAVERSES dead nodes (connectivity preserved) but they
#   are excluded from the beam's result accounting — mark-delete, as in
#   FAISS/hnswlib.
# * appends   -> a FLAT delta buffer under batch_id>=1 (no adjacency).
#   Searches exact-scan the buffer (it is micro-batch sized) and merge
#   with the graph walk; an id re-appended supersedes its graph version
#   (the index_maint LWW law, global because every shard walks).
# * compact   -> rebuild ONLY the dirty shards (shards with dead,
#   superseded, or buffered rows) from their surviving members; clean
#   shards copy through untouched.  Because shard membership is a pure
#   id hash and the per-shard build inserts in id order with pinned
#   tie-breaks, the compacted tree is BIT-IDENTICAL to a fresh build
#   over the surviving corpus — the hash-match contract
#   (`ann_hnsw_index_compact`) holds by construction, and compaction
#   cost tracks the dirty shards, not the index.
# --------------------------------------------------------------------------


def hnsw_index_write_maint(graph: DataFrame, path: str) -> None:
    """Persist a (H)NSW graph into the maintenance layout:
    ``batch_id=0/shard=N/`` — same tree law as the IVF family, so the
    shared tombstone/append/batch primitives apply."""
    from .index_maint import write_bulk

    write_bulk(graph, path, "shard")


def hnsw_index_delete(
    ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    batch_id: int | None = None,
) -> None:
    """Tombstone nodes out of a persisted graph (shared marker layout;
    bounded write).  The graph keeps traversing through them until
    :func:`hnsw_index_compact` reclaims the shard."""
    from .index_maint import write_tombstones

    write_tombstones(ids, path, id_col, batch_id=batch_id)


def hnsw_index_append(
    new_vectors: DataFrame,
    path: str,
    n_shards: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_id: int | None = None,
) -> None:
    """Append vectors as FLAT delta rows (shard assigned by the same id
    hash as the build; ``level``/``neighbors`` null — no adjacency is
    built online).  Searches exact-scan the buffer; compaction folds it
    into the graph.  With a foreachBatch ``batch_id`` the write is the
    idempotent dynamic-partition overwrite of the shared layer."""
    from .index_maint import append_batch

    delta = (
        new_vectors.select(id_col, vec_col)
        .withColumn("shard", _shard_col(id_col, n_shards))
        .withColumn("level", F.lit(None).cast("int"))
        .withColumn(
            "neighbors", F.lit(None).cast(T.ArrayType(T.ArrayType(T.LongType())))
        )
        .select("shard", id_col, vec_col, "level", "neighbors")
    )
    append_batch(delta, path, "shard", batch_id=batch_id)


def _hnsw_maint_relation(spark, path: str, id_col: str):
    """The annotated per-row relation of a maintained graph tree:
    ``(shard, id, vec, level, neighbors, _kind, _dead)`` where ``_kind``
    0 = graph row (walk it), 1 = visible delta row (exact-scan it), and
    ``_dead`` marks graph rows excluded from results (tombstoned or
    superseded) but still traversable.  Clean trees return the plain
    batch-0 relation with constant flags — no extra scan, no shuffle."""
    from .index_maint import BATCH_COL, index_state, read_tombstones

    batches, has_tombs = index_state(spark, path)
    df = spark.read.parquet(path)
    if len(batches) <= 1 and not has_tombs:
        return (
            df.drop(BATCH_COL)
            .withColumn("_kind", F.lit(0))
            .withColumn("_dead", F.lit(False))
        )

    tombs = read_tombstones(spark, path, id_col) if has_tombs else None
    dead_at = (
        tombs.groupBy(id_col).agg(F.max(BATCH_COL).alias("_dead_at"))
        if tombs is not None
        else None
    )
    sup = (
        df.filter(F.col(BATCH_COL) >= 1)
        .groupBy(id_col)
        .agg(F.max(F.col(BATCH_COL).cast("long")).alias("_g_max"))
    )

    base = df.filter(F.col(BATCH_COL) == 0)
    # graph rows: dead when tombstoned (any marker hides batch 0) or
    # superseded by a delta append — still walked, never returned
    base = base.join(F.broadcast(sup), id_col, "left")
    if dead_at is not None:
        base = base.join(F.broadcast(dead_at), id_col, "left")
    else:
        base = base.withColumn("_dead_at", F.lit(None).cast("long"))
    base = base.select(
        "shard", id_col, *[c for c in ("embedding", "level", "neighbors") if c in df.columns],
        F.lit(0).alias("_kind"),
        (F.col("_g_max").isNotNull() | F.col("_dead_at").isNotNull()).alias("_dead"),
    )

    # delta rows: LWW within the buffer, tombstone law against their
    # own batch (a marker at T >= b hides the version at b)
    delta = df.filter(F.col(BATCH_COL) >= 1).join(F.broadcast(sup), id_col)
    delta = delta.filter(F.col(BATCH_COL) == F.col("_g_max"))
    if dead_at is not None:
        delta = delta.join(F.broadcast(dead_at), id_col, "left").filter(
            F.col("_dead_at").isNull() | (F.col(BATCH_COL) > F.col("_dead_at"))
        )
    delta = delta.select(
        "shard", id_col, *[c for c in ("embedding", "level", "neighbors") if c in df.columns],
        F.lit(1).alias("_kind"),
        F.lit(False).alias("_dead"),
    )
    return base.unionByName(delta)


def hnsw_maint_search(
    spark,
    path: str,
    query_vec,
    k: int = 5,
    ef_search: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search a maintained graph tree: hierarchical walk of the graph
    rows (traversing through dead nodes, excluding them from results)
    merged with an exact scan of the visible delta buffer, all inside
    the same per-shard pandas pass so every distance comes from the
    identical numpy expression.  On a clean tree this degenerates to
    exactly :func:`hnsw_search`'s walk."""
    import pandas as pd

    q = [float(v) for v in query_vec]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def search(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        qv = np.array(q, dtype=np.float64)

        def d_of(vec) -> float:
            d = np.asarray(vec, dtype=np.float64) - qv
            return float(np.sqrt(np.dot(d, d)))

        cand: list[tuple[float, int]] = []

        graph = pdf[pdf["_kind"] == 0]
        if len(graph):
            order = graph[id_col].argsort()
            graph = graph.iloc[order]
            ids = graph[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(graph[vec_col]), dtype=np.float64)
            levels = graph["level"].to_numpy(dtype=np.int64)
            dead = graph["_dead"].to_numpy(dtype=bool)
            nbr_layers = list(graph["neighbors"])
            pos = {int(v): i for i, v in enumerate(ids)}

            def dist(i):
                d = mat[i] - qv
                return float(np.sqrt(np.dot(d, d)))

            top = int(levels.max())
            cur = int(np.flatnonzero(levels == top)[0])
            for layer in range(top, 0, -1):
                improved = True
                while improved:
                    improved = False
                    here = (dist(cur), int(ids[cur]))
                    for nb_id in nbr_layers[cur][layer]:
                        nb = pos[int(nb_id)]
                        c = (dist(nb), int(ids[nb]))
                        if c < here:
                            here, cur, improved = c, nb, True
            visited = {cur}
            frontier = [(dist(cur), int(ids[cur]), cur)]
            best = [t for t in frontier if not dead[t[2]]]
            while frontier:
                frontier.sort()
                d0, _, c = frontier.pop(0)
                best.sort()
                if len(best) >= ef_search and d0 > best[ef_search - 1][0]:
                    break
                for nb_id in nbr_layers[c][0]:
                    nb = pos[int(nb_id)]
                    if nb not in visited:
                        visited.add(nb)
                        t = (dist(nb), int(ids[nb]), nb)
                        frontier.append(t)
                        if not dead[nb]:
                            best.append(t)
            best.sort()
            cand.extend((d, i) for d, i, _ in best[: max(k, 1)])

        delta = pdf[pdf["_kind"] == 1]
        for _, row in delta.iterrows():
            cand.append((d_of(row[vec_col]), int(row[id_col])))

        cand.sort()
        top = cand[: max(k, 1)]
        return pd.DataFrame(
            {id_col: [i for _, i in top], "distance": [d for d, _ in top]}
        )

    rel = _hnsw_maint_relation(spark, path, id_col)
    per_shard = rel.groupBy("shard").applyInPandas(search, schema)
    return (
        per_shard.orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
        .select(id_col, "distance")
    )


def hnsw_index_compact(
    spark,
    src_path: str,
    dest_path: str,
    n_shards: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ef_construction: int = 32,
    max_level: int = 3,
    m_level: int = 4,
) -> None:
    """Fold a maintained graph tree to a clean ``batch_id=0`` level at a
    NEW path, rebuilding ONLY the dirty shards.

    A shard is dirty when it holds a dead graph row (tombstoned or
    superseded) or any delta row; its surviving members rebuild through
    the same deterministic per-shard insert as :func:`hnsw_build`, so
    the result is bit-identical to a fresh build over the surviving
    corpus — clean shards copy through without touching their adjacency
    (their membership is a pure id hash, unchanged by other shards'
    edits).  Build params MUST match the original build's."""
    from .index_maint import write_bulk

    if src_path == dest_path:
        raise ValueError("compact writes to a new path; swap after validation")

    rel = _hnsw_maint_relation(spark, src_path, id_col)
    dirty = rel.filter(F.col("_dead") | (F.col("_kind") == 1)).select(
        "shard"
    ).distinct()
    dirty_ids = [r["shard"] for r in dirty.collect()]  # bounded by n_shards

    clean_rows = rel.filter(
        ~F.col("shard").isin(dirty_ids) if dirty_ids else F.lit(True)
    ).select("shard", id_col, vec_col, "level", "neighbors")

    if dirty_ids:
        survivors = rel.filter(
            F.col("shard").isin(dirty_ids) & ~F.col("_dead")
        ).select(id_col, vec_col)
        rebuilt = hnsw_build(
            survivors, vec_col=vec_col, id_col=id_col, n_shards=n_shards,
            m=m, ef_construction=ef_construction,
            max_level=max_level, m_level=m_level,
        )
        out = clean_rows.unionByName(rebuilt)
    else:
        out = clean_rows
    write_bulk(out, dest_path, "shard")
