"""Fixed-point PageRank: hand-computed tiny graph, python-reference
parity, determinism across partitionings, and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
    UNIT,
    pagerank,
)


def _py_pagerank(edges, n_iters=5, d_pct=85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: UNIT // n for v in nodes}
    base = ((100 - d_pct) * UNIT) // (100 * n)
    for _ in range(n_iters):
        incoming = {v: 0 for v in nodes}
        for u, v in edges:
            incoming[v] += r[u] // out[u]
        r = {v: base + (d_pct * incoming[v]) // 100 for v in nodes}
    return r


@pytest.fixture(scope="module")
def chain_edges(spark):
    # 1 -> 2 -> 3 -> 1 plus 4 -> 1: a cycle with a feeder
    rows = [(1, 2), (2, 3), (3, 1), (4, 1)]
    return rows, spark.createDataFrame(rows, "src long, dst long")


class TestPagerank:
    def test_matches_python_reference(self, chain_edges):
        rows, df = chain_edges
        got = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=5).collect()}
        assert got == _py_pagerank(rows, n_iters=5)

    def test_zero_iters_is_uniform(self, chain_edges):
        _, df = chain_edges
        got = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=0).collect()}
        assert got == {v: UNIT // 4 for v in (1, 2, 3, 4)}

    def test_sink_feeder_ordering(self, chain_edges):
        # feeder 4 has no in-edges: base rank only, strictly the lowest;
        # every cycle member keeps more mass than the feeder
        _, df = chain_edges
        got = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=5).collect()}
        assert got[4] == min(got.values())
        assert got[4] == ((100 - 85) * UNIT) // (100 * 4)
        assert all(got[v] > got[4] for v in (1, 2, 3))

    def test_partitioning_invariant(self, spark, chain_edges):
        rows, df = chain_edges
        want = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=4).collect()}
        shuffled = df.repartition(7, "dst")
        got = {r["node"]: r["rank_units"] for r in pagerank(shuffled, n_iters=4).collect()}
        assert got == want  # integer arithmetic: bit-identical

    def test_larger_graph_reference_parity(self, spark):
        # pseudo-random deterministic digraph, 60 nodes / 240 edges
        rows = sorted({((i * 37) % 60, (i * 53 + 11) % 60) for i in range(300)} - {(v, v) for v in range(60)})
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=5).collect()}
        assert got == _py_pagerank(rows, n_iters=5)

    def test_rejects_bad_args(self, chain_edges):
        _, df = chain_edges
        with pytest.raises(ValueError):
            pagerank(df, damping_pct=120)
        with pytest.raises(ValueError):
            pagerank(df, n_iters=-1)


def _py_pagerank_dangling(edges, n_iters=5, d_pct=85):
    """Python reference for dangling='redistribute': each step adds
    floor(d * D / (100 n)) where D = sum of dangling nodes' rank."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: UNIT // n for v in nodes}
    base = ((100 - d_pct) * UNIT) // (100 * n)
    for _ in range(n_iters):
        dm = sum(r[v] for v in nodes if v not in out)
        extra = (d_pct * dm) // (100 * n)
        incoming = {v: 0 for v in nodes}
        for u, v in edges:
            incoming[v] += r[u] // out[u]
        r = {v: base + (d_pct * incoming[v]) // 100 + extra for v in nodes}
    return r


class TestPagerankDangling:
    # 1 -> 2 -> 3, 1 -> 3: node 3 is dangling (no out-edges)
    EDGES = [(1, 2), (2, 3), (1, 3)]

    def _df(self, spark):
        return spark.createDataFrame(self.EDGES, "src long, dst long")

    def test_matches_python_reference(self, spark):
        got = {
            r["node"]: r["rank_units"]
            for r in pagerank(
                self._df(spark), n_iters=5, dangling="redistribute"
            ).collect()
        }
        assert got == _py_pagerank_dangling(self.EDGES, n_iters=5)

    def test_conserves_more_mass_than_drop(self, spark):
        df = self._df(spark)
        drop = sum(
            r["rank_units"] for r in pagerank(df, n_iters=5).collect()
        )
        redist = sum(
            r["rank_units"]
            for r in pagerank(df, n_iters=5, dangling="redistribute").collect()
        )
        # dropped dangling mass leaks ~d*D per step; redistribution keeps
        # total mass within floor-loss of UNIT
        assert redist > drop
        assert UNIT - redist < 100  # only floor losses remain

    def test_no_dangling_nodes_is_identical_to_drop(self, spark, chain_edges):
        # every node in the cycle+feeder graph that LACKS out-edges? none
        # (4->1, cycle 1-2-3): redistribute must be a no-op
        rows = [(1, 2), (2, 3), (3, 1), (4, 1), (1, 4)]
        df = spark.createDataFrame(rows, "src long, dst long")
        a = {r["node"]: r["rank_units"] for r in pagerank(df, n_iters=4).collect()}
        b = {
            r["node"]: r["rank_units"]
            for r in pagerank(df, n_iters=4, dangling="redistribute").collect()
        }
        assert a == b

    def test_partitioning_invariant(self, spark):
        rows = sorted({((i * 37) % 40, (i * 53 + 11) % 40) for i in range(150)} - {(v, v) for v in range(40)})
        df = spark.createDataFrame(rows, "src long, dst long")
        want = {
            r["node"]: r["rank_units"]
            for r in pagerank(df, n_iters=4, dangling="redistribute").collect()
        }
        got = {
            r["node"]: r["rank_units"]
            for r in pagerank(
                df.repartition(7, "dst"), n_iters=4, dangling="redistribute"
            ).collect()
        }
        assert got == want

    def test_rejects_bad_dangling(self, spark):
        with pytest.raises(ValueError, match="dangling"):
            pagerank(self._df(spark), dangling="teleport")


class TestTriangles:
    """Exact triangle counting (operators/graph.py::triangle_stats):
    hand-built graphs with known counts, skew-orientation invariant."""

    def _stats(self, spark, edge_list):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            triangle_stats,
        )

        e = spark.createDataFrame(edge_list, "u long, v long")
        return triangle_stats(e).first()

    def test_single_triangle(self, spark):
        r = self._stats(spark, [(1, 2), (1, 3), (2, 3)])
        assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (3, 3, 1)
        assert r["global_clustering"] == 1.0

    def test_k4_has_four_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        r = self._stats(spark, k4)
        assert r["n_triangles"] == 4
        assert r["n_wedges"] == 12  # 4 vertices * C(3,2)
        assert r["global_clustering"] == 1.0

    def test_star_has_no_triangles(self, spark):
        """The 'curse of the last reducer' shape: a hub with many
        spokes.  Degree orientation points every edge INTO the hub, so
        no wedge is ever generated there."""
        star = [(0, i) for i in range(1, 40)]
        r = self._stats(spark, star)
        assert r["n_triangles"] == 0
        assert r["n_wedges"] == 39 * 38 // 2

    def test_square_with_diagonal(self, spark):
        # C4 + one diagonal: exactly 2 triangles
        r = self._stats(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
        assert r["n_triangles"] == 2

    def test_matches_numpy_reference_on_random_graph(self, spark):
        import itertools

        # deterministic pseudo-random graph via a fixed LCG
        seed, edges = 12345, set()
        for _ in range(260):
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            a = seed % 25
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            b = seed % 25
            if a != b:
                edges.add((min(a, b), max(a, b)))
        adj = {n: set() for n in range(25)}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        want = sum(
            1
            for a, b, c in itertools.combinations(range(25), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        r = self._stats(spark, sorted(edges))
        assert r["n_triangles"] == want > 0

    def test_copurchase_edges_distinct_and_ordered(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            copurchase_edges,
        )
        from pyspark.sql import functions as F2

        li = spark.createDataFrame(
            [(1, 10), (1, 20), (1, 10), (2, 20), (2, 10), (3, 30)],
            "l_orderkey long, l_partkey long",
        )
        got = {(r["u"], r["v"]) for r in copurchase_edges(li).collect()}
        assert got == {(10, 20)}  # dup rows + both orders collapse
        assert copurchase_edges(li).filter(F2.col("u") >= F2.col("v")).count() == 0


def _py_components(edges):
    """Union-find ground truth: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


class TestConnectedComponents:
    def test_paths_and_isolated_clusters(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)]
        df = spark.createDataFrame(edges, "u long, v long")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == _py_components(edges)

    def test_random_graph_matches_union_find(self, spark):
        import random

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        rng = random.Random(42)
        edges = list({(rng.randrange(200), rng.randrange(200)) for _ in range(150)})
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "u long, v long")
        got = {r["node"]: r["component"] for r in connected_components(df, rounds=6).collect()}
        assert got == _py_components(edges)

    def test_orientation_and_duplicates_irrelevant(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        df = spark.createDataFrame(
            [(2, 1), (1, 2), (2, 3), (3, 3)], "u long, v long"
        )
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_self_loop_only_nodes_get_size_one_components(self, spark):
        """ADVICE r8: a node whose ONLY edges are self-loops is still
        'incident to an edge' and must be labeled (its own size-1
        component), not silently dropped at the u != v filter."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        df = spark.createDataFrame(
            [(1, 2), (7, 7), (2, 2)], "u long, v long"
        )
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        # 7 is self-loop-only -> size-1 component; 2 also has a real edge
        assert got == {1: 1, 2: 1, 7: 7}

    def test_self_loops_false_matches_on_simple_graph(self, spark):
        """self_loops=False (r10: the caller-asserted fast path that
        skips the weave + shared checkpoint) must label a simple graph
        identically to the default."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
        df = spark.createDataFrame(edges, "u long, v long")
        want = {r["node"]: r["component"] for r in connected_components(df).collect()}
        got = {r["node"]: r["component"]
               for r in connected_components(df, self_loops=False).collect()}
        assert got == want == _py_components(edges)

    def test_non_convergence_raises(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            connected_components,
        )

        # A 64-node path cannot collapse in one round; the star assert
        # must refuse the partial labeling rather than return it.
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "u long, v long"
        )
        with pytest.raises(RuntimeError, match="not converged"):
            connected_components(df, rounds=1)


class TestBfsLevels:
    def _run(self, spark, edges, seeds, hops=3):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            bfs_levels,
        )

        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return {r["node"]: r["hop"] for r in bfs_levels(e, s, max_hops=hops).collect()}

    def test_min_hop_on_diamond(self, spark):
        # 1->2->4 and 1->3->4 plus a long way 1->5->6->4: node 4 is hop 2
        edges = [(1, 2), (2, 4), (1, 3), (3, 4), (1, 5), (5, 6), (6, 4)]
        got = self._run(spark, edges, [1])
        assert got == {1: 0, 2: 1, 3: 1, 5: 1, 4: 2, 6: 2}

    def test_directed_and_bounded(self, spark):
        # edges point INTO the seed: nothing reachable; and hop cap trims
        got = self._run(spark, [(2, 1), (3, 2)], [1], hops=2)
        assert got == {1: 0}
        chain = [(i, i + 1) for i in range(6)]
        got2 = self._run(spark, chain, [0], hops=2)
        assert got2 == {0: 0, 1: 1, 2: 2}

    def test_multi_seed_min(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (9, 3)], [1, 9], hops=3)
        assert got[3] == 1  # via seed 9, not hop 2 via seed 1


class TestLabelPropagation:
    def _run(self, spark, edges, seeds, iters=2):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            label_propagation,
        )

        e = spark.createDataFrame(edges, "u long, v long")
        s = spark.createDataFrame(seeds, "node long, label string")
        return {r["node"]: r["label"] for r in label_propagation(e, s, iters=iters).collect()}

    def test_two_camp_path(self, spark):
        # A(1) - 2 - 3 - 4 - B(5): one round labels 2 and 4; two rounds
        # reach 3, which sees both camps -> lexicographic tiebreak 'A'
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        seeds = [(1, "A"), (5, "B")]
        got = self._run(spark, edges, seeds)
        assert got[2] == "A" and got[4] == "B" and got[3] == "A"

    def test_seeds_clamped_and_majority(self, spark):
        # seed 1 is surrounded by B-labeled majority but must stay A;
        # node 10 has two B neighbors and one A -> B
        edges = [(1, 2), (1, 3), (10, 2), (10, 3), (10, 1)]
        seeds = [(1, "A"), (2, "B"), (3, "B")]
        got = self._run(spark, edges, seeds, iters=1)
        assert got[1] == "A"
        assert got[10] == "B"

    def test_unreached_stay_unlabeled(self, spark):
        got = self._run(spark, [(1, 2), (8, 9)], [(1, "A")], iters=2)
        assert 8 not in got and 9 not in got and got[2] == "A"

    def test_conflicting_seeds_collapse_deterministically(self, spark):
        got = self._run(spark, [(1, 2)], [(1, "B"), (1, "A")], iters=1)
        assert got[1] == "A" and got[2] == "A"


def _py_ppr(edges, seeds, n_iters=4, d_pct=85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(seeds))
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    ns = len(set(seeds))
    r = {v: (UNIT // ns if v in seeds else 0) for v in nodes}
    base = ((100 - d_pct) * UNIT) // (100 * ns)
    for _ in range(n_iters):
        incoming = {v: 0 for v in nodes}
        for u, v in edges:
            incoming[v] += r[u] // out[u]
        r = {
            v: (base if v in seeds else 0) + (d_pct * incoming[v]) // 100
            for v in nodes
        }
    return r


class TestPersonalizedPagerank:
    def test_matches_python_reference(self, spark, chain_edges):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            personalized_pagerank,
        )

        rows, df = chain_edges
        seeds = spark.createDataFrame([(4,)], "node long")
        got = {
            r["node"]: r["rank_units"]
            for r in personalized_pagerank(df.selectExpr("src", "dst"), seeds, n_iters=4).collect()
        }
        assert got == _py_ppr(rows, {4}, n_iters=4)

    def test_mass_concentrates_near_seed(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            personalized_pagerank,
        )

        # two disconnected cliques; seed in one -> other stays at 0
        edges = [(1, 2), (2, 1), (10, 11), (11, 10)]
        e = spark.createDataFrame(edges, "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r["node"]: r["rank_units"] for r in personalized_pagerank(e, seeds, n_iters=3).collect()}
        assert got[10] == 0 and got[11] == 0
        assert got[1] > 0 and got[2] > 0


class TestLinkPredictionJaccard:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "u long, v long")

    def test_square_predicts_diagonals(self, spark):
        # cycle 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) each share
        # exactly 2 common neighbors; jaccard = 2/(2+2-2) = 1.0
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            link_prediction_jaccard,
        )

        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
        rows = link_prediction_jaccard(e, 64, 10).collect()
        got = {(r.u, r.w): (r.cn, r.jaccard_ppm) for r in rows}
        assert got == {(1, 3): (2, 1_000_000), (2, 4): (2, 1_000_000)}

    def test_adjacent_pairs_never_predicted(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            link_prediction_jaccard,
        )

        # triangle + pendant: every pair of 1,2,3 is adjacent; only
        # (1,4)? no — 4 attaches to 3; candidates sharing a neighbor:
        # (1,4) via 3, (2,4) via 3.
        e = self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        rows = link_prediction_jaccard(e, 64, 10).collect()
        pairs = {(r.u, r.w) for r in rows}
        assert pairs == {(1, 4), (2, 4)}

    def test_hub_cap_suppresses_center(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            link_prediction_jaccard,
        )

        # star: hub 0 connected to 1..9 — every leaf pair shares hub 0.
        e = self._edges(spark, [(0, i) for i in range(1, 10)])
        with_hub = link_prediction_jaccard(e, 64, 100).collect()
        assert len(with_hub) == 9 * 8 // 2
        capped = link_prediction_jaccard(e, 5, 100).collect()
        assert capped == []  # the only wedge center is the hub

    def test_true_degrees_survive_capping(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            link_prediction_jaccard,
        )

        # path 1-2-3 plus extra edges on 1: cap high enough to keep
        # center 2, check deg_u reports 1's TRUE degree (3)
        e = self._edges(spark, [(1, 2), (2, 3), (1, 8), (1, 9)])
        rows = {
            (r.u, r.w): r
            for r in link_prediction_jaccard(e, 64, 100).collect()
        }
        r13 = rows[(1, 3)]
        assert r13.deg_u == 3 and r13.deg_w == 1
        assert r13.jaccard_ppm == 1_000_000 // 3


class TestModularityEntry:
    def test_fixture_identity_and_bounds(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["graph_modularity_labelprop"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert -1_000_000 <= r.q_ppm <= 1_000_000
        assert 0 <= r.intra_edges <= r.n_edges
        assert r.n_communities >= 1


class TestHashWalks:
    def test_walks_follow_edges_and_are_deterministic(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            hash_walks,
        )

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)], "u long, v long"
        )
        adj = {1: {2, 4}, 2: {1, 3, 4}, 3: {2, 4}, 4: {1, 2, 3}}
        out = {r.start: r.path for r in hash_walks(e, 3).collect()}
        assert set(out) == {1, 2, 3, 4}
        for start, path in out.items():
            hops = [int(x) for x in path.split("->")]
            assert hops[0] == start and len(hops) == 4
            for a, b in zip(hops, hops[1:]):
                assert b in adj[a], path
        # repartitioning must not change a single walk
        again = {r.start: r.path for r in hash_walks(e.repartition(5), 3).collect()}
        assert again == out

    def test_rejects_bad_steps(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            hash_walks,
        )

        with _pt.raises(ValueError):
            hash_walks(spark.createDataFrame([(1, 2)], "u long, v long"), 0)

    def test_broadcast_and_sortmerge_branches_identical(self, spark):
        # r14: the frontier-broadcast guard picks a JOIN STRATEGY only;
        # both branches must produce byte-identical walk corpora.
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
            hash_walks,
        )

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4), (4, 5), (5, 1)],
            "u long, v long",
        )
        bc = {
            r.start: r.path
            for r in hash_walks(e, 4, broadcast_frontier=True).collect()
        }
        smj = {
            r.start: r.path
            for r in hash_walks(e, 4, broadcast_frontier=False).collect()
        }
        assert bc == smj and set(bc) == {1, 2, 3, 4, 5}
