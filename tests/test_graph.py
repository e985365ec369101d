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
