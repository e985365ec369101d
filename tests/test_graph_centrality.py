"""HITS and k-core: python-reference parity on hand graphs, fixpoint
behavior, partitioning independence, and argument/convergence guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
    UNIT,
    hits,
    kcore,
)


def _py_hits(edges, n_iters):
    nodes = sorted({u for e in edges for u in e})
    hub = {n: UNIT for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(n_iters):
        araw = {n: sum(hub[u] for u, v in edges if v == n) for n in nodes}
        tot = sum(araw.values())
        auth = {n: araw[n] * UNIT // tot for n in nodes}
        hraw = {n: sum(auth[v] for u, v in edges if u == n) for n in nodes}
        tot = sum(hraw.values())
        hub = {n: hraw[n] * UNIT // tot for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


_HITS_EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (5, 1)]


class TestHits:
    @pytest.fixture(scope="class")
    def edges(self, spark):
        return spark.createDataFrame(_HITS_EDGES, "src long, dst long")

    def test_matches_python_reference(self, edges):
        got = {
            r["node"]: (r["hub_units"], r["auth_units"])
            for r in hits(edges, n_iters=3).collect()
        }
        assert got == _py_hits(_HITS_EDGES, 3)

    def test_partitioning_independent(self, edges):
        one = {
            r["node"]: (r["hub_units"], r["auth_units"])
            for r in hits(edges.repartition(1), n_iters=2).collect()
        }
        many = {
            r["node"]: (r["hub_units"], r["auth_units"])
            for r in hits(edges.repartition(7), n_iters=2).collect()
        }
        assert one == many

    def test_pure_sink_has_zero_hub(self, spark):
        # 1 -> 2, 3 -> 2: node 2 never points anywhere, so hub = 0 and it
        # holds ALL the authority mass; 1 and 3 split the hub mass.
        df = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
        got = {r["node"]: (r["hub_units"], r["auth_units"]) for r in hits(df, n_iters=2).collect()}
        assert got[2][0] == 0
        assert got[2][1] == UNIT
        assert got[1][1] == 0 and got[3][1] == 0
        assert got[1][0] == got[3][0] == UNIT // 2

    def test_l1_mass_bounded(self, edges):
        row = (
            hits(edges, n_iters=4)
            .agg(F.sum("hub_units").alias("h"), F.sum("auth_units").alias("a"))
            .collect()[0]
        )
        # floors only ever lose mass; never exceed one UNIT total
        assert 0 < row["h"] <= UNIT
        assert 0 < row["a"] <= UNIT

    def test_rejects_bad_iters(self, edges):
        with pytest.raises(ValueError, match="n_iters"):
            hits(edges, n_iters=0)


def _py_kcore(edges, k):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(vs) for n, vs in adj.items()}


# triangle 1-2-3, square attachment 4, pendant 5, and a self-loop on 6
_KCORE_EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (1, 5), (6, 6)]


class TestKcore:
    @pytest.fixture(scope="class")
    def edges(self, spark):
        return spark.createDataFrame(_KCORE_EDGES, "u long, v long")

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_matches_python_reference(self, edges, k):
        got = {r["node"]: r["degree"] for r in kcore(edges, k=k, n_rounds=6).collect()}
        assert got == _py_kcore(_KCORE_EDGES, k)

    def test_empty_core_is_empty_frame(self, edges):
        assert kcore(edges, k=4, n_rounds=6).count() == 0

    def test_self_loop_never_counts(self, edges):
        # node 6 only has a self-loop: absent from every core
        for k in (1, 2):
            assert 6 not in {r["node"] for r in kcore(edges, k=k, n_rounds=6).collect()}

    def test_nonconvergence_raises(self, spark):
        # a long path peels one node per end per round: 2 rounds cannot
        # finish peeling an 8-node path at k=2
        path = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 8)], "u long, v long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            kcore(path, k=2, n_rounds=2)

    def test_partitioning_independent(self, edges):
        one = {r["node"]: r["degree"] for r in kcore(edges.repartition(1), k=2, n_rounds=6).collect()}
        many = {r["node"]: r["degree"] for r in kcore(edges.repartition(5), k=2, n_rounds=6).collect()}
        assert one == many

    def test_rejects_bad_args(self, edges):
        with pytest.raises(ValueError, match="k must"):
            kcore(edges, k=0)
        with pytest.raises(ValueError, match="n_rounds"):
            kcore(edges, k=2, n_rounds=0)


class TestTextrankKeywords:
    def test_tiny_corpus_ranks_the_hub_word(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        docs = [
            (1, "spark engine runs spark jobs with spark shuffle"),
            (2, "engine tuning makes spark engine faster"),
            (3, "ab x1 no, qualifying! tokens here"),  # short/non-alpha only survivors: 'tokens' 'here'
        ]
        root = tmp_path / "sf"
        root.mkdir()
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            str(root / "documents.parquet")
        )
        rows = REGISTRY["text_textrank_keywords"][0](spark, str(root)).collect()
        words = [r["word"] for r in rows]
        # every surviving word is >= 4 alpha chars
        assert all(w.isalpha() and len(w) >= 4 for w in words)
        # 'spark' is the co-occurrence hub of docs 1-2: top-ranked
        assert words[0] == "spark"
        # mass bounded by one UNIT
        assert sum(r["rank_units"] for r in rows) <= 1_000_000_000
