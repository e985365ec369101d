"""Sharded NSW graph ANN (operators/nsw.py): build invariants,
determinism, exact-distance contract, self-query, and measured recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nsw import (
    nsw_build,
    nsw_search,
)

SF = "/root/testdata/sf0.001"
M, EF = 8, 32


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def graph(spark, emb):
    g = nsw_build(emb, n_shards=4, m=M, ef_construction=EF).localCheckpoint()
    g.count()
    return g


@pytest.fixture(scope="module")
def np_corpus(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array(sorted(r["vec_id"] for r in rows))
    by_id = {r["vec_id"]: r["embedding"] for r in rows}
    mat = np.array([by_id[int(i)] for i in ids], dtype=np.float64)
    return ids, mat


def test_graph_covers_corpus_and_respects_degree_bound(graph, emb):
    rows = graph.collect()
    assert {r["vec_id"] for r in rows} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    assert all(len(r["neighbors"]) <= M for r in rows)
    # no self-loop, no cross-shard edge, symmetric adjacency per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], {})[r["vec_id"]] = set(r["neighbors"])
    for shard, adj in by_shard.items():
        for node, nbrs in adj.items():
            assert node not in nbrs
            for nb in nbrs:
                assert nb in adj, f"edge {node}->{nb} leaves shard {shard}"
                assert node in adj[nb], f"edge {node}->{nb} not symmetric"


def test_build_is_deterministic(emb):
    a = nsw_build(emb, n_shards=4, m=M, ef_construction=EF).collect()
    b = nsw_build(emb, n_shards=4, m=M, ef_construction=EF).collect()
    canon = lambda rows: sorted(
        (r["shard"], r["vec_id"], tuple(r["neighbors"])) for r in rows
    )
    assert canon(a) == canon(b)


def test_search_returns_exact_distances_and_finds_self(graph, np_corpus):
    ids, mat = np_corpus
    qid = 7
    q = mat[ids == qid][0]
    got = nsw_search(graph, list(q), k=5, ef_search=EF).collect()
    assert len(got) == 5
    # distances ascending, exact L2 for each returned id
    ds = [r["distance"] for r in got]
    assert ds == sorted(ds)
    for r in got:
        expect = float(np.linalg.norm(mat[ids == r["vec_id"]][0] - q))
        assert abs(r["distance"] - expect) < 1e-9
    assert got[0]["vec_id"] == qid and got[0]["distance"] == 0.0


def test_recall_at_5_beats_floor(graph, np_corpus):
    """Measured recall@5 over 10 corpus-member queries vs exact top-5.
    Deterministic (build and search are), so the floor is a regression
    pin, not a flaky statistical bound."""
    ids, mat = np_corpus
    qids = [int(i) for i in ids if i % 53 == 11]
    hits = 0
    for qid in qids:
        q = mat[ids == qid][0]
        d = np.linalg.norm(mat - q, axis=1)
        exact = set(ids[np.lexsort((ids, d))[:5]].tolist())
        got = {r["vec_id"] for r in nsw_search(graph, list(q), k=5, ef_search=EF).collect()}
        hits += len(got & exact)
    recall = hits / (5 * len(qids))
    assert recall >= 0.8, f"recall@5 {recall}"


class TestNswIndex:
    def test_persisted_parity(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nsw import (
            nsw_build,
            nsw_index_search,
            nsw_index_write,
            nsw_search,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        graph = nsw_build(emb, n_shards=4, m=8, ef_construction=32)
        path = str(tmp_path / "nsw_idx")
        nsw_index_write(graph, path)

        back = spark.read.parquet(path)
        assert set(back.columns) == {"vec_id", "embedding", "neighbors", "shard"}
        assert back.count() == emb.count()
        # one directory per shard
        import glob

        assert len(glob.glob(f"{path}/shard=*")) == 4

        q = emb.filter(F.col("vec_id") == 9).first()["embedding"]
        got = nsw_index_search(spark, path, list(q), k=5, ef_search=32).collect()
        want = nsw_search(graph, list(q), k=5, ef_search=32).collect()
        assert [(r["vec_id"], round(r["distance"], 6)) for r in got] == [
            (r["vec_id"], round(r["distance"], 6)) for r in want
        ]
