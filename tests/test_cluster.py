"""Connected components + duplicate clusters on hand-built graphs."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.cluster import (
    connected_components,
    duplicate_clusters,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
    groupwise_zscore_native,
    groupwise_zscore_pandas,
)
from pyspark.sql import functions as F


def test_components_chain_and_triangle(spark):
    # chain 1-2-3-4 (diameter 3 -> needs >1 iteration) + triangle 10-11-12
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_components_deterministic_min_label(spark):
    # labels converge to the min id regardless of edge direction/order
    edges = spark.createDataFrame([(9, 5), (5, 7)], "id_a long, id_b long")
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {5: 5, 7: 5, 9: 5}


def test_components_distributed_path_matches_union_find(spark):
    # same labeling from both paths: fast (driver union-find) vs
    # distributed (min-label propagation, forced via threshold=0)
    import random

    rng = random.Random(7)
    edges_py = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = spark.createDataFrame(edges_py, "id_a long, id_b long")
    fast = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert fast == dist
    assert all(c == min(v for v, cc in fast.items() if cc == c) for c in set(fast.values()))


def test_components_string_ids_fast_path(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b")], "id_a string, id_b string"
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a"}


def test_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_duplicate_clusters_singletons_and_canonicals(spark):
    corpus = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5]], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a long, id_b long")
    out = {r["id"]: r for r in duplicate_clusters(corpus, pairs).collect()}
    assert out[1]["cluster_id"] == 1 and out[3]["cluster_id"] == 1 and out[5]["cluster_id"] == 1
    assert out[1]["cluster_size"] == 3
    assert out[2]["cluster_size"] == 1 and out[2]["cluster_id"] == 2  # singleton
    canonicals = {i for i, r in out.items() if r["is_canonical"]}
    assert canonicals == {1, 2, 4}


def test_zscore_pandas_equals_native(spark):
    rows = [(i, "g1" if i < 6 else "g2", float(i * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    a = {r["event_id"]: round(r["zscore"], 9)
         for r in groupwise_zscore_pandas(df, "event_type", "value", "event_id").collect()}
    b = {r["event_id"]: round(r["zscore"], 9)
         for r in groupwise_zscore_native(df, "event_type", "value", "event_id").collect()}
    assert a == b
    # z-scores sum to ~0 per group
    import math

    g1 = sum(v for i, v in a.items() if i < 6)
    assert math.isclose(g1, 0.0, abs_tol=1e-9)


def test_zscore_constant_group_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0)], "event_id long, event_type string, value double"
    )
    out = groupwise_zscore_pandas(df, "event_type", "value", "event_id").collect()
    assert all(r["zscore"] == 0.0 for r in out)


class TestClusterSurvivors:
    """Quality survivorship (operators/cluster.py::cluster_survivors, r9)."""

    def test_longest_member_survives(self, spark):
        from pyspark.sql import functions as F

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.cluster import (
            cluster_survivors,
        )

        corpus = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 7)],  # cluster {1,2,3}: 2 and 3 tie on score
            "doc_id long, score long",
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        got = {r["id"]: (r["cluster_id"], r["cluster_size"], r["is_survivor"])
               for r in cluster_survivors(corpus, pairs, "score").collect()}
        # survivor = max score, tie -> min id => doc 2 (not min-id doc 1)
        assert got[1] == (1, 3, False)
        assert got[2] == (1, 3, True)
        assert got[3] == (1, 3, False)
        assert got[4] == (4, 1, True)  # singleton survives itself

    def test_string_doc_ids(self, spark):
        """ADVICE r9: the tie-break must analyze for string id columns
        (the old -F.col('id') negation failed on strings)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.cluster import (
            cluster_survivors,
        )

        corpus = spark.createDataFrame(
            [("a", 10), ("b", 30), ("c", 30), ("d", 7)],
            "doc_id string, score long",
        )
        pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
        got = {r["id"]: (r["cluster_id"], r["is_survivor"])
               for r in cluster_survivors(corpus, pairs, "score").collect()}
        # max score in {a,b,c} is 30, tie b/c -> min id 'b'
        assert got["a"] == ("a", False)
        assert got["b"] == ("a", True)
        assert got["c"] == ("a", False)
        assert got["d"] == ("d", True)
