"""Triplet mining (operators/mining.py): role semantics on hand-built
vectors, filter-before-rank guarantee, no-embedding-in-exchange plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
    triplet_mining,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # 1-D embeddings on a line; labels split odd/even neighborhoods.
    rows = [
        (0, 0, [0.0]), (1, 0, [1.0]), (2, 0, [2.0]),
        (3, 1, [3.0]), (4, 1, [4.0]), (5, 1, [10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, label int, embedding array<float>")


def _anchors(df, ids):
    return df.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("anchor_vec"),
    )


class TestTripletMining:
    def test_roles_hand_computed(self, tiny):
        out = triplet_mining(tiny, _anchors(tiny, [2]), n_pos=1, n_neg=2).collect()
        by_role = {}
        for r in out:
            by_role.setdefault(r["role"], []).append((r["rank"], r["vec_id"]))
        # anchor 2 (label 0 at x=2): nearest same-label is 1 (x=1);
        # nearest different-label are 3 (x=3) then 4 (x=4).
        assert by_role["positive"] == [(1, 1)]
        assert sorted(by_role["hard_negative"]) == [(1, 3), (2, 4)]

    def test_anchor_never_its_own_positive(self, tiny):
        out = triplet_mining(tiny, _anchors(tiny, [0, 3]), n_pos=2, n_neg=1).collect()
        for r in out:
            if r["role"] == "positive":
                assert r["vec_id"] != r["anchor_id"]

    def test_filter_before_rank(self, tiny):
        """Anchor 5 (label 1 at x=10) has ONLY same-label vectors as its
        4 nearest neighbors; a prune-then-filter implementation would
        return fewer negatives than requested."""
        out = triplet_mining(tiny, _anchors(tiny, [5]), n_pos=1, n_neg=3).collect()
        negs = [r for r in out if r["role"] == "hard_negative"]
        assert len(negs) == 3
        assert all(r["label"] == 0 for r in negs)

    def test_rejects_bad_counts(self, tiny):
        with pytest.raises(ValueError):
            triplet_mining(tiny, _anchors(tiny, [0]), n_pos=0, n_neg=0)

    def test_no_embedding_in_exchanges(self, tiny):
        import re

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (
            explain_str,
        )

        df = triplet_mining(tiny, _anchors(tiny, [0, 1]))
        formatted = explain_str(df, "formatted")
        found = 0
        for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", formatted):
            found += 1
            inputs = m.group(1)
            assert "embedding" not in inputs and "anchor_vec" not in inputs, inputs
        assert found >= 1  # the window exchanges exist and were checked


class TestPrototypes:
    def test_prototypes_match_numpy(self, spark):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            label_prototypes,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = emb.select("vec_id", "label", "embedding").collect()
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        labels = np.array([r["label"] for r in rows])
        got = {r["label"]: r for r in label_prototypes(emb).collect()}
        for lab in set(labels.tolist()):
            members = X[labels == lab]
            want = np.round(members.mean(axis=0), 4)
            assert got[lab]["n_members"] == len(members)
            np.testing.assert_allclose(got[lab]["prototype"], want, atol=1e-9)

    def test_confusion_counts_every_vector_once(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            label_prototypes,
            prototype_confusion,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        conf = prototype_confusion(emb, label_prototypes(emb)).collect()
        assert sum(r["n"] for r in conf) == emb.count()

    def test_confusion_diagonal_for_separable_classes(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            label_prototypes,
            prototype_confusion,
        )

        rows = [
            (0, 0, [0.0, 0.0]), (1, 0, [1.0, 0.0]),
            (2, 1, [10.0, 10.0]), (3, 1, [11.0, 10.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id int, label int, embedding array<float>")
        conf = {(r["label"], r["pred_label"]): r["n"]
                for r in prototype_confusion(df, label_prototypes(df)).collect()}
        assert conf == {(0, 0): 2, (1, 1): 2}


class TestPrototypicalityPrune:
    def _df(self, spark):
        # two labels; label 0 has an obvious outlier (hard example)
        rows = [
            (0, 0, [0.0, 0.0]),
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.0, 1.0]),
            (3, 0, [9.0, 9.0]),   # far from the class mean -> hardest
            (10, 1, [5.0, 5.0]),
            (11, 1, [5.0, 6.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")

    def test_keep_hard_drops_most_prototypical(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            prototypicality_prune,
        )

        kept = prototypicality_prune(self._df(spark), pct_prune=50, keep="hard").collect()
        by_label = {}
        for r in kept:
            by_label.setdefault(r["label"], set()).add(r["vec_id"])
        # label 0: mean (2.5, 2.5); dist2: id0=12.5, id1=8.5, id2=8.5, id3=84.5
        # 50% of 4 -> drop 2 easiest (ids 1, 2; tie by id), keep {0, 3}
        assert by_label[0] == {0, 3}
        # label 1: mean (5.0, 5.5); 50% of 2 -> drop 1 easiest (tie d2=0.25 -> id 10)
        assert by_label[1] == {11}

    def test_keep_easy_flips_the_cut(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            prototypicality_prune,
        )

        kept = prototypicality_prune(self._df(spark), pct_prune=50, keep="easy").collect()
        ids0 = {r["vec_id"] for r in kept if r["label"] == 0}
        assert 3 not in ids0 and len(ids0) == 2

    def test_guards(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            prototypicality_prune,
        )

        with _pt.raises(ValueError, match="keep"):
            prototypicality_prune(self._df(spark), keep="best")
        with _pt.raises(ValueError, match="pct_prune"):
            prototypicality_prune(self._df(spark), pct_prune=101)


class TestBitextMargin:
    """Margin-based bitext mining (operators/mining.py::mine_bitext_margin, r10)."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "block long, side string, vec_id long, embedding array<float>"
        )

    def test_matches_python_reference(self, spark):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            mine_bitext_margin,
        )

        rng = np.random.default_rng(7)
        src = [(0, "src", i, rng.standard_normal(8).astype(float).tolist())
               for i in range(5)]
        tgt = [(0, "tgt", 100 + i, rng.standard_normal(8).astype(float).tolist())
               for i in range(6)]
        df = self._df(spark, src + tgt)
        got = {(r["src_id"], r["tgt_id"]): (r["cos"], r["margin"])
               for r in mine_bitext_margin(df, k=2, margin_threshold=1.0).collect()}

        # The Spark column is array<float>: values reach the operator
        # float32-quantized, so the reference must quantize identically.
        A = np.array([r[3] for r in src], dtype=np.float32).astype(np.float64)
        B = np.array([r[3] for r in tgt], dtype=np.float32).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        C = A @ B.T
        tf = np.sort(C, axis=1)[:, -2:]
        tb = np.sort(C, axis=0)[-2:, :]
        margin = 2 * C / (tf.mean(axis=1)[:, None] + tb.mean(axis=0)[None, :])
        cand = (C >= tf[:, 0][:, None]) | (C >= tb[0, :][None, :])
        want = {}
        for i, j in zip(*np.nonzero(cand & (margin > 1.0))):
            want[(i, 100 + j)] = (C[i, j], margin[i, j])
        assert set(got) == set(want)
        for key, (c, m) in want.items():
            assert got[key][0] == pytest.approx(c, abs=1e-9)
            assert got[key][1] == pytest.approx(m, abs=1e-9)

    def test_margin_demotes_hubs(self, spark):
        """A hub (near everything on the other side) must score a LOWER
        margin than a true pair of equal raw cosine — the reason the
        ratio margin exists."""
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            mine_bitext_margin,
        )

        # tgt 100 is a hub: moderately close to BOTH srcs; tgt 101 is
        # uniquely close to src 1 only.
        e = lambda *v: [float(x) for x in v]
        rows = [
            (0, "src", 0, e(1, 0.3, 0, 0)),
            (0, "src", 1, e(0, 1, 0, 0)),
            (0, "tgt", 100, e(0.7, 0.7, 0.2, 0)),   # hub
            (0, "tgt", 101, e(0, 1, 0.05, 0)),      # true pair of src 1
            (0, "tgt", 102, e(0, 0, 0, 1)),         # background
        ]
        out = {(r["src_id"], r["tgt_id"]): r["margin"]
               for r in mine_bitext_margin(self._df(spark, rows), k=2,
                                           margin_threshold=0.0).collect()}
        assert out[(1, 101)] > out[(1, 100)]

    def test_block_missing_side_emits_nothing(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            mine_bitext_margin,
        )

        rows = [
            (0, "src", 0, [1.0, 0.0]), (0, "src", 1, [0.0, 1.0]),
            (1, "src", 2, [1.0, 0.0]), (1, "tgt", 100, [1.0, 0.1]),
        ]
        got = mine_bitext_margin(self._df(spark, rows), k=1,
                                 margin_threshold=0.0).collect()
        assert {r["block"] for r in got} == {1}

    def test_rejects_bad_k(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.mining import (
            mine_bitext_margin,
        )

        df = self._df(spark, [(0, "src", 0, [1.0])])
        with pytest.raises(ValueError, match="k must be"):
            mine_bitext_margin(df, k=0)
