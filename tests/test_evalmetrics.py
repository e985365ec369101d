"""Scorer evaluation metrics (operators/evalmetrics.py) and the
leakage-safe split (operators/cluster.py::leakage_safe_split), round 10."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
    auc_roc,
    calibration_bins,
)


def _py_auc(pairs):
    """Reference AUC with the average-rank tie convention, from the
    pair definition: P(s_pos > s_neg) + P(tie)/2."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (wins + ties / 2) / (len(pos) * len(neg))


class TestAucRoc:
    DATA = [
        (0.9, True), (0.8, True), (0.8, False), (0.7, True),
        (0.5, False), (0.5, True), (0.4, False), (0.1, False), (0.1, False),
    ]

    def test_matches_pair_definition_with_ties(self, spark):
        df = spark.createDataFrame(self.DATA, "score double, label boolean")
        got = auc_roc(df, "score", "label").first()
        want = _py_auc([(int(math.floor(s * 100 + 0.5)), y) for s, y in self.DATA])
        assert got["auc_micro"] == math.floor(want * 1_000_000)
        assert got["n_pos"] == 4 and got["n_neg"] == 5

    def test_perfect_and_inverted_rankers(self, spark):
        perfect = spark.createDataFrame(
            [(1.0, True), (0.9, True), (0.2, False), (0.1, False)],
            "score double, label boolean",
        )
        assert auc_roc(perfect, "score", "label").first()["auc_micro"] == 1_000_000
        inverted = spark.createDataFrame(
            [(0.1, True), (0.2, True), (0.9, False), (1.0, False)],
            "score double, label boolean",
        )
        assert auc_roc(inverted, "score", "label").first()["auc_micro"] == 0

    def test_degenerate_group_reports_null(self, spark):
        df = spark.createDataFrame(
            [("a", 0.5, True), ("a", 0.6, True), ("b", 0.5, True), ("b", 0.4, False)],
            "g string, score double, label boolean",
        )
        got = {r["g"]: r["auc_micro"]
               for r in auc_roc(df, "score", "label", group_col="g").collect()}
        assert got["a"] is None
        assert got["b"] == 1_000_000

    def test_partitioning_invariant(self, spark):
        rows = [(float((i * 37) % 101) / 100.0, (i * 7) % 3 == 0)
                for i in range(500)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        vals = {
            auc_roc(df.repartition(p), "score", "label").first()["auc_micro"]
            for p in (1, 7, 32)
        }
        assert len(vals) == 1


class TestCalibrationBins:
    def test_small_case_exact(self, spark):
        # scores 0.0 .. 0.9 quantized x100 -> 0..90, 10 bins over [0, 90]
        rows = [(i / 10.0, i >= 5) for i in range(10)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        got = {r["bin"]: r for r in
               calibration_bins(df, "score", "label", n_bins=10).collect()}
        # bin width = (90 - 0 + 1)/10 -> score 10*i lands in bin (10i*10)//91
        import collections
        expect = collections.defaultdict(list)
        for i in range(10):
            expect[(i * 10 * 10) // 91].append(i)
        assert set(got) == set(expect)
        for b, members in expect.items():
            n = len(members)
            ssum = sum(10 * i for i in members)
            npos = sum(1 for i in members if i >= 5)
            assert got[b]["n"] == n
            assert got[b]["mean_score_micro"] == (ssum * 1_000_000) // (n * 100)
            assert got[b]["pos_rate_micro"] == (npos * 1_000_000) // n

    def test_rejects_bad_bins(self, spark):
        df = spark.createDataFrame([(1.0, True)], "score double, label boolean")
        with pytest.raises(ValueError, match="n_bins"):
            calibration_bins(df, "score", "label", n_bins=1)


class TestStreamingAuc:
    """Score-count log (streaming/evalmetrics_stream.py)."""

    def test_streamed_auc_equals_batch_and_replay_absorbed(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.evalmetrics_stream import (
            auc_from_log,
            score_counts_read,
            stream_into_score_counts,
        )

        src, log, ckpt = (str(tmp_path / n) for n in ("src", "log", "ckpt"))
        rows = [(float((i * 37) % 101) / 100.0, (i * 7) % 3 == 0)
                for i in range(600)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        df.repartition(3).write.parquet(src)

        stream = (
            spark.readStream.schema("score double, label boolean")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_into_score_counts(stream, log, ckpt, "score", "label")
        q.awaitTermination(120)

        batch = auc_roc(df, "score", "label").first()
        streamed = auc_from_log(spark, log).first()
        assert tuple(streamed) == tuple(batch)

        # the SAME log feeds the calibration read — must equal the
        # batch reliability table on the same rows
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.evalmetrics_stream import (
            calibration_from_log,
        )

        cal_batch = sorted(
            map(tuple, calibration_bins(df, "score", "label").collect())
        )
        cal_stream = sorted(map(tuple, calibration_from_log(spark, log).collect()))
        assert cal_stream == cal_batch

        # replay batch 0's counts verbatim: stamp dedup must absorb it
        before = sorted(map(tuple, score_counts_read(spark, log).collect()))
        first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
        first.write.mode("append").parquet(log)
        after = sorted(map(tuple, score_counts_read(spark, log).collect()))
        assert after == before

    def test_mixed_null_stamp_log_rejected(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.evalmetrics_stream import (
            score_counts_read,
        )

        log = str(tmp_path / "log")
        df = spark.createDataFrame(
            [(10, 3, 4)], "_s long, _pos long, _neg long"
        )
        df.withColumn("batch_id", F.lit(0).cast("long")).write.mode(
            "append"
        ).parquet(log)
        df.withColumn("batch_id", F.lit(None).cast("long")).write.mode(
            "append"
        ).parquet(log)
        with pytest.raises(Exception, match="null and stamped"):
            score_counts_read(spark, log).collect()


class TestLeakageSafeSplit:
    def test_cluster_members_share_side(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.cluster import (
            leakage_safe_split,
        )

        corpus = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id long"
        )
        # chains {0..3}, {10,11}, everything else singleton
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        rows = leakage_safe_split(corpus, pairs, test_pct=30).collect()
        by_id = {r["id"]: r for r in rows}
        assert len(by_id) == 200
        for cluster in ([0, 1, 2, 3], [10, 11]):
            sides = {by_id[i]["split"] for i in cluster}
            cids = {by_id[i]["cluster_id"] for i in cluster}
            assert len(sides) == 1 and cids == {min(cluster)}
        # both sides populated on 200 singleton-heavy ids at 30%
        splits = {r["split"] for r in rows}
        assert splits == {"test", "train"}

    def test_matches_row_hash_on_cluster_ids(self, spark):
        """The cluster bucket must equal train_test_split_hash applied
        to the cluster id — same salt, same membership rule."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.cluster import (
            leakage_safe_split,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            train_test_split_hash,
        )

        corpus = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        got = {r["id"]: r["split"]
               for r in leakage_safe_split(corpus, pairs, test_pct=10).collect()}
        ref_in = spark.createDataFrame(
            [(i, (1 if i == 2 else i)) for i in range(100)],
            "doc_id long, cluster_id long",
        )
        ref = {r["doc_id"]: r["split"]
               for r in train_test_split_hash(ref_in, "cluster_id", 10).collect()}
        assert got == ref


class TestNdcg:
    """Graded ranking metric (operators/evalmetrics.py::ndcg_at_k, r10)."""

    def _py_ndcg(self, ranked_rels, all_rels, k=10):
        import math

        disc = {i: int(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)}
        dcg = sum(rel * disc[i + 1] for i, rel in enumerate(ranked_rels[:k]))
        ideal = sorted(all_rels, reverse=True)[:k]
        idcg = sum(rel * disc[i + 1] for i, rel in enumerate(ideal))
        return dcg, idcg, (dcg * 1_000_000) // idcg if idcg else None

    def test_matches_python_reference(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        ranked = [3, 0, 2, 1, 0]          # retrieved top-5, graded rels
        judged = [3, 3, 2, 2, 1, 1, 0, 0]  # full qrels (misses two relevant)
        results = spark.createDataFrame(
            [("q", i + 1, r) for i, r in enumerate(ranked)],
            "query_id string, rank int, rel int",
        )
        qrels = spark.createDataFrame(
            [("q", r) for r in judged], "query_id string, rel int"
        )
        got = ndcg_at_k(results, qrels, k=5).first()
        dcg, idcg, ndcg = self._py_ndcg(ranked, judged, k=5)
        assert (got["dcg_micro"], got["idcg_micro"], got["ndcg_ppm"]) == (
            dcg, idcg, ndcg,
        )

    def test_perfect_ranking_is_one(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        rels = [5, 4, 3, 2, 1]
        results = spark.createDataFrame(
            [("q", i + 1, r) for i, r in enumerate(rels)],
            "query_id string, rank int, rel int",
        )
        qrels = spark.createDataFrame(
            [("q", r) for r in rels], "query_id string, rel int"
        )
        assert ndcg_at_k(results, qrels, k=5).first()["ndcg_ppm"] == 1_000_000

    def test_no_relevant_docs_reports_null(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        results = spark.createDataFrame(
            [("q", 1, 0), ("q", 2, 0)], "query_id string, rank int, rel int"
        )
        qrels = spark.createDataFrame(
            [("q", 0), ("q", 0)], "query_id string, rel int"
        )
        r = ndcg_at_k(results, qrels, k=2).first()
        assert r["ndcg_ppm"] is None and r["idcg_micro"] == 0

    def test_missing_relevant_docs_penalized(self, spark):
        """Retrieving nothing relevant while qrels hold relevant docs
        must give 0 — the standard convention, not within-retrieved
        renormalization."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        results = spark.createDataFrame(
            [("q", 1, 0)], "query_id string, rank int, rel int"
        )
        qrels = spark.createDataFrame(
            [("q", 3), ("q", 0)], "query_id string, rel int"
        )
        r = ndcg_at_k(results, qrels, k=2).first()
        assert r["ndcg_ppm"] == 0 and r["idcg_micro"] > 0

    def test_rejects_bad_k(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        df = spark.createDataFrame([("q", 1, 0)], "query_id string, rank int, rel int")
        with pytest.raises(ValueError, match="k must be"):
            ndcg_at_k(df, df.select("query_id", "rel"), k=0)
