

class TestMmrRerank:
    """MMR diversification (round 8): integer-exact greedy replay and
    the diversity property (a near-duplicate of a selected doc is
    deferred in favor of a diverse one)."""

    def test_matches_python_replay(self, spark):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            mmr_rerank,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = sorted(
            emb.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
        )
        ids = [int(r["vec_id"]) for r in rows]
        X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
        q = X[ids.index(9)]

        def micro_sim(a, b):
            # sequential fold, ascending index — the engine's order
            dot = 0.0
            na = 0.0
            nb = 0.0
            for i in range(len(a)):
                dot += float(a[i]) * float(b[i])
                na += float(a[i]) * float(a[i])
                nb += float(b[i]) * float(b[i])
            import math

            return int(math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5))

        qs = {i: micro_sim(X[p], q) for p, i in enumerate(ids)}
        pool = sorted(qs, key=lambda i: (-qs[i], i))[:20]
        ps = {
            (a, b): micro_sim(X[ids.index(a)], X[ids.index(b)])
            for a in pool
            for b in pool
            if a != b
        }
        remaining, selected, want = list(pool), [], []
        for rank in range(1, 6):
            best = None
            for c in remaining:
                msim = max((ps[(c, s)] for s in selected), default=0)
                score = 1 * qs[c] - 1 * msim
                if best is None or (-score, c) < best:
                    best = (-score, c)
            selected.append(best[1])
            remaining.remove(best[1])
            want.append((rank, best[1], qs[best[1]], -best[0]))

        got = [
            (r["rank"], int(r["vec_id"]), int(r["q_sim_micro"]), int(r["mmr_score_micro"]))
            for r in mmr_rerank(emb, list(q), k=5, pool_size=20).collect()
        ]
        assert got == want

    def test_defers_near_duplicate(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            mmr_rerank,
        )

        # corpus: two near-identical docs close to q, one diverse doc a
        # bit further: plain relevance top-3 = (2, 1, 3); MMR keeps the
        # winner, then prefers the diverse doc and defers 1's near-dup
        # out of the top-3 entirely.
        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # near-dup of 1
            (3, [0.7, 0.7, 0.0]),      # diverse, still relevant
            (4, [0.0, 0.0, 1.0]),      # irrelevant
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = [int(r["vec_id"]) for r in mmr_rerank(df, [0.9, 0.3, 0.0], k=3, pool_size=4).collect()]
        assert got[0] == 2 and 3 in got and 1 not in got


class TestPhraseMatch:
    """Positional-postings phrase search (operators/retrieval.py::
    phrase_match, round 9)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "data column data column end"),      # 2 matches
                (2, "the data column appears once"),     # 1 match
                (3, "column data reversed never counts"),  # 0
                (4, "Data COLUMN case folded"),          # 1 (lowercased)
            ],
            "doc_id long, text string",
        )

    def test_counts_and_case_folding(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            phrase_match,
        )

        got = {r["doc_id"]: r["n_matches"]
               for r in phrase_match(self._docs(spark), ["data", "column"]).collect()}
        assert got == {1: 2, 2: 1, 4: 1}

    def test_three_word_phrase_and_overlap_semantics(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            phrase_match,
        )

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "a b c")], "doc_id long, text string"
        )
        # overlapping occurrences of 'a b a' at positions 0 and 2 BOTH count
        got = {r["doc_id"]: r["n_matches"]
               for r in phrase_match(df, ["a", "b", "a"]).collect()}
        assert got == {1: 2}

    def test_rejects_single_word(self, spark):
        import pytest

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            phrase_match,
        )

        with pytest.raises(ValueError, match="two words"):
            phrase_match(self._docs(spark), ["data"])

    def test_postings_form_matches_and_pushes_term_filters(self, spark, tmp_path):
        """The persisted-postings serving form: same counts, and each
        word's term equality reaches the parquet scan as a pushed
        filter (EqualTo on term), so the scan reads only the phrase
        words' rows."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.retrieval import (
            phrase_match_postings,
            tokenize_pos,
        )

        p = str(tmp_path / "postings")
        tokenize_pos(self._docs(spark)).write.parquet(p)
        postings = spark.read.parquet(p)
        out = phrase_match_postings(postings, ["data", "column"])
        got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
        assert got == {1: 2, 2: 1, 4: 1}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EqualTo(term,data)" in plan and "EqualTo(term,column)" in plan
