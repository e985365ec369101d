"""Fellegi-Sunter probabilistic record linkage (operators/linkage.py)."""

from __future__ import annotations

import math

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.linkage import (
    SCALE,
    fs_score_pairs,
    fs_weights,
)


@pytest.fixture()
def frames(spark):
    clean = spark.createDataFrame(
        [
            (1, "ann", "A", 0),
            (2, "bob", "A", 0),
            (3, "cat", "B", 1),
            (4, "dan", "B", 2),
        ],
        "id long, name string, blk string, grade long",
    )
    # dirty re-registrations: 11<->1 (name corrupted), 12<->2 (clean),
    # 13<->3 (grade corrupted), 14<->4 (clean)
    dirty = spark.createDataFrame(
        [
            (11, "anX", "A", 0),
            (12, "bob", "A", 0),
            (13, "cat", "B", 0),
            (14, "dan", "B", 2),
        ],
        "id long, name string, blk string, grade long",
    )
    truth = spark.createDataFrame(
        [(1, 11), (2, 12), (3, 13), (4, 14)], "clean_id long, dirty_id long"
    )
    return clean, dirty, truth


class TestWeights:
    def test_matches_closed_form(self, spark, frames):
        clean, dirty, truth = frames
        w = {r["field"]: r for r in fs_weights(clean, dirty, truth,
                                               ["name", "grade"]).collect()}
        # m_name = 3/4 (one corrupted); u_name = 4/16 (unique names)
        r = w["name"]
        assert (r["m_num"], r["m_den"], r["u_num"], r["u_den"]) == (3, 4, 4, 16)
        assert r["w_agree_micro"] == math.floor(
            (math.log(3 / 4) - math.log(4 / 16)) * SCALE + 0.5
        )
        assert r["w_disagree_micro"] == math.floor(
            (math.log(1 / 4) - math.log(12 / 16)) * SCALE + 0.5
        )
        # grade counts: values 0,0,1,2 -> u_num = 4+1+1 = 6
        r = w["grade"]
        assert (r["m_num"], r["m_den"], r["u_num"], r["u_den"]) == (3, 4, 6, 16)

    def test_degenerate_field_raises(self, spark, frames):
        clean, dirty, truth = frames
        with pytest.raises(ValueError, match="degenerate m"):
            # blk never disagrees on matches -> m = 1
            fs_weights(clean, dirty, truth, ["blk"])


class TestScoring:
    def test_true_pairs_outscore_and_decisions(self, spark, frames):
        clean, dirty, truth = frames
        fields = ["name", "grade"]
        w = fs_weights(clean, dirty, truth, fields)
        scored = {
            (r["clean_id"], r["dirty_id"]): r["score_micro"]
            for r in fs_score_pairs(clean, dirty, w, fields, "blk").collect()
        }
        # blocked candidates: A-block 2x2, B-block 2x2 = 8 pairs
        assert len(scored) == 8
        # every uncorrupted true pair scores the double-agreement maximum
        top = max(scored.values())
        assert scored[(2, 12)] == top and scored[(4, 14)] == top
        # the fully-disagreeing cross pair (cat/dan: name and grade both
        # differ) scores the minimum
        bottom = min(scored.values())
        assert scored[(3, 14)] == bottom
        # mixed pair (ann vs bob: name disagrees, grade agrees) replays
        # as the exact weight sum
        wm = {r["field"]: r for r in w.collect()}
        expect_112 = wm["name"]["w_disagree_micro"] + wm["grade"]["w_agree_micro"]
        assert scored[(1, 12)] == expect_112

    def test_missing_weight_raises(self, spark, frames):
        clean, dirty, truth = frames
        w = fs_weights(clean, dirty, truth, ["name"])
        with pytest.raises(ValueError, match="no weights"):
            fs_score_pairs(clean, dirty, w, ["name", "grade"], "blk")


class TestJaroWinkler:
    def test_bit_exact_vs_duckdb_randomized(self, spark):
        # the cross-engine gate stands on bit-identical doubles: verify
        # the python reference against DuckDB's native implementation on
        # randomized word-strings AND short adversarial alphabets
        import random

        import duckdb

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.linkage import (
            jaro_winkler_py,
        )

        con = duckdb.connect()
        rng = random.Random(20260816)
        words = ["golden", "rod", "lavender", "spring", "lace", "navy"]
        cases = []
        for _ in range(700):
            cases.append(
                (
                    " ".join(rng.choices(words, k=rng.randint(1, 4))),
                    " ".join(rng.choices(words, k=rng.randint(1, 4))),
                )
            )
        for _ in range(700):
            cases.append(
                (
                    "".join(rng.choices("abcd", k=rng.randint(0, 10))),
                    "".join(rng.choices("abcd", k=rng.randint(0, 10))),
                )
            )
        cases += [("", ""), ("a", ""), ("martha", "marhta"), ("x", "x")]
        for s1, s2 in cases:
            d = con.execute(
                "select jaro_winkler_similarity(?, ?)", [s1, s2]
            ).fetchone()[0]
            assert jaro_winkler_py(s1, s2) == d, (s1, s2)

    def test_known_values(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.linkage import (
            jaro_winkler_py,
        )

        assert jaro_winkler_py("martha", "marhta") == pytest.approx(0.9611111111111111)
        assert jaro_winkler_py("same", "same") == 1.0
        assert jaro_winkler_py("", "") == 0.0  # DuckDB convention
        assert jaro_winkler_py("abc", "xyz") == 0.0

    def test_blocked_pairs_stay_in_block(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.linkage import (
            jw_blocked_pairs,
        )

        names = spark.createDataFrame(
            [("red bolt", "red"), ("red boat", "red"), ("blue bolt", "blue")],
            "name string, blk string",
        )
        rows = jw_blocked_pairs(names, "name", "blk").collect()
        assert len(rows) == 1  # cross-block candidates never form
        assert rows[0].name_a == "red boat" and rows[0].name_b == "red bolt"
        assert 0.9 < rows[0].jw < 1.0
