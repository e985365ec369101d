"""FastSS deletion-neighborhood fuzzy join (operators/fuzzy.py):
completeness vs brute force, soundness of candidates, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.fuzzy import (
    deletion_signature_rows,
    fuzzy_self_join_d1,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "sparc", "spak", "sparks", "shark", "quark",
    "vector", "vecto", "vectr", "victor", "hector",
    "join", "coin", "jobs", "joins", "spark",  # note: dup via id
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, w string"
    )


class TestFuzzyJoin:
    def test_matches_bruteforce_exactly(self, spark, df):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in fuzzy_self_join_d1(df, "w", "id").collect()
        }
        want = {
            (i, j, _lev(a, b))
            for i, a in enumerate(WORDS)
            for j, b in enumerate(WORDS)
            if i < j and _lev(a, b) <= 1
        }
        assert got == want
        assert want, "fixture must produce pairs"

    def test_duplicate_strings_pair_at_distance_zero(self, spark, df):
        got = fuzzy_self_join_d1(df, "w", "id").filter(F.col("dist") == 0).collect()
        assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 15)}

    def test_signature_count_bounded_by_length_plus_one(self, spark, df):
        per = (
            deletion_signature_rows(df, "w", "id")
            .groupBy("_fid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_id = {r["_fid"]: r["n"] for r in per}
        for i, w in enumerate(WORDS):
            assert by_id[i] <= len(w) + 1

    def test_partitioning_invariant(self, spark, df):
        a = sorted(
            tuple(r) for r in fuzzy_self_join_d1(df, "w", "id").collect()
        )
        b = sorted(
            tuple(r)
            for r in fuzzy_self_join_d1(df.repartition(7), "w", "id").collect()
        )
        assert a == b

    def test_no_text_in_candidate_exchange(self, spark, df):
        # the dedup discipline: the signature join shuffles hashes, not
        # strings — no exchange input carries the key column
        import re

        out = fuzzy_self_join_d1(df, "w", "id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "_h#" in m.group(1) or "_id" in m.group(1) or "w#" not in m.group(1)


class TestFuzzyValueForm:
    """The distinct-value scale form: duplicates collapse before the
    quadratic stage; id-level totals recovered arithmetically."""

    def test_value_pairs_and_count(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.fuzzy import (
            fuzzy_pair_count_d1,
            fuzzy_value_pairs_d1,
        )

        # 'abc' x3, 'abd' x2, 'xyz' x1: value pair (abc, abd) -> 6 id
        # pairs; dup group abc -> 3, abd -> 1; total 10
        rows = [(0, "abc"), (1, "abc"), (2, "abc"), (3, "abd"), (4, "abd"), (5, "xyz")]
        df = spark.createDataFrame(rows, "id long, w string")
        vp = fuzzy_value_pairs_d1(df, "w", "id").collect()
        assert len(vp) == 1
        r = vp[0]
        assert (r["w_a"], r["w_b"], r["n_a"], r["n_b"], r["dist"]) == ("abc", "abd", 3, 2, 1)
        assert (r["min_id_a"], r["min_id_b"]) == (0, 3)
        total = fuzzy_pair_count_d1(df, "w", "id").collect()[0]["n_id_pairs"]
        assert total == 6 + 3 + 1

    def test_duplicates_do_not_blow_up_candidates(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.fuzzy import (
            fuzzy_value_pairs_d1,
        )

        base = [(i, w) for i, w in enumerate(["node", "code", "mode", "rode"])]
        dup = [(100 + i * 10 + j, w) for i, (_, w) in enumerate(base) for j in range(9)]
        df = spark.createDataFrame(base + dup, "id long, w string")
        vp = fuzzy_value_pairs_d1(df, "w", "id").collect()
        # 4 distinct values, all pairwise distance 1 -> C(4,2) value pairs
        assert len(vp) == 6
        for r in vp:
            assert r["n_a"] == 10 and r["n_b"] == 10
