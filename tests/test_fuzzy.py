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


def _py_lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[n]


class TestEdJoin:
    """Ed-Join (q-gram prefix filter, k >= 2) vs brute force."""

    def _brute(self, strs, k):
        want = {}
        ss = sorted(strs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                d = _py_lev(ss[i], ss[j])
                if 1 <= d <= k:
                    want[frozenset((ss[i], ss[j]))] = d
        return want

    def _got(self, spark, strs, k, q=2):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.fuzzy import (
            edjoin_value_pairs,
        )

        rows = [(i, s) for i, s in enumerate(sorted(strs))]
        df = spark.createDataFrame(rows, "rid long, s string")
        return {
            frozenset((r["s_a"], r["s_b"])): r["dist"]
            for r in edjoin_value_pairs(df, "s", "rid", q=q, k=k).collect()
        }

    def test_adversarial_short_strings_binary_alphabet(self, spark):
        # Small alphabet + lengths 0..8 maximizes gram-vacuous pairs
        # (the len < q*(k+1) hole the short-string block exists for).
        import random

        rng = random.Random(7)
        strs = {"".join(rng.choice("ab") for _ in range(rng.randrange(0, 9))) for _ in range(80)}
        assert self._got(spark, strs, 2) == self._brute(strs, 2)

    def test_long_strings_exercise_prefix_selection(self, spark):
        # Lengths 8..14 over 'abc': every string carries more grams
        # than the q*k + 1 prefix, so the rarest-gram ranking is load-
        # bearing, not just a pass-through.
        import random

        rng = random.Random(11)
        strs = {"".join(rng.choice("abc") for _ in range(rng.randrange(8, 15))) for _ in range(120)}
        assert self._got(spark, strs, 2) == self._brute(strs, 2)

    def test_multiplicities_carried(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.fuzzy import (
            edjoin_value_pairs,
        )

        rows = [(0, "market"), (1, "market"), (2, "marked"), (3, "casket")]
        df = spark.createDataFrame(rows, "rid long, s string")
        got = {
            (r["s_a"], r["s_b"]): (r["n_a"], r["n_b"], r["dist"])
            for r in edjoin_value_pairs(df, "s", "rid", q=2, k=2).collect()
        }
        assert got[("market", "marked")] == (2, 1, 1)
        assert got[("market", "casket")] == (2, 1, 2)
        assert ("marked", "casket") not in got  # ed 3, above threshold
        assert all(1 <= v[2] <= 2 for v in got.values())


    def test_q3_grams_complete_too(self, spark):
        import random

        rng = random.Random(13)
        strs = {"".join(rng.choice("abc") for _ in range(rng.randrange(0, 13))) for _ in range(100)}
        assert self._got(spark, strs, 2, q=3) == self._brute(strs, 2)

    def test_short_block_is_length_keyed_not_broadcast_cross(self, spark):
        # adversarial: MANY distinct short strings (unbounded-alphabet
        # stand-in) — correctness must hold and the plan must not cross
        import random

        rng = random.Random(17)
        strs = {"".join(rng.choice("abcdefgh") for _ in range(rng.randrange(0, 6))) for _ in range(120)}
        assert self._got(spark, strs, 2) == self._brute(strs, 2)
