"""Privacy audits (operators/privacy.py): k-anonymity group sizes and
distinct l-diversity."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.privacy import (
    k_anonymity_audit,
    l_diversity_audit,
)


@pytest.fixture()
def people(spark):
    # QI (zip, age): group sizes 3 / 2 / 1; sensitive diagnosis
    rows = [
        (1, "941xx", 30, "flu"),
        (2, "941xx", 30, "flu"),
        (3, "941xx", 30, "cold"),
        (4, "942xx", 40, "flu"),
        (5, "942xx", 40, "flu"),
        (6, "943xx", 50, "cold"),
    ]
    return spark.createDataFrame(rows, "id long, zip string, age int, diag string")


class TestKAnonymity:
    def test_per_k_report(self, spark, people):
        got = {r["k"]: (r["n_groups"], r["n_violating_groups"],
                        r["n_rows_at_risk"], r["min_group_size"])
               for r in k_anonymity_audit(people, ["zip", "age"], ks=(2, 3, 4)).collect()}
        # sizes: 3, 2, 1 -> k=2 violated by the size-1 group only;
        # k=3 by sizes 2 and 1; k=4 by all three
        assert got[2] == (3, 1, 1, 1)
        assert got[3] == (3, 2, 3, 1)
        assert got[4] == (3, 3, 6, 1)

    def test_guards(self, spark, people):
        with pytest.raises(ValueError, match="QI column"):
            k_anonymity_audit(people, [], ks=(2,))
        with pytest.raises(ValueError, match="positive"):
            k_anonymity_audit(people, ["zip"], ks=(0,))


class TestLDiversity:
    def test_per_l_report(self, spark, people):
        got = {r["l"]: (r["n_groups"], r["n_violating_groups"],
                        r["n_rows_at_risk"], r["min_distinct"])
               for r in l_diversity_audit(
                   people, ["zip"], "diag", ls=(2, 3)).collect()}
        # zip groups: 941xx {flu, cold} ndist=2 sz=3; 942xx {flu} ndist=1 sz=2;
        # 943xx {cold} ndist=1 sz=1
        assert got[2] == (3, 2, 3, 1)
        assert got[3] == (3, 3, 6, 1)

    def test_guards(self, spark, people):
        with pytest.raises(ValueError, match="QI column"):
            l_diversity_audit(people, [], "diag", ls=(2,))
        with pytest.raises(ValueError, match="positive"):
            l_diversity_audit(people, ["zip"], "diag", ls=(-1,))


class TestTClosenessAudit:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, s string")

    def test_uniform_groups_have_zero_tv(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.privacy import (
            t_closeness_audit,
        )

        # every group mirrors the global 50/50 split exactly
        rows = [(g, s) for g in ("a", "b") for s in ("x", "y") for _ in range(5)]
        out = t_closeness_audit(self._df(spark, rows), ["g"], "s").collect()
        assert all(r.max_tv_ppm == 0 and r.n_violating_groups == 0 for r in out)

    def test_skewed_group_flagged(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.privacy import (
            t_closeness_audit,
        )

        # group 'leaky' is 100% 'x'; global is 60% x / 40% y
        rows = [("leaky", "x")] * 20 + [("ok", "x")] * 10 + [("ok", "y")] * 20
        out = {r.t_ppm: r for r in t_closeness_audit(
            self._df(spark, rows), ["g"], "s", t_ppms=(100_000, 900_000)
        ).collect()}
        # tv(leaky) = 0.5*(|1-0.6| + |0-0.4|) = 0.4 -> 400_000 ppm
        assert out[100_000].max_tv_ppm == 400_000
        assert out[100_000].n_violating_groups >= 1
        assert out[100_000].n_rows_at_risk >= 20
        assert out[900_000].n_violating_groups == 0

    def test_missing_cell_counts(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.privacy import (
            t_closeness_audit,
        )

        # group 'b' never sees sensitive value 'x' — the spine must
        # charge it |0 - p(x)| mass, not silently skip the cell
        rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "y")] * 10
        out = t_closeness_audit(self._df(spark, rows), ["g"], "s",
                                t_ppms=(1,)).collect()[0]
        # global p(x) = 0.25; tv(b) = 0.5*(0.25 + |1 - 0.75|) = 0.25
        assert out.max_tv_ppm == 250_000

    def test_guards(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.privacy import (
            t_closeness_audit,
        )

        df = self._df(spark, [("a", "x")])
        with _pt.raises(ValueError):
            t_closeness_audit(df, [], "s")
        with _pt.raises(ValueError):
            t_closeness_audit(df, ["g"], "s", t_ppms=(0,))
