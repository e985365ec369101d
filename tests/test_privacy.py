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
