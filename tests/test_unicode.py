"""Unicode NFC normalization (functions/unicode.py)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.unicode import (
    nfc_normalize_udf,
    nfc_stats,
)


class TestNfcNormalize:
    def test_composes_decomposed_forms(self, spark):
        nfd = unicodedata.normalize("NFD", "café déjà vu")
        df = spark.createDataFrame([(nfd,), ("ascii only",), (None,)], "t string")
        got = [r["c"] for r in df.select(nfc_normalize_udf(F.col("t")).alias("c")).collect()]
        assert got[0] == "café déjà vu"
        assert got[1] == "ascii only"
        assert got[2] is None

    def test_stats_report(self, spark):
        nfd = unicodedata.normalize("NFD", "éé")  # 4 code points -> 2
        df = spark.createDataFrame(
            [(nfd, "fr"), ("plain", "fr"), ("more plain", "en")],
            "text string, lang string",
        )
        got = {r["lang"]: (r["n_rows"], r["n_changed"], r["len_delta"])
               for r in nfc_stats(df, group_col="lang").collect()}
        assert got["fr"] == (2, 1, 2)
        assert got["en"] == (1, 0, 0)

    def test_corpus_wide_grouping(self, spark):
        df = spark.createDataFrame([("abc",)], "text string")
        r = nfc_stats(df).first()
        assert (r["n_rows"], r["n_changed"], r["len_delta"]) == (1, 0, 0)
