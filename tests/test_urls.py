"""URL hygiene (operators/urls.py): extraction correctness on messy
URLs, blocklist semantics, registrable-domain grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.urls import (
    registrable_domain,
    url_blocklist_filter,
    url_host,
    url_path,
    with_url_parts,
)


def _df(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


class TestUrlParts:
    def test_host_and_path_extraction(self, spark):
        cases = {
            "https://WWW.Example.COM/a/b?q=1#f": ("www.example.com", "/a/b"),
            "http://example.com": ("example.com", ""),
            "https://example.com/?only=query": ("example.com", "/"),
            "https://example.com:8080/x": ("example.com:8080", "/x"),
            "ftp://files.example.org/pub/f.txt": ("files.example.org", "/pub/f.txt"),
            "not a url": ("", ""),
            "/relative/path": ("", ""),
            "": ("", ""),
        }
        df = with_url_parts(_df(spark, list(cases)))
        got = {r["url"]: (r["host"], r["path"]) for r in df.collect()}
        for u, exp in cases.items():
            assert got[u] == exp, u

    def test_registrable_domain(self, spark):
        cases = {
            "news.bbc.co.uk": "co.uk",       # depth=2 naive cut (documented)
            "www.example.com": "example.com",
            "example.com": "example.com",
            "localhost": "localhost",         # fewer labels than depth
        }
        df = spark.createDataFrame(
            [(h,) for h in cases], "host string"
        ).select("host", registrable_domain(F.col("host")).alias("d"))
        got = {r["host"]: r["d"] for r in df.collect()}
        assert got == cases

    def test_registrable_domain_depth3(self, spark):
        df = spark.createDataFrame([("news.bbc.co.uk",)], "host string").select(
            registrable_domain(F.col("host"), depth=3).alias("d")
        )
        assert df.first()["d"] == "bbc.co.uk"


class TestBlocklistFilter:
    def test_blocked_and_malformed_dropped(self, spark):
        df = _df(
            spark,
            [
                "https://good.example.com/a",
                "https://BAD.example.com/x",   # blocked (case-insensitive)
                "garbage",                      # malformed -> dropped
                "https://also-good.example.com/",
            ],
        )
        out = url_blocklist_filter(df, ["bad.example.com"])
        hosts = sorted(r["host"] for r in out.collect())
        assert hosts == ["also-good.example.com", "good.example.com"]

    def test_zero_shuffle_plan(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (
            count_exchanges,
        )

        df = _df(spark, ["https://a.example.com/x"])
        out = url_blocklist_filter(df, ["b.example.com"])
        assert count_exchanges(out) == 0  # pure codegen filter, streamable


class TestUrlCanonicalize:
    """Canonical URL form (operators/urls.py::url_canonicalize, r9)."""

    def test_each_messiness_class_collapses(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.urls import (
            url_canonicalize,
        )
        from pyspark.sql import functions as F

        want = "https://a.example.com/page/1?a=1&b=2"
        variants = [
            "https://a.example.com/page/1?a=1&b=2",      # already canonical
            "https://A.EXAMPLE.COM/page/1?a=1&b=2",      # host case
            "https://a.example.com:443/page/1?a=1&b=2",  # default port
            "https://a.example.com/page/1?b=2&a=1",      # param order
            "https://a.example.com/page/1?a=1&utm_source=x&b=2",  # tracking
            "https://a.example.com/page/1?a=1&b=2#frag",  # fragment
        ]
        got = {
            r["c"]
            for r in _df(spark, variants)
            .select(url_canonicalize(F.col("url")).alias("c"))
            .collect()
        }
        assert got == {want}
        # trailing slash and bare path normalize together
        got2 = [
            r["c"]
            for r in _df(spark, ["https://h.example.com/x/", "https://h.example.com/x"])
            .select(url_canonicalize(F.col("url")).alias("c"))
            .collect()
        ]
        assert got2[0] == got2[1] == "https://h.example.com/x"

    def test_http_80_stripped_https_80_kept(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.urls import (
            url_canonicalize,
        )
        from pyspark.sql import functions as F

        got = [
            r["c"]
            for r in _df(
                spark, ["http://h.example.com:80/x", "https://h.example.com:80/x"]
            ).select(url_canonicalize(F.col("url")).alias("c")).collect()
        ]
        assert got[0] == "http://h.example.com/x"
        assert got[1] == "https://h.example.com:80/x"  # NOT the default port

    def test_malformed_canonicalizes_empty(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.urls import (
            url_canonicalize,
        )
        from pyspark.sql import functions as F

        got = _df(spark, ["not a url"]).select(
            url_canonicalize(F.col("url")).alias("c")
        ).first()["c"]
        assert got == ""

    def test_dupes_report(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.urls import (
            url_canonical_dupes,
        )

        df = _df(
            spark,
            [
                "https://a.example.com/x?p=1",
                "https://A.example.com/x/?p=1&utm_source=z",
                "https://b.example.com/solo",
            ],
        )
        rows = url_canonical_dupes(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["canon_url"] == "https://a.example.com/x?p=1"
        assert (r["n_rows"], r["n_variants"], r["first_id"]) == (2, 2, 0)
