"""URL hygiene for web corpora: host/path extraction, blocklist
filtering, per-host statistics.

C4 and every CommonCrawl-derived pipeline starts with URL-level triage
(Raffel et al. 2020 §2.2: bad-word domain blocklist; RefinedWeb §4.1:
URL filtering before any text is read) — it is the cheapest filter in
the stack because it touches metadata only.  All expressions here are
single regexp/string codegen maps (zero shuffle, streamable) in the
Java-regex/RE2 portable subset, so they mean the same thing in the
DuckDB oracle.  Spark's ``parse_url`` is deliberately NOT used: it is
a Hive UDF (outside codegen) with no portable twin.

The fixtures carry no URL column; registry entries weave deterministic
URLs from (source, doc_id) on both engines — the plumbing is real, the
URLs are synthetic (the multimodal-stub convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host = authority up to the first /, ? or #; path = / to the first ? or #.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host (authority) of a URL; '' when the URL has no
    scheme://host shape."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent); query/fragment excluded."""
    return F.regexp_extract(url, _PATH_RE, 1)


def registrable_domain(host: Column | str, depth: int = 2) -> Column:
    """Last ``depth`` labels of the host — the "domain cap" grouping key
    (news.bbc.co.uk -> co.uk at 2... use depth=3 for ccTLD registries;
    a full public-suffix list is a lookup TABLE, broadcast-joinable, not
    an expression — out of scope here and in C4)."""
    parts = F.split(host if isinstance(host, Column) else F.col(host), r"\.")
    n = F.size(parts)
    start = F.greatest(n - F.lit(depth) + 1, F.lit(1))
    return F.array_join(F.slice(parts, start, depth), ".")


def with_url_parts(
    df: DataFrame, url_col: str = "url", host_col: str = "host", path_col: str = "path"
) -> DataFrame:
    """Adds host/path columns — one codegen projection."""
    return df.withColumn(host_col, url_host(F.col(url_col))).withColumn(
        path_col, url_path(F.col(url_col))
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked_hosts: Sequence[str],
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop rows whose URL host is on the blocklist (exact host match,
    case-insensitive — the C4 shape).  The blocklist is a literal
    ``isin`` here (fine to ~thousands); a million-domain list becomes a
    broadcast anti-join on the same host key.  Malformed URLs (no
    extractable host) are dropped too: no host, no provenance."""
    blocked = sorted({h.lower() for h in blocked_hosts})
    staged = df.withColumn(host_col, url_host(F.col(url_col)))
    return staged.filter(
        (F.col(host_col) != "") & ~F.col(host_col).isin(blocked)
    )


# tracking parameters stripped by canonicalization: the ubiquitous
# click/campaign identifiers that make one page spell a thousand URLs
_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_canonicalize(url: Column | str) -> Column:
    """Canonical URL form — the dedup key for URL-level corpus triage
    (two crawls of one page differ only in case, default port, tracking
    params, fragment, or a trailing slash; canonicalization collapses
    them BEFORE any text is fetched or compared):

    * scheme and host lowercased;
    * default port stripped (``:80`` for http, ``:443`` for https);
    * path with its trailing slash removed ('' and '/' both -> '');
    * query params: tracking ids dropped (``utm_*``/``fbclid``/
      ``gclid``/``msclkid``/``ref``), the rest SORTED so param order
      never distinguishes two URLs;
    * fragment dropped (never sent to the server).

    One codegen projection (regexp extracts + array sort/join) — zero
    shuffle, streamable, portable to the oracle's list functions.
    Malformed URLs (no scheme://host) canonicalize to ''."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1))
    host = url_host(u)
    port_stripped = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(url_path(u), "/$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        port_stripped,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(port_stripped == "", F.lit("")).otherwise(canon)


def url_canonical_dupes(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group rows by canonical URL and report every group that collapses
    more than one RAW variant: ``(canon_url, n_rows, n_variants,
    first_id)``.  The groupBy ships (canonical string, id) — the dedup
    signal costs one projection and one key exchange."""
    staged = df.select(
        F.col(id_col), F.col(url_col), url_canonicalize(F.col(url_col)).alias("canon_url")
    ).filter(F.col("canon_url") != "")
    return (
        staged.groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(url_col).alias("n_variants"),
            F.min(id_col).alias("first_id"),
        )
        .filter(F.col("n_variants") > 1)
    )
