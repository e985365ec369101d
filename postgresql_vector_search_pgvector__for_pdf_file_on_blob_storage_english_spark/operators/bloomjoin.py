"""Bloom-filter runtime pre-filter for selective semi-joins.

The shape Spark's own runtime row-filtering (InjectRuntimeFilter) and
every warehouse's "bloom pushdown" implement: when a big fact table is
semi-joined to a *selective* dim-side key set, first knock out the bulk
of the fact rows with a broadcast bitset built from the dim keys, THEN
run the exact semi-join over the survivors.  At 100 TB the win is that
the exact join's shuffle carries only rows that already passed the
filter — the bloom stage itself is shuffle-free on the fact side
(broadcast hash semi-joins, whole-stage codegen).

Design notes for the 1000-executor case:

* The filter is represented RELATIONALLY, not as a driver-side bitset:
  for each of ``n_hashes`` seeded hash functions, the distinct bucket
  ids ``xxhash64(key, seed) pmod n_buckets`` of the build side — at most
  ``n_hashes`` DataFrames of ``<= n_buckets`` rows each, regardless of
  build-side cardinality.  No ``collect()``; the buckets reach the fact
  side as broadcast LeftSemi hash joins.
* A fact row survives only if ALL ``n_hashes`` bucket probes hit —
  exactly a Bloom filter's AND-of-bits membership test, as a conjunction
  of semi-joins.  False positives are possible (removed by the final
  exact join), false negatives are not.
* Correctness never depends on the hash: ``bloom_semi_join`` finishes
  with a plain LeftSemi join on the real key, so the result is
  bit-identical to ``big.join(small, key, "left_semi")`` for ANY
  ``n_buckets``/``n_hashes`` — which is what lets an oracle gate it with
  a plain ``IN`` subquery.

Reference anchor: the reference engine has no analytic twin (its joins
are row-at-a-time JDBC lookups); this is the Spark-native scale
operator a 100 TB corpus needs for "join the 0.1% of orders that
matched a filter against their lineitems".
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_bucket_tables",
    "bloom_bucket_rows",
    "bloom_prefilter",
    "bloom_prefilter_with",
    "bloom_semi_join",
]


def _bucket(key: Column, seed: int, n_buckets: int) -> Column:
    # xxhash64 over (key, seed) gives n_hashes independent hash families
    # from the one builtin; pmod keeps the bucket id non-negative.
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_buckets))


def bloom_bucket_tables(
    build: DataFrame,
    key: str,
    n_buckets: int = 1 << 13,
    n_hashes: int = 2,
) -> list[DataFrame]:
    """The filter itself: one ``<= n_buckets``-row DataFrame of distinct
    occupied bucket ids per hash family.  Partial (map-side) aggregation
    caps each exchange at ``n_buckets`` rows per task — the build side
    streams through once, nothing scales with its row count."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    return [
        build.select(_bucket(F.col(key), seed, n_buckets).alias("_bloom_bucket")).distinct()
        for seed in range(n_hashes)
    ]


def bloom_bucket_rows(
    build: DataFrame,
    key: str,
    n_buckets: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """The filter in long format ``(seed, bucket)`` — the persistable /
    streamable form (at most ``n_hashes * n_buckets`` rows).  The merge
    law is SET UNION (a bloom filter is an OR of bitsets), so folding
    appended batches with ``distinct`` reproduces the one-shot filter
    exactly — the same associative-merge contract the count-min and HLL
    logs rely on (streaming/sketch_stream.py)."""
    tables = bloom_bucket_tables(build, key, n_buckets, n_hashes)
    return reduce(
        DataFrame.unionAll,
        [
            t.select(F.lit(seed).alias("seed"), F.col("_bloom_bucket").alias("bucket"))
            for seed, t in enumerate(tables)
        ],
    )


def bloom_prefilter_with(
    fact: DataFrame,
    bucket_rows: DataFrame,
    fact_key: str,
    n_buckets: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """:func:`bloom_prefilter` against a PREBUILT ``(seed, bucket)``
    filter relation (from :func:`bloom_bucket_rows`, a persisted
    artifact, or a drained streaming log) — the deployed probe path
    where the filter is maintained incrementally rather than rebuilt
    per query.

    Validates that the relation covers EXACTLY seeds ``0..n_hashes-1``
    before probing (a bounded ``n_hashes``-row aggregate): a filter
    built with fewer hashes — or a corrupted/partial log — would yield
    an empty bucket set for some seed, and the semi-join conjunction
    would silently drop EVERY fact row, breaking the no-false-negative
    contract (ADVICE r6)."""
    present = sorted(
        r["seed"]
        for r in bucket_rows.select("seed").distinct().collect()
    )
    if present != list(range(n_hashes)):
        raise ValueError(
            f"bloom filter relation covers seeds {present}, expected "
            f"exactly 0..{n_hashes - 1}; refusing to probe (a missing "
            "seed would silently drop all fact rows)"
        )
    out = fact
    for seed in range(n_hashes):
        buckets = bucket_rows.filter(F.col("seed") == seed).select(
            F.col("bucket").alias("_bloom_bucket")
        )
        out = out.join(
            F.broadcast(buckets),
            _bucket(F.col(fact_key), seed, n_buckets) == F.col("_bloom_bucket"),
            "left_semi",
        )
    return out


def bloom_prefilter(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_buckets: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """Fact rows whose key *might* be in ``build[build_key]`` (superset
    of the exact semi-join; no false negatives).  Plan: ``n_hashes``
    broadcast LeftSemi joins on the bucket column — zero fact-side
    exchanges, the probe stays inside the scan's codegen stage."""
    out = fact
    for seed, buckets in enumerate(
        bloom_bucket_tables(build, build_key, n_buckets, n_hashes)
    ):
        out = out.join(
            F.broadcast(buckets),
            _bucket(F.col(fact_key), seed, n_buckets) == F.col("_bloom_bucket"),
            "left_semi",
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_buckets: int = 1 << 13,
    n_hashes: int = 2,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN build`` with a bloom pre-filter: the
    final join's input (and therefore its shuffle, when build is too big
    to broadcast) carries only pre-filter survivors."""
    pre = bloom_prefilter(fact, build, fact_key, build_key, n_buckets, n_hashes)
    return pre.join(
        build.select(F.col(build_key).alias(fact_key)),
        fact_key,
        "left_semi",
    )
