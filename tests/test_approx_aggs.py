"""Approximate aggregates: accuracy envelopes vs exact, and
partitioning-invariance of the sketch merges (the property that makes
them safe to use distributed)."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    _events,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_accuracy(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_count_distinct_partitioning_invariant(spark):
    ev = _events(spark, SF)
    a = ev.select(F.approx_count_distinct("user_id")).first()[0]
    b = ev.repartition(17).select(F.approx_count_distinct("user_id")).first()[0]
    # HLL merge is order/partitioning-insensitive: identical estimate
    assert a == b


def test_approx_percentile_close_to_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    approx, exact = orders.select(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("e"),
    ).first()
    assert abs(approx - exact) / exact < 0.01


def test_hll_sketch_agg_mergeable(spark):
    """hll_sketch_agg partials unioned across two halves == whole."""
    ev = _events(spark, SF)
    whole = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).first()["n"]
    halves = (
        ev.withColumn("_h", F.col("event_id") % 2)
        .groupBy("_h")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()["n"]
    )
    assert whole == halves
