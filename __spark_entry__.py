"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship exact-KNN query at sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's operator inventory as
(PySpark callable, DuckDB oracle) pairs; see
postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark/queries/ (per-family modules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["q2_knn_l2_top5"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
