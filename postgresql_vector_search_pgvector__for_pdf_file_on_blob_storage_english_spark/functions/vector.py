"""Vector distance expressions as native Spark higher-order functions.

These implement the pgvector operator family the reference relies on —
``<->`` (L2, the only one the reference uses: SSEOpenAIController.java:315-316),
plus the obvious siblings ``<=>`` (cosine) and ``<#>`` (negative inner
product) — entirely with ``zip_with``/``aggregate``/``transform`` so the
math stays inside whole-stage codegen on the JVM.  No Python UDF in the
hot path: at 100 TB this is the difference between an Arrow round-trip
per batch and pure Tungsten execution.

Accumulation is sequential left-to-right (``aggregate`` semantics), in
double precision regardless of the storage type (float4 arrays, matching
pgvector's storage), so results are deterministic across partitionings —
a requirement for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def l2_distance_sq(a: Column | str, b: Column | str) -> Column:
    """Sum of squared differences, double precision, sequential order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: (_as_double(x) - _as_double(y)) * (_as_double(x) - _as_double(y)))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """pgvector ``<->``: Euclidean distance sqrt(sum((x-y)^2))."""
    return F.sqrt(l2_distance_sq(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def negative_inner_product(a: Column | str, b: Column | str) -> Column:
    """pgvector ``<#>``: negative inner product (ascending = most similar)."""
    return -dot_product(a, b)


def vector_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: _as_double(x) * _as_double(x))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (vector_norm(a) * vector_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """pgvector ``<=>``: 1 - cosine similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


DISTANCE_FNS = {
    "l2": l2_distance,
    "l2sq": l2_distance_sq,
    "cosine": cosine_distance,
    "dot": negative_inner_product,
}
