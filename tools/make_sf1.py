"""Build the /tmp/sf1 fixture: 10x keyed replication of sf0.1.

The SCALE.md protocol (round 6 onward): every key-bearing column in a
replica is offset by a per-KEY-FAMILY stride, so FK families stay
consistent and join cardinalities scale like the real TPC-H
generator's (1.5M orders x 6M lineitem at sf1); dimension tables
(region, nation) are copied unchanged.  Text/vector payloads replicate
VERBATIM — deliberate: duplicated names/embeddings are the worst case
for dedup/fuzzy operators, which is exactly what the scale rows are
meant to expose.

Stride derivation (ADVICE r8): each family's stride comes from the
REFERENCED PK table's max (max(c_custkey) + 1 for the custkey family),
never from a referencing table's own FK max — on a fixture where the
trailing PK values have no FK references (real TPC-H: o_custkey skips
every third customer), per-table maxes diverge and replicas >= 1 get
orphaned FKs, silently distorting the join cardinalities the scale
rows measure.  One stride per family keeps PK and FK aligned in every
replica by construction.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [n_replicas]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1, 10 replicas.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

# key family -> (PK table, PK column) the stride derives from
FAMILIES: dict[str, tuple[str, str]] = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# table -> {column: key family} (dims untouched; nationkeys are
# dimension FKs, so they replicate unchanged too).
OFFSET_KEYS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-sf1")
    os.makedirs(dst, exist_ok=True)
    strides: dict[str, int] = {}
    for fam, (tbl, col) in FAMILIES.items():
        m = spark.read.parquet(f"{src}/{tbl}.parquet").agg(F.max(col)).first()[0]
        strides[fam] = int(m) + 1
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out = f"{dst}/{table}.parquet"
        if not keys:
            df.write.mode("overwrite").parquet(out)
            print(f"{table}: copied unchanged")
            continue
        rep = df.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        for k, fam in keys.items():
            rep = rep.withColumn(k, F.col(k) + F.col("_r") * F.lit(strides[fam]))
        rep.drop("_r").write.mode("overwrite").parquet(out)
        print(
            f"{table}: {df.count()} x {n} replicas "
            f"(offset {{{', '.join(f'{k}: {strides[f]}' for k, f in keys.items())}}})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
