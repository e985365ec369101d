"""Build the /tmp/sf1 fixture: 10x keyed replication of sf0.1.

The SCALE.md protocol (round 6 onward): every key-bearing column in a
replica is offset by (max(key) + 1) * replica_index, so FK families
stay consistent and join cardinalities scale like the real TPC-H
generator's (1.5M orders x 6M lineitem at sf1); dimension tables
(region, nation) are copied unchanged.  Text/vector payloads replicate
VERBATIM — deliberate: duplicated names/embeddings are the worst case
for dedup/fuzzy operators, which is exactly what the scale rows are
meant to expose.

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

# table -> columns offset per replica (dims untouched; nationkeys are
# dimension FKs, so they replicate unchanged too).
OFFSET_KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-sf1")
    os.makedirs(dst, exist_ok=True)
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out = f"{dst}/{table}.parquet"
        if not keys:
            df.write.mode("overwrite").parquet(out)
            print(f"{table}: copied unchanged")
            continue
        maxes = df.agg(
            *[(F.max(k) + F.lit(1)).alias(k) for k in keys]
        ).first()
        rep = df.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("_r") * F.lit(maxes[k]))
        rep.drop("_r").write.mode("overwrite").parquet(out)
        print(f"{table}: {df.count()} x {n} replicas (offset {keys})")
    spark.stop()


if __name__ == "__main__":
    main()
