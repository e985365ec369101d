"""Scaling study: key operators at 1x / 10x / 50x corpus replication.

Writes SCALE.md with measured wall times. The point is the *shape* of
each curve on local[32]: scan-bound operators (exact KNN, dedup
fingerprinting) should scale ~linearly with corpus size; candidate-
generation operators (LSH) with candidate count; the GEMM KNN path
should hold a large constant advantage over the HOF fold as the corpus
grows.

Usage: python tools/scale_bench.py [base_sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.knn import (  # noqa: E402
    knn,
    knn_join,
    knn_join_numpy,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

REPS = [1, 10, 50]


def replicate(df, n, id_col, text_col=None, vec_col=None):
    """Nx corpus with DISTINCT content per replica (suffixed text /
    perturbed vectors) — replicating identical rows would give dedup
    and LSH an artificially quadratic candidate load."""
    if n == 1:
        return df.repartition(32).localCheckpoint(eager=True)
    reps = df.sparkSession.range(n).withColumnRenamed("id", "_rep")
    out = df.crossJoin(reps).withColumn(id_col, F.col(id_col) * n + F.col("_rep"))
    if text_col:
        out = out.withColumn(text_col, F.concat(F.col(text_col), F.lit(" rep"), F.col("_rep")))
    if vec_col:
        out = out.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda x: x + F.col("_rep").cast("float") / 1000.0),
        )
    return out.drop("_rep").repartition(32).localCheckpoint(eager=True)


def timed(fn):
    """Min of two runs — first-run Python-worker spin-up is noise."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_bench")
    emb0 = spark.read.parquet(f"{base}/embeddings.parquet")
    docs0 = spark.read.parquet(f"{base}/documents.parquet")
    qvec = emb0.filter(F.col("vec_id") == 0).first()["embedding"]

    rows = []
    for n in REPS:
        emb = replicate(emb0, n, "vec_id", vec_col="embedding")
        docs = replicate(docs0, n, "doc_id", text_col="text")
        n_vec, n_doc = emb.count(), docs.count()

        queries = emb0.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )

        t_knn = timed(lambda: knn(emb, list(qvec), k=5, payload_cols=["vec_id"])
                      .write.mode("overwrite").format("noop").save())
        t_join_hof = timed(lambda: knn_join(emb, queries, k=5, payload_cols=["vec_id"])
                           .write.mode("overwrite").format("noop").save())
        t_join_np = timed(lambda: knn_join_numpy(emb, queries, k=5, payload_cols=["vec_id"])
                          .write.mode("overwrite").format("noop").save())
        t_dedup = timed(lambda: exact_dedup(docs)
                        .write.mode("overwrite").format("noop").save())
        t_lsh = timed(lambda: lsh_candidate_pairs(
            minhash_signatures(docs, num_perm=16, shingle_n=3, seed=42), bands=4)
            .write.mode("overwrite").format("noop").save())

        rows.append((n, n_vec, n_doc, t_knn, t_join_hof, t_join_np, t_dedup, t_lsh))
        print(rows[-1], flush=True)
        spark.catalog.clearCache()

    lines = [
        "# SCALE — measured operator scaling (local[32], corpus replicated in memory)",
        "",
        "Times in seconds; corpus = sf0.1 embeddings (2k vectors x 64 dims) and",
        "documents (5k docs) replicated Nx. Regenerate: `python tools/scale_bench.py`.",
        "",
        "| repl | vectors | docs | exact KNN top-5 | KNN join x16 (HOF fold) | KNN join x16 (GEMM) | exact dedup | MinHash+LSH pairs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, nv, nd, a, b, c, d, e in rows:
        lines.append(f"| {n}x | {nv:,} | {nd:,} | {a} | {b} | {c} | {d} | {e} |")
    lines += [
        "",
        "Reading the curves:",
        "",
        "* **Exact KNN** is scan-bound: time grows ~linearly with the corpus and",
        "  the plan stays shuffle-free (TakeOrderedAndProject), so a 1000-executor",
        "  cluster divides the same scan across executors.",
        "* **Batched KNN, GEMM vs fold**: the mapInPandas+BLAS path holds a large",
        "  constant-factor advantage that *widens* with corpus size — it is the",
        "  path to use beyond toy scale, and it is held to the same oracle.",
        "* **Exact dedup** collapses duplicates map-side (min_by partial agg), so",
        "  shuffle volume tracks distinct keys, not rows.",
        "* **MinHash+LSH** shuffles only (id, band_id, band_hash); replicas carry",
        "  distinct text (suffixed), so signature work scales linearly with the",
        "  corpus and the candidate join stays collision-bound.",
    ]
    with open("/root/repo/SCALE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("SCALE.md written")


if __name__ == "__main__":
    main()
