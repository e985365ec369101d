"""Cold-process A/B for the batch-5 centroid localization: each
invocation is ONE fresh process (bench-like cold session) timing the
two IVF-PQ fixture entries on the bench basis.  `variant` chooses the
live `_local_centroids` (localized collect) or a monkeypatched lazy
corpus branch (the pre-batch-5 form).  A wrapper alternates processes.

Usage: python tools/ab_cold_ivfpq.py {local|lazy}
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    variant = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if variant == "lazy":
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            ann_ivf_lsh as al,
            pq_quantization as pq,
        )

        def lazy_centroids(spark, emb, n=al._N_CENTROIDS):
            return emb.filter(F.col("vec_id") < n).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            )

        al._local_centroids = lazy_centroids
        pq._local_centroids = lazy_centroids

    spark = get_spark("ab_cold")
    # bench regime: these entries run ~35 and ~100 queries into a warm
    # session; approximate with a few unrelated warmup queries so the
    # timed lines pay plan construction + execution, not JVM warmup
    for wname in ("q2_knn_l2_top5", "ann_ivf_search", "pq_adc_search_top5"):
        wfn, _ = REGISTRY[wname]
        wfn(spark, sf).write.mode("overwrite").format("noop").save()
    out = {}
    for name in ("ann_ivfpq_probe", "ann_ivfpq_index_search"):
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        df = fn(spark, sf)
        df.write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 3)
    print(variant, out, flush=True)


if __name__ == "__main__":
    main()
