"""Count-min sketch: fixed-size frequency summaries for unbounded key
domains (Cormode & Muthukrishnan 2005, public algorithm).

The 100 TB use case: estimating per-key frequencies (terms, hosts,
user ids) where the exact groupBy's distinct-key shuffle is itself the
bottleneck or the summary must be tiny/mergeable (cross-day unioning of
sketches is cell-wise addition).  The sketch is a d x w integer matrix;
key k increments cell (i, h_i(k) mod w) for each of d independent
hashes, and the point estimate is the MINIMUM over the d cells — an
OVERESTIMATE with error <= 2N/w at probability 1 - 2^-d, never an
underestimate.

Determinism contract: hashes are the engine-wide stable md5 convention
(``'cm<i>' || '§' || key``), counts are longs — the whole sketch and
every estimate is bit-identical across engines and partitionings, so
the operator is hash-gateable (no engine-specific `hash()`).

Scale shape: building = one map-side-combined groupBy keyed on the
(row, col) CELL — shuffle bounded by d*w cells, NOT by distinct keys
(the whole point); estimating joins probes against the broadcast
d*w-bounded cell table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_hash(key: Column, row: int, width: int) -> Column:
    """Stable hash of ``key`` for sketch row ``row``, in [0, width)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit(f"cm{row}"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` for every non-zero cell
    (absent cell == 0).  One explode of d (row, col) pairs per input
    row, then a partial-aggregated groupBy over at most d*w cells."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth >= 1 and width >= 1, got {depth}, {width}")
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cm_hash(key, i, width).alias("col")
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("c"))
        .groupBy("c.row", "c.col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    est_col: str = "est",
) -> DataFrame:
    """Point-estimate each probe key: min over the d cells it hashes to
    (missing cell = 0).  The sketch is d*w-bounded, so it broadcasts;
    probe cost is independent of the original corpus."""
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cm_hash(key, i, width).alias("col")
            )
            for i in range(depth)
        ]
    )
    exploded = probes.select(key_col, F.explode(pairs).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, public algorithm) — the distinct-
# count twin of the count-min sketch: m = 2^p integer registers, each
# holding the max leading-zero rank seen; merge = element-wise max
# (order-free), estimate = bias-corrected harmonic mean with the
# standard linear-counting small-range correction.  Registers are
# integers and the harmonic sum is computed as an EXACT power-of-two
# long sum (sum of 2^(K - M_j) with K the max rank), so sketches and
# estimates are bit-deterministic across engines and partitionings.
# ---------------------------------------------------------------------------

HLL_P = 6                 # m = 64 registers (~13% rel. error)
HLL_M = 1 << HLL_P
HLL_WBITS = 32 - HLL_P    # rank bits per hash
HLL_ALPHA = 0.709         # alpha_64 (standard constant)


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """Dense register table ``(reg, m_rank)`` — all ``HLL_M`` rows,
    zero for never-hit registers.  One map-side-combined max-aggregate;
    shuffle bounded by m, never by distinct keys."""
    spark = df.sparkSession
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit("hll"), F.col(key_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
    )
    reg = (h % HLL_M).alias("reg")
    w = F.floor(h / HLL_M).cast("long")
    # rank = leading zeros in the (32-p)-bit suffix, + 1; bin() drops
    # leading zeros so rank = WBITS - length(bin(w)) + 1 (w = 0 -> WBITS + 1)
    rank = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    hits = df.select(reg, rank.alias("_r")).groupBy("reg").agg(
        F.max("_r").alias("m_rank")
    )
    spine = spark.range(HLL_M).select(F.col("id").alias("reg"))
    return spine.join(hits, "reg", "left").select(
        "reg", F.coalesce("m_rank", F.lit(0)).cast("long").alias("m_rank")
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row ``(hll_estimate)`` from a register table.  The harmonic
    sum is the exact long ``sum(2^(K - m_rank))`` (K = WBITS + 1), so
    the raw estimate ``alpha * m^2 * 2^K / S`` is bit-deterministic;
    linear counting applies below 2.5m when empty registers remain."""
    k = HLL_WBITS + 1
    agg = registers.agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(k) - F.col("m_rank")).cast("long")
        ).alias("_s"),
        F.sum((F.col("m_rank") == 0).cast("long")).alias("_v"),
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.pow(F.lit(2.0), F.lit(k)) / F.col("_s")
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("_v"))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("_v") > 0), lin).otherwise(raw)
    return agg.select(est.alias("hll_estimate"))


# --------------------------------------------------------------------------
# Base-2 quantile sketch (round 7): mergeable rank/quantile summaries
# for positive integer domains — the DDSketch idea (Masson et al. 2019,
# public algorithm) with POWER-OF-TWO buckets subdivided by the top
# ``sub_bits`` mantissa bits, so the bucket index is pure integer bit
# arithmetic (length(bin(x)), shifts, masks): no log(), no libm, the
# same expression replayable bit-identically in any SQL engine.
#
# Guarantee: a value lands in a bucket spanning [lower, lower + width)
# with width/lower <= 2^-sub_bits, so any reported quantile (the
# bucket's LOWER bound, deterministic) is an underestimate by at most
# that relative error.  Values below 2^sub_bits are stored exactly
# (their own bucket).  Merge law = bucket-count ADDITION — identical to
# count-min, so the log-structured streaming maintenance and the
# replay-dedup batch_id machinery are shared.
#
# Scale shape: building is one map-side-combined groupBy on the bucket
# id — shuffle bounded by the bucket count (<= 64 * 2^sub_bits + 2^sub_bits
# + 1 cells), never by rows or distinct values; quantile extraction
# runs on the bounded summary (triangular cumulative join — no window,
# no single-partition sort).
# --------------------------------------------------------------------------


def qsketch_bucket_col(x: Column, sub_bits: int = 4) -> Column:
    """Bucket id of a positive long: exact for ``x < 2^sub_bits``, else
    ``(e << sub_bits) | mantissa`` where ``e = floor(log2 x)`` (via
    ``length(bin(x)) - 1`` — integer, engine-portable) and mantissa =
    the ``sub_bits`` bits after the leading bit.  Non-positive values
    map to -1 (tracked, excluded from quantiles)."""
    k = sub_bits
    xl = x.cast("long")
    e = F.length(F.bin(xl)) - F.lit(1)
    # shift amounts are COLUMNS here; the F.shiftright helper only takes
    # int literals, so go through the SQL function directly
    m = F.call_function(
        "shiftright", xl, (e - F.lit(k)).cast("int")
    ) - F.lit(1 << k)
    big = F.shiftleft(e.cast("long"), k) + m
    return (
        F.when(xl <= 0, F.lit(-1))
        .when(xl < (1 << k), xl)
        .otherwise(big)
        .cast("long")
    )


def qsketch_lower_col(bucket: Column, sub_bits: int = 4) -> Column:
    """Deterministic representative (LOWER bound) of a bucket id —
    the inverse of :func:`qsketch_bucket_col`'s rounding."""
    k = sub_bits
    e = F.shiftright(bucket, k)
    m = bucket - F.shiftleft(e, k)
    big = F.call_function(
        "shiftleft", m + F.lit(1 << k), (e - F.lit(k)).cast("int")
    )
    return F.when(bucket < (1 << k), bucket).otherwise(big).cast("long")


def qsketch_build(
    df: DataFrame, value_col: str, sub_bits: int = 4
) -> DataFrame:
    """``(bucket, cnt)`` summary of a positive-long column.  One
    map-side-combined groupBy; shuffle bounded by the bucket count."""
    return (
        df.select(qsketch_bucket_col(F.col(value_col), sub_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qsketch_quantiles(
    sketch: DataFrame, quantiles_bp: list[int], sub_bits: int = 4
) -> DataFrame:
    """Quantiles from the summary: for each q (basis points), the lower
    bound of the smallest bucket whose cumulative count reaches rank
    ``ceil(q * N / 10000)`` over the positive domain.  All integer; the
    cumulative is a triangular self-join over the BOUNDED summary (no
    window, no single-partition sort)."""
    pos = sketch.filter(F.col("bucket") >= 0)
    a = pos.select(F.col("bucket").alias("b"))
    cum = (
        a.join(
            pos.select(F.col("bucket").alias("b2"), "cnt"),
            F.col("b2") <= F.col("b"),
        )
        .groupBy("b")
        .agg(F.sum("cnt").alias("cum"))
    )
    total = pos.agg(F.sum("cnt").alias("n"))
    qdf = pos.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles_bp], "q_bp long"
    )
    ranked = (
        qdf.crossJoin(F.broadcast(total))
        # exact integer ceil-division (SQL `div` — a double division
        # would silently round once q_bp * N exceeds 2^53 at corpus
        # scale; same exactness discipline as graph.py's _idiv)
        .withColumn("rank", F.expr("(q_bp * n + 9999) div 10000"))
        .crossJoin(cum)
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q_bp", "n")
        .agg(F.min("b").alias("bucket"))
    )
    return ranked.select(
        "q_bp",
        F.col("n").alias("n_values"),
        qsketch_lower_col(F.col("bucket"), sub_bits).alias("quantile_lower"),
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two HLL register tables: element-wise max — the sketch's
    exact merge law, so est(merge(A, B)) estimates |A ∪ B| exactly as
    if built over the union stream."""
    return (
        a.unionByName(b)
        .groupBy("reg")
        .agg(F.max("m_rank").alias("m_rank"))
    )


def hll_set_estimates(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct-set algebra from two register tables: one row
    ``(est_a, est_b, est_union, est_intersect)`` with the intersection
    by inclusion-exclusion — the standard (bias-prone but mergeable)
    HLL set-operation estimate; the union is exact sketch semantics.
    All three estimates reuse :func:`hll_estimate`'s deterministic
    arithmetic, so the whole relation is SQL-replayable."""
    ea = hll_estimate(a).select(F.col("hll_estimate").alias("est_a"))
    eb = hll_estimate(b).select(F.col("hll_estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(a, b)).select(
        F.col("hll_estimate").alias("est_union")
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersect"
            ),
        )
    )


def qsketch_build_grouped(
    df: DataFrame, group_col: str, value_col: str, sub_bits: int = 4
) -> DataFrame:
    """Per-group quantile summaries in ONE pass: ``(group, bucket,
    cnt)`` — the grouped profiling staple ("p50/p99 order value per
    nation/segment/day").  Shuffle is bounded by groups x buckets,
    never by rows; each group's summary merges independently (bucket
    addition), so cross-day folds stay per-group."""
    return (
        df.select(
            F.col(group_col).alias("grp"),
            qsketch_bucket_col(F.col(value_col), sub_bits).alias("bucket"),
        )
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qsketch_quantiles_grouped(
    sketch: DataFrame, quantiles_bp: list[int], sub_bits: int = 4
) -> DataFrame:
    """Per-group quantiles from a grouped summary: the same rank rule
    as :func:`qsketch_quantiles`, with every stage keyed by group — the
    triangular cumulative join and the min-bucket cut both run within
    groups, so no global sort or single-partition window appears at any
    group count."""
    # the sketch summary is bounded at groups x buckets BY CONSTRUCTION
    # (the operator's whole point) but feeds three consumers (both
    # triangular-join sides + totals) — as a plain branch each consumer
    # re-ran the full build scan (12 source scans at the gated entry;
    # r13 opt).  Pin it once.
    pos = sketch.filter(F.col("bucket") >= 0).localCheckpoint(eager=False)
    cum = (
        pos.select(F.col("grp"), F.col("bucket").alias("b"))
        .join(
            pos.select(
                F.col("grp").alias("g2"), F.col("bucket").alias("b2"), "cnt"
            ),
            (F.col("grp") == F.col("g2")) & (F.col("b2") <= F.col("b")),
        )
        .groupBy("grp", "b")
        .agg(F.sum("cnt").alias("cum"))
    )
    totals = pos.groupBy("grp").agg(F.sum("cnt").alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles_bp], "q_bp long"
    )
    ranked = (
        totals.crossJoin(F.broadcast(qdf))
        .withColumn("rank", F.expr("(q_bp * n + 9999) div 10000"))
        .join(cum, "grp")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("grp", "q_bp", "n")
        .agg(F.min("b").alias("bucket"))
    )
    return ranked.select(
        F.col("grp"),
        "q_bp",
        F.col("n").alias("n_values"),
        qsketch_lower_col(F.col("bucket"), sub_bits).alias("quantile_lower"),
    )


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """SPARSE per-group register table ``(group, reg, m_rank)`` — only
    registers a group actually hit (every hit has rank >= 1, so
    sparsity is unambiguous: a missing row means rank 0).

    One map-side-combined max-aggregate keyed by (group, reg); the
    shuffle is bounded by groups x m, never by distinct keys.  This is
    the calendar-rollup building block: per-group sketches merge by
    register max, so any window/total over groups folds WITHOUT
    re-reading the raw data — the estimate reconstructs the dense sum
    arithmetically (zero registers contribute exactly 2^(WBITS+1) each
    and count toward the linear-counting term), no m-row spine join
    needed.
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit("hll"), F.col(key_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
    )
    reg = (h % HLL_M).alias("reg")
    w = F.floor(h / HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group_col).alias("grp"), reg, rank.alias("_r"))
        .groupBy("grp", "reg")
        .agg(F.max("_r").alias("m_rank"))
        .select(F.col("grp").alias(group_col), "reg", "m_rank")
    )


def hll_estimate_grouped(sparse: DataFrame, group_col: str) -> DataFrame:
    """Per-group ``(group, hll_estimate)`` from a sparse register table
    (:func:`hll_registers_grouped` output or any register-max merge of
    it).  The dense harmonic sum is reconstructed from the sparse rows:
    each of the ``HLL_M - n_present`` zero registers contributes
    exactly ``2^(WBITS+1)`` to the sum and 1 to the linear-counting
    empty count — so the arithmetic is identical to the dense
    :func:`hll_estimate`, without materializing a spine per group."""
    k = HLL_WBITS + 1
    agg = sparse.groupBy(group_col).agg(
        (
            F.sum(F.pow(F.lit(2.0), F.lit(k) - F.col("m_rank")).cast("long"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << k)
        ).alias("_s"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("_v"),
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.pow(F.lit(2.0), F.lit(k)) / F.col("_s")
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("_v"))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("_v") > 0), lin).otherwise(raw)
    return agg.select(group_col, est.alias("hll_estimate"))


# ---------------------------------------------------------------------------
# KMV / theta sketch (Beyer et al. 2007, "On synopses for distinct-value
# estimation under multiset operations" — public algorithm).  Keeps the
# k MINIMUM distinct hash values of a set; kth minimum m_k estimates the
# distinct count as (k-1) * SPACE / m_k.  Unlike HLL's register max,
# the k-minset supports UNBIASED intersection via the merged sketch's
# observed Jaccard — the theta-sketch set-algebra trick — which is why
# both families exist in real sketch libraries (and now here).
# ---------------------------------------------------------------------------

KMV_SPACE = 1 << 60  # hash domain [0, 2^60): 15 md5 hex digits


def kmv_hash(key: Column) -> Column:
    """60-bit positive hash, bit-identical cross-engine: md5 hex prefix
    parsed as an integer (the engine-wide salted-md5 discipline)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("§", F.lit("kmv"), key.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")


def kmv_minset(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """The k smallest DISTINCT hash values of ``df[key_col]`` as an
    ``(hv)`` relation.  Sort + limit compiles to TakeOrderedAndProject
    (partial top-k on every partition, k rows to one reducer) — no
    global window, no single-partition exchange; the sketch is
    mergeable, so a 1000-executor union is k rows per slice.

    NULL keys are dropped BEFORE hashing: ``count(DISTINCT x)`` ignores
    nulls, and hashing them (concat_ws silently skips nulls, yielding
    the salt's own hash) would make the sketch count one phantom value
    the exact twin never sees."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(kmv_hash(F.col(key_col)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def _kmv_point(sketch: DataFrame, k: int, tag: str) -> DataFrame:
    """1-row ``(cnt_<tag>, mk_<tag>)``: sketch size and kth minimum."""
    return sketch.agg(
        F.count(F.lit(1)).alias(f"cnt_{tag}"),
        F.max("hv").alias(f"mk_{tag}"),
    )


def _kmv_est(tag: str, k: int) -> Column:
    """Distinct estimate: exact count while the sketch is unsaturated
    (it then holds EVERY distinct hash), (k-1) * SPACE / m_k once full.
    One double division of exact integers — deterministic cross-engine."""
    return F.when(F.col(f"cnt_{tag}") < k, F.col(f"cnt_{tag}").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col(f"mk_{tag}").cast("double")
    )


def kmv_set_estimates(
    sa: DataFrame, sb: DataFrame, k: int = 64
) -> DataFrame:
    """Set algebra over two k-minsets: distinct estimates for each side,
    the union (merge law: k smallest of the two sketches' union), the
    merged sketch's observed Jaccard (|M ∩ A ∩ B| / |M|), and the
    intersection estimate J * est_union.  Every relation here is <= k
    rows; all joins broadcast."""
    # Each sketch is read by its point stats, the merge, and the
    # membership semi-joins — checkpoint the <= k-row relations so the
    # corpus-sized distinct underneath runs once per side, not per use.
    sa = sa.localCheckpoint(eager=False)
    sb = sb.localCheckpoint(eager=False)
    m = sa.unionAll(sb).distinct().orderBy("hv").limit(k).localCheckpoint(eager=False)
    in_a = m.join(F.broadcast(sa), "hv", "left_semi")
    in_both = in_a.join(F.broadcast(sb), "hv", "left_semi")
    pts = (
        _kmv_point(sa, k, "a")
        .crossJoin(F.broadcast(_kmv_point(sb, k, "b")))
        .crossJoin(F.broadcast(_kmv_point(m, k, "u")))
        .crossJoin(
            F.broadcast(in_both.agg(F.count(F.lit(1)).alias("cnt_shared")))
        )
    )
    est_u = _kmv_est("u", k)
    jac = F.when(
        F.col("cnt_u") > 0,
        F.col("cnt_shared").cast("double") / F.col("cnt_u").cast("double"),
    ).otherwise(F.lit(0.0))
    return pts.select(
        _kmv_est("a", k).alias("est_a"),
        _kmv_est("b", k).alias("est_b"),
        est_u.alias("est_union"),
        jac.alias("jaccard"),
        (jac * est_u).alias("est_intersect"),
    )


# ---------------------------------------------------------------------------
# Hash-priority reservoir: a fixed-size UNIFORM ROW SAMPLE as a
# mergeable summary.  Classic reservoir sampling is sequential; the
# distributed form keeps the k rows with the SMALLEST salted-hash
# priority — any fixed hash of a unique row id is a uniform random
# order, so bottom-k by priority IS a uniform k-sample, and the merge
# law is union-then-truncate exactly like KMV (idempotent: a replayed
# batch contributes identical (hv, payload) rows the distinct fold
# absorbs).  Unlike KMV this carries the ROW PAYLOAD, not just the
# hash — it is a sample, not a cardinality sketch.
# ---------------------------------------------------------------------------


def reservoir_sample(
    df: DataFrame, id_col: str, payload_cols: list[str] | tuple[str, ...], k: int
) -> DataFrame:
    """Bottom-k rows by the 60-bit salted-md5 priority of ``id_col``.

    ``id_col`` must be unique per row (it defines the permutation).
    Sort + limit compiles to TakeOrderedAndProject — per-partition
    top-k, k rows to one reducer, no global sort.  Returns
    ``(hv, <payload_cols>)``."""
    pr = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit("rsv"), F.col(id_col).cast("string"))), 1, 15
        ),
        16, 10,
    ).cast("long")
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(pr.alias("hv"), *payload_cols)
        .orderBy("hv")
        .limit(k)
    )
