# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _DD_NORMALIZE,
    _register,
    _t,
    dd_sql,
    normalize_whitespace_col,
)
# Corpus statistics for tokenizer/vocab training and batch packing.
# ==========================================================================

def _vocab_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: distinct words with document and total
    frequencies, min-df filtered, top-200 — the wordpiece-precursor
    scan.  explode -> two-level agg; the shuffle key is the word."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim(normalize_whitespace_col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.groupBy("w")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= 5)
        .orderBy(F.col("tf").desc(), "w")
        .limit(200)
    )


_register(
    "vocab_top_words",
    _vocab_top_words,
    f"""
WITH words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
)
SELECT w, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM words GROUP BY w HAVING count(DISTINCT doc_id) >= 5
ORDER BY tf DESC, w LIMIT 200
""",
)


def _tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped TF-IDF: the 3 most characteristic terms per language —
    term frequency within the language group times global inverse
    document frequency (ln(N/df)).  The per-group keyword extraction a
    corpus report runs.  Tokenization is the engine-wide normalize+split
    convention; ranking uses the UNROUNDED score (bit-identical in both
    engines: integer tf, one ln, one multiply) with a term tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.trim(normalize_whitespace_col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tf = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        words.select("doc_id", "w").distinct().groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("_n") / F.col("df")))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.col("score").desc(), "w")
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "w", "tf", "df", F.round("score", 4).alias("tfidf"))
    )


_register(
    "text_tfidf_top_terms_per_lang",
    _tfidf_top_terms,
    f"""
WITH words AS (
  SELECT doc_id, lang, w
  FROM (SELECT doc_id, lang, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
tf AS (SELECT lang, w, count(*) AS tf FROM words GROUP BY lang, w),
df AS (SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM words) GROUP BY w),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.lang, tf.w, tf.tf, df.df, tf.tf * ln(n.n_docs / df.df) AS score
  FROM tf JOIN df USING (w), n
)
SELECT lang, row_number() OVER (PARTITION BY lang ORDER BY score DESC, w) AS rank,
       w, tf, df, round(score, 4) AS tfidf
FROM scored
QUALIFY rank <= 3
""",
)


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram counts (language-model n-gram statistics)."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(normalize_whitespace_col("text")), " ")
    staged = docs.select("doc_id", words.alias("_w"))
    k = F.size("_w") - 1
    bigrams = staged.select(
        F.explode(
            F.when(
                k >= 1,
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.element_at("_w", i), F.element_at("_w", i + 1)),
                ),
            ).otherwise(F.array())
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram").limit(100)
    )


_register(
    "bigram_counts_top100",
    _bigram_counts,
    f"""
WITH w AS (
  SELECT string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS ws FROM documents
),
bg AS (
  SELECT ws[i] || ' ' || ws[i+1] AS bigram
  FROM w, unnest(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
)
SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 100
""",
)


def _length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for padded-batch packing: docs binned
    by token count into power-of-2 buckets, with per-bucket stats the
    batch planner needs (count, token sum, padding waste)."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(normalize_whitespace_col("text")), " "))
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(n_tok.cast("double")))).cast("long")
    staged = docs.select(n_tok.alias("n_tok"), bucket.alias("bucket"))
    return (
        staged.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            (F.sum(F.col("bucket") - F.col("n_tok"))).cast("long").alias("padding_waste"),
        )
        .orderBy("bucket")
    )


_register(
    "length_bucket_packing",
    _length_buckets,
    f"""
WITH t AS (
  SELECT len(string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ')) AS n_tok
  FROM documents
),
b AS (SELECT n_tok, (2 ** ceil(log2(n_tok)))::BIGINT AS bucket FROM t)
SELECT bucket, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_tokens,
       sum(bucket - n_tok)::BIGINT AS padding_waste
FROM b GROUP BY bucket ORDER BY bucket
""",
)


# ==========================================================================
# Subquery shapes: scalar subquery + correlated EXISTS (Catalyst's
# decorrelation exercised through the SQL surface).
# ==========================================================================

def _subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM _orders_sq
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM _orders_sq)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
        """
    )


_register(
    "subquery_scalar_above_avg",
    _subquery_scalar,
    """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)


def _tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_q4")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM _orders_q4
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
            SELECT 1 FROM _lineitem_q4
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


_register(
    "tpch_q4_order_priority",
    _tpch_q4_order_priority,
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)


# ==========================================================================


# ==========================================================================
# Zipf slope (round 10): the log-log OLS slope over the top-100 word
# frequencies — the corpus-health fingerprint (natural text ~ -1;
# boilerplate-heavy or synthetic corpora drift off).  Both ln() inputs
# are quantized to micro-nats FIRST (identical BIGINTs cross-engine),
# so every sum is exact integer arithmetic and the slope is one
# explicit floor division — no float accumulation order anywhere.
# The ordered window ranks the top-100 LIMIT output (bounded by
# construction; allowlisted in the plan sweep).
# ==========================================================================

_ZIPF_TOP = 100


def _vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.trim(normalize_whitespace_col("text")), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    top = (
        words.groupBy("w")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "w")
        .limit(_ZIPF_TOP)
    )
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("tf").desc(), "w"))
    ).select(
        F.floor(F.log(F.col("r").cast("double")) * 1_000_000 + 0.5)
        .cast("decimal(38,0)").alias("xq"),
        F.floor(F.log(F.col("tf").cast("double")) * 1_000_000 + 0.5)
        .cast("decimal(38,0)").alias("yq"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_words",
        """CAST(CASE WHEN n * sxy - sx * sy >= 0
                THEN ((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)
                ELSE -((-(n * sxy - sx * sy) * 1000000 + (n * sxx - sx * sx) - 1)
                       div (n * sxx - sx * sx))
           END AS BIGINT) AS zipf_slope_micro""",
    )


_DD_ZIPF = f"""
WITH words AS (
  SELECT w
  FROM (SELECT {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
top AS (
  SELECT w, count(*)::BIGINT AS tf FROM words GROUP BY w
  ORDER BY tf DESC, w LIMIT {_ZIPF_TOP}
),
ranked AS (
  SELECT CAST(floor(ln(row_number() OVER (ORDER BY tf DESC, w)::DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS xq,
         CAST(floor(ln(tf::DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS yq
  FROM top
),
agg AS (
  SELECT count(*)::HUGEINT AS n, sum(xq) AS sx, sum(yq) AS sy,
         sum(xq * yq) AS sxy, sum(xq * xq) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_words,
       CAST(CASE WHEN n * sxy - sx * sy >= 0
            THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
            ELSE -((-(n * sxy - sx * sy) * 1000000 + (n * sxx - sx * sx) - 1)
                   // (n * sxx - sx * sx))
       END AS BIGINT) AS zipf_slope_micro
FROM agg
"""

_register("vocab_zipf_slope", _vocab_zipf, _DD_ZIPF)


# ==========================================================================
# OOV-rate curve (round 10): token coverage vs vocabulary size — the
# tokenizer-ROI curve ("how big must the vocab be before <unk> is
# rare").  One TakeOrdered top-1000 (bounded), ranked within that
# bounded relation (allowlisted), then per-k coverage sums — the fact
# table is touched by one word-count groupBy only.  All exact ppm.
# ==========================================================================

_OOV_KS = (100, 300, 1000)


def _vocab_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.trim(normalize_whitespace_col("text")), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    counts = words.groupBy("w").agg(F.count("*").alias("tf"))
    total = counts.agg(F.sum("tf").alias("n")).first()["n"]
    top = counts.orderBy(F.col("tf").desc(), "w").limit(max(_OOV_KS))
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("tf").desc(), "w"))
    )
    per_k = ranked.select(
        "tf", F.explode(F.array(*[F.lit(k) for k in _OOV_KS])).alias("k")
    ).filter(F.col("r") <= F.col("k"))
    return (
        per_k.groupBy("k")
        .agg(F.sum("tf").alias("vocab_tokens"))
        .selectExpr(
            "k",
            "vocab_tokens",
            f"CAST({total} AS BIGINT) - vocab_tokens AS oov_tokens",
            f"CAST(((CAST({total} AS BIGINT) - vocab_tokens) * CAST(1000000 AS BIGINT)) div {total} AS BIGINT) AS oov_ppm",
        )
        .orderBy("k")
    )


_DD_OOV = f"""
WITH words AS (
  SELECT w
  FROM (SELECT {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
counts AS (SELECT w, count(*)::BIGINT AS tf FROM words GROUP BY w),
tot AS (SELECT sum(tf)::BIGINT AS n FROM counts),
top AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, w) AS r
  FROM (SELECT w, tf FROM counts ORDER BY tf DESC, w LIMIT {max(_OOV_KS)})
),
per_k AS (
  SELECT tf, k FROM top, unnest([{", ".join(str(k) for k in _OOV_KS)}]) AS t(k)
  WHERE r <= k
)
SELECT k, sum(tf)::BIGINT AS vocab_tokens,
       max(n) - sum(tf)::BIGINT AS oov_tokens,
       CAST(((max(n) - sum(tf)) * 1000000) // max(n) AS BIGINT) AS oov_ppm
FROM per_k, tot GROUP BY k ORDER BY k
"""

_register("vocab_oov_rate_curve", _vocab_oov_curve, _DD_OOV)


# ==========================================================================
# Heaps-law vocabulary growth (round 10): distinct words seen within
# the first k documents, k in {100, 250, 500} — the vocab-growth
# curve (Heaps' law, V ~ k^beta) that sizes vocabulary budgets and
# dedup expectations at 100x.  Three filtered distinct-counts over the
# word explode; exact integers.
# ==========================================================================

_HEAPS_KS = (100, 250, 500)


def _vocab_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(normalize_whitespace_col("text")), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    per_k = words.select(
        "doc_id", "w",
        F.explode(F.array(*[F.lit(k) for k in _HEAPS_KS])).alias("k"),
    ).filter(F.col("doc_id") < F.col("k"))
    return (
        per_k.groupBy("k")
        .agg(F.countDistinct("w").alias("vocab_size"))
        .orderBy("k")
    )


_DD_HEAPS = f"""
WITH words AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
)
SELECT k, count(DISTINCT w)::BIGINT AS vocab_size
FROM words, unnest([{", ".join(str(k) for k in _HEAPS_KS)}]) AS t2(k)
WHERE doc_id < k
GROUP BY k ORDER BY k
"""

_register("vocab_heaps_growth", _vocab_heaps, _DD_HEAPS)


# ==========================================================================
# Good-Turing unseen mass + Chao1 richness (round 13): the corpus-
# coverage questions a tokenizer/vocab budget hangs on — "how much
# probability mass belongs to words we have NOT seen yet" (Good-Turing:
# p0 = n1/N, the singleton share, the quantity Katz smoothing reserves)
# and "how many types exist in the population" (Chao1: V + n1^2/(2 n2),
# bias-corrected V + n1(n1-1)/2 when no doubletons).  Complements the
# Heaps/Zipf/OOV trio with the UNSEEN side of the curve.
#
# Exactness: n1/n2/V/N are exact integer counts off one word-frequency
# groupBy; mass is one ppm floor; Chao1's square rides DECIMAL(38,0)/
# HUGEINT (n1^2 would wrap BIGINT past vocab ~3e9).  Scale shape: the
# explode is bytes-linear map work; the only shuffle key is the word;
# the frequency-of-frequencies reduction is a second partial agg over
# the vocab-bounded relation.
# ==========================================================================


def _vocab_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.trim(normalize_whitespace_col("text")), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    tf = words.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("tf").alias("n_tokens"),
        F.sum((F.col("tf") == 1).cast("long")).alias("n1"),
        F.sum((F.col("tf") == 2).cast("long")).alias("n2"),
    )
    return agg.selectExpr(
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST(vocab_size AS BIGINT) AS vocab_size",
        "CAST(n1 AS BIGINT) AS n_singletons",
        "CAST(n2 AS BIGINT) AS n_doubletons",
        "CAST((1000000 * n1) div n_tokens AS BIGINT) AS unseen_mass_ppm",
        """CAST(CASE WHEN n2 > 0
                THEN vocab_size + (CAST(n1 AS DECIMAL(38,0)) * n1) div (2 * n2)
                ELSE vocab_size + (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1)) div 2
           END AS BIGINT) AS chao1_richness""",
    )


_DD_GOOD_TURING = f"""
WITH words AS (
  SELECT w
  FROM (SELECT {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
tf AS (SELECT w, count(*)::BIGINT AS tf FROM words GROUP BY w),
agg AS (
  SELECT count(*)::BIGINT AS vocab_size, sum(tf)::BIGINT AS n_tokens,
         sum((tf = 1)::BIGINT)::BIGINT AS n1,
         sum((tf = 2)::BIGINT)::BIGINT AS n2
  FROM tf
)
SELECT n_tokens, vocab_size, n1 AS n_singletons, n2 AS n_doubletons,
       CAST((1000000 * n1) // n_tokens AS BIGINT) AS unseen_mass_ppm,
       CAST(CASE WHEN n2 > 0
            THEN vocab_size + (n1::HUGEINT * n1) // (2 * n2)
            ELSE vocab_size + (n1::HUGEINT * (n1 - 1)) // 2
       END AS BIGINT) AS chao1_richness
FROM agg
"""

_register("vocab_good_turing_mass", _vocab_good_turing, _DD_GOOD_TURING)
