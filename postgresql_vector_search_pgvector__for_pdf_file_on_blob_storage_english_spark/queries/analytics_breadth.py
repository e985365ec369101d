# ==========================================================================
# Analytics breadth (round 8, session 2) — relational/text shapes that
# round out the SQL surface a reference user would expect.  Sections
# 1-4 below; the module later grew 5. event-sequence regex mining,
# 6. the chi-square independence profile, 7. MAD robust outliers, and
# 8. exact-median-by-histogram-descent (each documented at its entry):
#
#   * window_function_breadth     — ntile / percent_rank / cume_dist /
#                                   lag / lead / first_value / nth_value
#                                   in one pass (single sort, one window
#                                   spec — Catalyst collapses all seven
#                                   into one Window exec).
#   * join_not_in_vs_not_exists   — NOT IN's three-valued-logic vs NOT
#                                   EXISTS on a NULLable key: Spark plans
#                                   the NOT IN form as a null-aware anti
#                                   join (NAAJ), the NOT EXISTS form as a
#                                   plain left-anti; the entry gates both
#                                   counts so the semantic gap (NULL keys
#                                   kept by NOT EXISTS, dropped by NOT
#                                   IN) is pinned cross-engine.
#   * text_pmi_collocations       — pointwise mutual information over
#                                   corpus bigrams: the classic
#                                   collocation detector (Church & Hanks
#                                   1990).  Ranking uses the exact
#                                   rational (c_ab·NU²)/(NB·c_a·c_b) so
#                                   the winner set is libm-independent;
#                                   ln() appears only in the rounded
#                                   display column.
#   * events_attribution_last_touch — last-touch revenue attribution
#                                   with a 7-day lookback, computed
#                                   shuffle-once per user via
#                                   last(ignorenulls) carry windows —
#                                   no purchase×touch range join.
#
# Scale notes: all four are single-shuffle shapes.  The window entry
# shuffles once on the partition key; NOT IN's NAAJ broadcasts the
# 15-nation subquery; PMI's three count aggregates are map-side partial
# over the token explode; attribution shuffles events once on user_id
# and every window reuses that ordering.
# ==========================================================================
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _DD_NORMALIZE,
    _events,
    _pin_if_large,
    _register,
    _t,
    dd_sql,
)
from ..functions.text import normalize_whitespace_col


# --------------------------------------------------------------------------
# 1. Window-function breadth: one Window spec, seven functions.
# --------------------------------------------------------------------------


def _window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline annotated with every rank/offset
    window family in one pass: row_number, ntile(4), percent_rank,
    cume_dist, lag/lead(o_totalprice), first_value and nth_value(2).
    One shuffle (partitionBy o_custkey), one sort — all seven functions
    share the frame, so Catalyst emits a single Window operator."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


_register(
    "window_function_breadth",
    _window_breadth,
    """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price,
       first_value(o_totalprice) OVER wf AS first_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)


# --------------------------------------------------------------------------
# 2. NOT IN vs NOT EXISTS on a NULLable key (null-aware anti join).
#
# Left key: c_nationkey masked to NULL for customers in arrears
# (c_acctbal < 0 — 122 of 1500 rows at sf0.01).  Subquery: nations with
# a well-capitalized supplier (s_acctbal > 7000 — 15 of 25 nations, so
# the anti joins are non-vacuous).  NOT IN drops NULL-keyed rows
# (NULL <> x is UNKNOWN); NOT EXISTS keeps them (no row satisfies the
# correlation, so the anti condition holds) — the two counts differ by
# exactly the masked-row population that has no nation match.
# Spark plans the NOT IN form as a BroadcastNestedLoopJoin-backed
# null-aware anti join; the NOT EXISTS form is a plain broadcast
# left-anti.
# --------------------------------------------------------------------------

_NIN_MASK = "CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END"
_NIN_SUB = "SELECT s_nationkey FROM supplier WHERE s_acctbal > 7000"


def _not_in_vs_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    cust.createOrReplaceTempView("_nin_customer")
    supp.createOrReplaceTempView("_nin_supplier")
    return spark.sql(
        f"""
        WITH masked AS (
          SELECT {_NIN_MASK} AS key FROM _nin_customer
        ),
        sub AS ({_NIN_SUB.replace("supplier", "_nin_supplier")})
        SELECT 'not_in' AS semantics, CAST(count(*) AS BIGINT) AS n_rows
        FROM masked WHERE key NOT IN (SELECT s_nationkey FROM sub)
        UNION ALL
        SELECT 'not_exists' AS semantics, CAST(count(*) AS BIGINT) AS n_rows
        FROM masked m
        WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.s_nationkey = m.key)
        """
    )


_register(
    "join_not_in_vs_not_exists",
    _not_in_vs_not_exists,
    f"""
WITH masked AS (SELECT {_NIN_MASK} AS key FROM customer),
sub AS ({_NIN_SUB})
SELECT 'not_in' AS semantics, count(*)::BIGINT AS n_rows
FROM masked WHERE key NOT IN (SELECT s_nationkey FROM sub)
UNION ALL
SELECT 'not_exists' AS semantics, count(*)::BIGINT AS n_rows
FROM masked m
WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.s_nationkey = m.key)
""",
)


# --------------------------------------------------------------------------
# 3. PMI collocations.  pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with
# p(a,b) = c_ab/NB over bigrams and p(a) = c_a/NU over unigrams, i.e.
# ln( (c_ab·NU·NU) / (NB·c_a·c_b) ).  The ratio is computed as one
# division of two identically-parenthesized double products of BIGINTs,
# so it is bit-identical cross-engine and safe to ORDER BY; ln() is
# display-only (rounded 4).  min-count floor keeps the rare-pair noise
# (c_ab = 1 maximizes PMI) out of the ranking, as in the original paper.
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 50


def _pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus collocations by PMI.  Three map-side-partial count
    aggregates over one token explode; the unigram join is a broadcast
    (vocab-sized); the final top-k is TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(normalize_whitespace_col("text")), " ")
    # MEASURED (r13): unconditionally pinning the vocab-sized uni/big
    # aggregates (to cap the corpus tokenize at 2 passes instead of 6)
    # ran SLOWER at sf0.1 in both the alternating warm A/B
    # (med 1.26 -> 1.59 s) and bench-like one-shot sessions — at small
    # scale the re-derived passes cost less than the two checkpoint
    # materializations.  r14 (VERDICT r13 item 9): the pin is now
    # GUARDED on the documents source size (_pin_if_large) — small
    # fixtures keep the measured-faster fused plan, corpora past the
    # threshold tokenize twice instead of six times.  Both branches
    # compute identical counts (a pin never changes results) and both
    # are oracle-gated (tests/test_guarded_pins.py).
    pin = _pin_if_large(sf_dir, "documents")
    staged = docs.select(words.alias("_w"))
    uni = pin(
        staged.select(F.explode("_w").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    k = F.size("_w") - 1
    big = pin(
        staged.select(
            F.explode(
                F.when(
                    k >= 1,
                    F.transform(
                        F.sequence(F.lit(1), k),
                        lambda i: F.struct(
                            F.element_at("_w", i).alias("wa"),
                            F.element_at("_w", i + 1).alias("wb"),
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("bg")
        )
        .select("bg.wa", "bg.wb")
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    nu = uni.agg(F.sum("c").cast("long").alias("nu"))
    nb = big.agg(F.sum("c_ab").cast("long").alias("nb_hits"))
    ua = uni.select(F.col("w").alias("wa"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("wb"), F.col("c").alias("c_b"))
    scored = (
        big.join(F.broadcast(ua), "wa")
        .join(F.broadcast(ub), "wb")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .withColumn(
            "_ratio",
            (F.col("c_ab").cast("double") * F.col("nu") * F.col("nu"))
            / (F.col("nb_hits").cast("double") * F.col("c_a") * F.col("c_b")),
        )
    )
    return (
        scored.orderBy(F.col("_ratio").desc(), "wa", "wb")
        .limit(_PMI_TOP)
        .select(
            "wa", "wb", "c_ab", "c_a", "c_b",
            F.round(F.log("_ratio"), 4).alias("pmi"),
        )
    )


_register(
    "text_pmi_collocations",
    _pmi_collocations,
    f"""
WITH toks AS (
  SELECT doc_id, string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS w
  FROM documents
),
uni AS (
  SELECT u.w AS w, count(*)::BIGINT AS c
  FROM toks, unnest(w) AS u(w) WHERE u.w != '' GROUP BY 1
),
big AS (
  SELECT w[i] AS wa, w[i + 1] AS wb, count(*)::BIGINT AS c_ab
  FROM toks, unnest(range(1, len(w))) AS t(i)
  WHERE w[i] != '' AND w[i + 1] != ''
  GROUP BY 1, 2
  HAVING count(*) >= {_PMI_MIN_COUNT}
),
nu AS (SELECT sum(c)::BIGINT AS nu FROM uni),
nb AS (SELECT sum(c_ab)::BIGINT AS nb_hits FROM big),
scored AS (
  SELECT big.wa, big.wb, big.c_ab, ua.c AS c_a, ub.c AS c_b,
         (big.c_ab::DOUBLE * nu.nu * nu.nu)
           / (nb.nb_hits::DOUBLE * ua.c * ub.c) AS _ratio
  FROM big JOIN uni ua ON ua.w = big.wa JOIN uni ub ON ub.w = big.wb, nu, nb
)
SELECT wa, wb, c_ab, c_a, c_b, round(ln(_ratio), 4) AS pmi
FROM scored
ORDER BY _ratio DESC, wa, wb
LIMIT {_PMI_TOP}
""",
)


# --------------------------------------------------------------------------
# 4. Last-touch attribution with a 7-day lookback.  The naive form is a
# purchase×touch range join; the shuffle-once form unions nothing — it
# annotates the ONE per-user event timeline with last(touch_ms
# ignorenulls) / last(touch_type ignorenulls) carry windows (both read
# the same deterministic (ts, event_id) order, so they pick the same
# carrying row), then filters purchases by the millisecond gap.  Gap
# math is BIGINT epoch-millis on both engines.
# --------------------------------------------------------------------------

_ATTR_WINDOW_MS = 7 * 24 * 3600 * 1000


def _attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value",
        F.unix_millis("ts").alias("ms"),
    )
    is_touch = F.col("event_type").isin("click", "view")
    staged = ev.select(
        "*",
        F.when(is_touch, F.col("ms")).alias("_touch_ms"),
        F.when(is_touch, F.col("event_type")).alias("_touch_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = staged.select(
        "*",
        F.last("_touch_ms", ignorenulls=True).over(w).alias("last_ms"),
        F.last("_touch_type", ignorenulls=True).over(w).alias("last_type"),
    ).filter(F.col("event_type") == "purchase")
    attributed = carried.select(
        F.when(
            F.col("last_ms").isNotNull()
            & (F.col("ms") - F.col("last_ms") <= _ATTR_WINDOW_MS),
            F.col("last_type"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch"),
        "value",
    )
    return attributed.groupBy("touch").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )


_register(
    "events_attribution_last_touch",
    _attribution_last_touch,
    f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_ms(ts)::BIGINT AS ms,
         CASE WHEN event_type IN ('click', 'view') THEN epoch_ms(ts)::BIGINT END AS _touch_ms,
         CASE WHEN event_type IN ('click', 'view') THEN event_type END AS _touch_type
  FROM events
),
carried AS (
  SELECT *,
         last_value(_touch_ms IGNORE NULLS) OVER w AS last_ms,
         last_value(_touch_type IGNORE NULLS) OVER w AS last_type
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
attributed AS (
  SELECT CASE WHEN last_ms IS NOT NULL AND ms - last_ms <= {_ATTR_WINDOW_MS}
              THEN last_type ELSE 'unattributed' END AS touch,
         value
  FROM carried WHERE event_type = 'purchase'
)
SELECT touch, count(*)::BIGINT AS n_purchases, round(sum(value), 2) AS revenue
FROM attributed GROUP BY touch
""",
)


# --------------------------------------------------------------------------
# 5. Event-sequence pattern mining (MATCH_RECOGNIZE-class, regex form):
# each user's timeline compresses to a string of event initials in
# deterministic (ts, event_id) order, and funnel shapes become regular
# expressions — 'cv*p' = click, any views, purchase.  One groupBy
# shuffle keyed on user_id; the per-user sequence is bounded by that
# user's event count, and the regex run is codegen map work.  The
# histogram (matches-per-user -> users) is the gated output.
# --------------------------------------------------------------------------

_SEQ_PATTERN = "cv*p"


def _sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ms", "event_id", "ini"))),
                lambda s: s["ini"],
            ),
        ).alias("seq")
    )
    matched = seqs.select(
        F.size(F.expr(f"regexp_extract_all(seq, '{_SEQ_PATTERN}', 0)")).alias("n_matches")
    )
    return matched.groupBy("n_matches").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


_register(
    "events_sequence_patterns",
    _sequence_patterns,
    f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_ms(ts)::BIGINT, event_id) AS seq
  FROM events GROUP BY user_id
),
matched AS (
  SELECT len(regexp_extract_all(seq, '{_SEQ_PATTERN}'))::INT AS n_matches FROM seqs
)
SELECT n_matches, count(*)::BIGINT AS n_users FROM matched GROUP BY n_matches
""",
)


# --------------------------------------------------------------------------
# 6. Chi-square independence profile for (lang x source): per-cell
# observed vs expected counts and the cell's chi-square contribution —
# the categorical-drift check a corpus-intake pipeline runs to catch a
# source whose language mix shifted.  Expected counts are one division
# of exact integer products, so every cell is bit-deterministic; no
# cross-cell float accumulation is gated (per-cell rows, not the
# statistic's sum — summation order is engine-dependent).
# --------------------------------------------------------------------------


def _chi2_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Plain branches by MEASUREMENT — same verdict as _cramers_v (r13):
    # the pinned single-pass marginal form ran slower at bench scale.
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("rt"))
    ct = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ct"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast("double")
    contrib = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "o",
            F.round(e, 4).alias("expected"),
            F.round(contrib, 4).alias("chi2_contrib"),
        )
    )


_register(
    "stats_chi2_lang_source",
    _chi2_profile,
    """
WITH obs AS (SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, count(*)::BIGINT AS rt FROM documents GROUP BY 1),
ct AS (SELECT source, count(*)::BIGINT AS ct FROM documents GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT obs.lang, obs.source, obs.o,
       round((rt * ct)::DOUBLE / n::DOUBLE, 4) AS expected,
       round((obs.o::DOUBLE - (rt * ct)::DOUBLE / n::DOUBLE)
             * (obs.o::DOUBLE - (rt * ct)::DOUBLE / n::DOUBLE)
             / ((rt * ct)::DOUBLE / n::DOUBLE), 4) AS chi2_contrib
FROM obs JOIN rt USING (lang) JOIN ct USING (source), n
""",
)


# --------------------------------------------------------------------------
# 7. Robust outlier counts by MAD (median absolute deviation): the
# median-based twin of the z-score — immune to the outliers it hunts.
# Two exact-percentile passes per event type (median, then median of
# absolute deviations), then a count of |x - med| > 3 * MAD.  Exact
# interpolated percentiles agree cross-engine (agg_exact_percentiles
# precedent); the comparison uses the ROUNDED med/mad so the outlier
# threshold is bit-pinned on both sides.
# --------------------------------------------------------------------------


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("_ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(_ad, 0.5)"), 6).alias("mad"),
        F.max("med").alias("med"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
            ).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


_register(
    "events_value_mad_outliers",
    _mad_outliers,
    """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS _ad
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(_ad, 0.5), 6) AS mad, max(med) AS med
  FROM dev GROUP BY 1
)
SELECT d.event_type, max(m.med) AS med, max(m.mad) AS mad,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN abs(d.value - m.med) > 3 * m.mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM (SELECT event_type, value FROM dev) d JOIN mad m USING (event_type)
GROUP BY 1
""",
)


# --------------------------------------------------------------------------
# 8. Exact median by histogram descent (operators/ranking.py::
# kth_smallest_histogram): distributed SELECTION — the data never
# shuffles; each of the <= 3 passes here is a map-side-partial bucket
# count and the driver sees only <= fanout rows per pass.  The scalable
# alternative to both the single-partition percentile() and
# global_rank's repartitionByRange when all you need is an order
# statistic.  Lower median of the order-price cents, with the row count
# for context.
# --------------------------------------------------------------------------


def _median_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import kth_smallest_histogram

    orders = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents")
    )
    n = orders.count()
    med = kth_smallest_histogram(orders, "cents", (n + 1) // 2)
    return spark.range(1).select(
        F.lit(med).cast("long").alias("median_cents"),
        F.lit(n).cast("long").alias("n_rows"),
    )


_register(
    "agg_median_histogram_select",
    _median_histogram,
    """
WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
n AS (SELECT count(*)::BIGINT AS n_rows FROM o)
SELECT (SELECT cents FROM o ORDER BY cents
        LIMIT 1 OFFSET ((SELECT n_rows FROM n) + 1) // 2 - 1) AS median_cents,
       (SELECT n_rows FROM n) AS n_rows
""",
)


# --------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences
# (round 11): P(next event type | current event type) — the behavioral
# fingerprint behind next-action prediction, bot detection (near-
# deterministic rows), and simulation.  The lag runs in a window
# PARTITIONED by user (cost = per-user history, parallel across the
# key space — the daily_streaks contract); the matrix itself is an
# (event-type x event-type) relation, bounded by the type domain at
# any corpus scale.  Row probabilities in exact ppm floor-divs.
# --------------------------------------------------------------------------


def _events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = pairs.groupBy("from_type").agg(F.sum("n").alias("_rt"))
    return (
        pairs.join(row_tot, "from_type")
        .selectExpr(
            "from_type",
            "to_type",
            "CAST(n AS BIGINT) AS n",
            "CAST((n * 1000000) div _rt AS BIGINT) AS p_ppm",
        )
        .orderBy("from_type", "to_type")
    )


_DD_MARKOV = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts)::BIGINT, event_id) AS prev
  FROM events
),
pairs AS (
  SELECT prev AS from_type, event_type AS to_type, count(*)::BIGINT AS n
  FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2
),
rt AS (SELECT from_type, sum(n)::BIGINT AS rt FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       (p.n * 1000000) // rt.rt AS p_ppm
FROM pairs p JOIN rt USING (from_type)
ORDER BY from_type, to_type
"""

_register("events_markov_transitions", _events_markov, _DD_MARKOV)


# --------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution (round 12): the
# industry-standard 40/20/40 credit model next to the last-touch entry
# above — first touch 40%, last touch 40%, the middle touches share
# 20%.  Credit is exact integer ppm: m=1 -> 1,000,000; m=2 -> 500,000
# each; m>=3 -> 400,000 / 200,000 div (m-2) per middle / 400,000 with
# the flooring REMAINDER of the middle share assigned to the last
# touch (deterministic rule, spelled on both engines), so every
# conversion's credits sum to exactly 10^6.  Credited revenue =
# credit_ppm x purchase cents, a BIGINT-safe micro-cents integer.
#
# Scale shape: the purchase x touch pairing is a BUCKETED range join —
# touches key on (user_id, ms div W); each purchase probes its own and
# the previous W-bucket (a 2-row explode), so the join is equi-keyed
# and shuffle-friendly with a bounded x2 probe factor; the exact
# 7-day/strictly-before predicate filters after the equi-join.  The
# rank/count windows are partitioned per conversion — bounded by one
# user's 7-day activity, never global.
# --------------------------------------------------------------------------


def _attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    W = _ATTR_WINDOW_MS
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
        F.unix_millis("ts").alias("ms"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ms").alias("t_ms"),
        F.col("event_type").alias("t_type"),
        F.expr(f"ms div {W}").alias("bucket"),
    )
    # Plain branches at SMALL scale by MEASUREMENT (r13):
    # unconditionally pinning purch and pairs (to stop the anti-join
    # re-running the event scan + range join) ran SLOWER in two
    # alternating warm A/Bs (med 1.44 -> 1.64 and 1.82 -> 1.87 s) —
    # the checkpoint materialization of the pair relation costs more
    # than the re-derived narrow scans at sf0.1.  r14 (VERDICT r13
    # item 9): guarded on the events source size — a big log pays the
    # pins and scans the events once per relation instead of twice.
    pin = _pin_if_large(sf_dir, "events")
    purch = pin(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ms").alias("p_ms"),
            "vc",
        )
    )
    probe = purch.withColumn(
        "bucket", F.explode(F.expr(f"array(p_ms div {W}, p_ms div {W} - 1)"))
    )
    pairs = pin(
        probe.join(touches, ["user_id", "bucket"]).filter(
            (
                (F.col("t_ms") < F.col("p_ms"))
                | ((F.col("t_ms") == F.col("p_ms")) & (F.col("t_id") < F.col("p_id")))
            )
            & (F.col("p_ms") - F.col("t_ms") <= W)
        )
    )
    w_p = Window.partitionBy("p_id")
    ranked = pairs.select(
        "p_id", "vc", "t_type",
        F.row_number().over(w_p.orderBy("t_ms", "t_id")).alias("rk"),
        F.count(F.lit(1)).over(w_p).alias("m"),
    )
    credits = ranked.selectExpr(
        "t_type AS touch",
        "vc",
        """CASE WHEN m = 1 THEN 1000000
                WHEN m = 2 THEN 500000
                WHEN rk = 1 THEN 400000
                WHEN rk = m THEN 400000 + (200000 - (200000 div (m - 2)) * (m - 2))
                ELSE 200000 div (m - 2) END AS credit""",
    )
    unatt = purch.join(
        pairs.select("p_id").distinct(), "p_id", "left_anti"
    ).selectExpr("'unattributed' AS touch", "vc", "CAST(1000000 AS INT) AS credit")
    allc = credits.unionByName(unatt)
    return (
        allc.groupBy("touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit").cast("long").alias("credit_ppm"),
            F.sum(F.col("credit").cast("decimal(38,0)") * F.col("vc"))
            .cast("long")
            .alias("credited_rev_microcents"),
        )
        .orderBy("touch")
    )


_register(
    "events_attribution_position",
    _attribution_position,
    f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
         epoch_ms(ts)::BIGINT AS ms
  FROM events
),
t AS (SELECT event_id AS t_id, user_id, ms AS t_ms, event_type AS t_type
      FROM ev WHERE event_type IN ('click', 'view')),
p AS (SELECT event_id AS p_id, user_id, ms AS p_ms, vc
      FROM ev WHERE event_type = 'purchase'),
pairs AS (
  SELECT p.p_id, p.vc, t.t_id, t.t_ms, t.t_type
  FROM p JOIN t USING (user_id)
  WHERE (t.t_ms < p.p_ms OR (t.t_ms = p.p_ms AND t.t_id < p.p_id))
    AND p.p_ms - t.t_ms <= {_ATTR_WINDOW_MS}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY t_ms, t_id) AS rk,
         count(*) OVER (PARTITION BY p_id) AS m
  FROM pairs
),
credits AS (
  SELECT t_type AS touch, vc,
         CASE WHEN m = 1 THEN 1000000
              WHEN m = 2 THEN 500000
              WHEN rk = 1 THEN 400000
              WHEN rk = m THEN 400000 + (200000 - (200000 // (m - 2)) * (m - 2))
              ELSE 200000 // (m - 2) END AS credit
  FROM ranked
),
unatt AS (
  SELECT 'unattributed' AS touch, vc, 1000000 AS credit
  FROM p WHERE p_id NOT IN (SELECT p_id FROM pairs)
),
allc AS (SELECT * FROM credits UNION ALL SELECT * FROM unatt)
SELECT touch, count(*)::BIGINT AS n_touches,
       sum(credit)::BIGINT AS credit_ppm,
       CAST(sum(credit::HUGEINT * vc) AS BIGINT) AS credited_rev_microcents
FROM allc GROUP BY touch ORDER BY touch
""",
)


# --------------------------------------------------------------------------
# Streaming Markov-transition replay (round 12) — streaming/
# sessionize_stream.py::streaming_transitions, the stateful twin of
# events_markov_transitions above.  Per-user last-(ts, event_id, type)
# survives micro-batch boundaries in the state store, so transitions
# STRADDLING a batch boundary are counted, not dropped — the exact
# failure mode a naive per-batch lag would have.  Source split into 4
# disjoint time ranges, mtime-pinned arrival order (the sessionize
# precedent), availableNow drain; the folded sink must equal the
# one-shot batch transition matrix row-for-row, ppm and all.
# --------------------------------------------------------------------------


def _stream_markov_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ._base import _drain
    from ..streaming.sessionize_stream import streaming_transitions

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_markov_{tag}_{os.getpid()}"
    )
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    span = (hi - lo) + 1
    epoch = None
    for i in range(4):
        a = lo + (span * i) // 4
        b = lo + (span * (i + 1)) // 4
        ev.filter(
            (F.unix_micros("ts") >= a) & (F.unix_micros("ts") < b)
        ).coalesce(1).write.parquet(f"{src}/f{i}")
        for root, _dirs, files in os.walk(f"{src}/f{i}"):
            for fn in files:
                p = os.path.join(root, fn)
                if epoch is None:
                    epoch = os.stat(p).st_mtime
                os.utime(p, (epoch + i, epoch + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_transitions(stream)

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(_append)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 180)

    trans = spark.read.parquet(sink)
    pairs = trans.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    row_tot = pairs.groupBy("from_type").agg(F.sum("n").alias("_rt"))
    return (
        pairs.join(row_tot, "from_type")
        .selectExpr(
            "from_type",
            "to_type",
            "CAST(n AS BIGINT) AS n",
            "CAST((n * 1000000) div _rt AS BIGINT) AS p_ppm",
        )
        .orderBy("from_type", "to_type")
    )


# gate: the drained streaming fold must equal the BATCH matrix — the
# oracle is events_markov_transitions' SQL verbatim
_register("stream_markov_replay", _stream_markov_replay, _DD_MARKOV)


# --------------------------------------------------------------------------
# Behavioral-entropy bot screen (round 12): the fraud/abuse companion
# to the Markov entries — a user whose event-type distribution has
# near-zero Shannon entropy behaves deterministically (clickers,
# scrapers, replay bots), while organic users mix types.  Report the
# 20 most deterministic users with enough history (n >= 20).
#
# Exactness: H = sum_t (c_t/n) ln(n/c_t) rewritten as
# (sum_t c_t * (ln_micro(n) - ln_micro(c_t))) div n — micro-nats from
# IDENTICAL integers on both engines (the repo's ln convention), one
# exact integer floor-div, no float sum.  Shape: two partial-agg
# groupBys ((user, type) then user) + TakeOrdered 20; no windows, no
# collect — per-user cost is the type domain (5), corpus cost is one
# scan.
# --------------------------------------------------------------------------

_ENT_MIN_EVENTS = 20
_ENT_TOP = 20


def _user_entropy_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_u = (
        per_ut.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(
                F.col("c")
                * (-F.expr("CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"))
            ).alias("_neg_clnc"),
        )
        .filter(F.col("n_events") >= _ENT_MIN_EVENTS)
        .selectExpr(
            "user_id",
            "CAST(n_events AS BIGINT) AS n_events",
            "CAST(n_types AS BIGINT) AS n_types",
            "CAST((n_events * CAST(floor(ln(CAST(n_events AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
            " + _neg_clnc) div n_events AS BIGINT) AS entropy_micro",
        )
    )
    return per_u.orderBy("entropy_micro", "user_id").limit(_ENT_TOP)


_register(
    "events_user_entropy_bots",
    _user_entropy_bots,
    f"""
WITH per_ut AS (
  SELECT user_id, event_type, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
per_u AS (
  SELECT user_id, sum(c)::BIGINT AS n_events, count(*)::BIGINT AS n_types,
         sum(c * -CAST(floor(ln(c::DOUBLE) * 1000000 + 0.5) AS BIGINT))::BIGINT
           AS neg_clnc
  FROM per_ut GROUP BY 1
)
SELECT user_id, n_events, n_types,
       (n_events * CAST(floor(ln(n_events::DOUBLE) * 1000000 + 0.5) AS BIGINT)
        + neg_clnc) // n_events AS entropy_micro
FROM per_u WHERE n_events >= {_ENT_MIN_EVENTS}
ORDER BY entropy_micro, user_id LIMIT {_ENT_TOP}
""",
)


# --------------------------------------------------------------------------
# Cramér's V effect size (round 12): the chi2 entry above deliberately
# gates per-cell contributions and refuses the cross-cell float sum
# (summation order is engine-dependent); this entry completes the
# independence report by QUANTIZING each cell's contribution to exact
# micro integers first (floor(contrib * 1e6 + 0.5) from identical
# doubles — the Adamic-Adar convention), integer-summing, and deriving
# V = sqrt(chi2 / (n * min(r-1, c-1))) as the family's one final
# rounded double from identical integers.  Unlike the profile entry
# the grid here is COMPLETE: zero-observed (lang x source) cells
# contribute their full expected count, which the observed-only
# groupBy misses — the domain-bounded cross join costs nothing.
# --------------------------------------------------------------------------


def _cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Plain branches, MEASURED (r13): deriving rt/ct/n/dims as marginals
    # of a pinned contingency relation (one corpus pass instead of 5)
    # ran SLOWER in the alternating warm A/B (med 0.54 -> 0.72 s) and in
    # bench-like one-shot sessions — the scans are narrow (lang, source
    # only) and cost less than the checkpoint materialization here.
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("rt"))
    ct = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ct"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        rt.crossJoin(ct)
        .join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "rt", "ct", "n", "coalesce(o, 0) AS o",
        )
        .selectExpr(
            "rt", "ct", "n",
            "CAST(floor((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
            " * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
            " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT) AS cell_micro",
        )
    )
    agg = grid.agg(
        F.sum("cell_micro").alias("chi2_micro"),
        F.max("n").alias("n"),
    )
    dims = (
        docs.agg(
            F.count_distinct("lang").alias("r"),
            F.count_distinct("source").alias("c"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(dims))
        .selectExpr(
            "CAST(n AS BIGINT) AS n_docs",
            "CAST(r AS BIGINT) AS n_langs",
            "CAST(c AS BIGINT) AS n_sources",
            "CAST((r - 1) * (c - 1) AS BIGINT) AS dof",
            "chi2_micro",
            # Degenerate-domain guard (ADVICE r12 #3): a single-lang or
            # single-source corpus has least(r-1, c-1) = 0; chi2 is then 0
            # by construction (observed == expected on every cell), so V is
            # DEFINED as 0.0 instead of a divide-by-zero NULL.  Same CASE
            # on the oracle.
            "CASE WHEN least(r - 1, c - 1) = 0 THEN CAST(0.0 AS DOUBLE)"
            " ELSE round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0"
            " / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)"
            " END AS cramers_v6",
        )
    )


_register(
    "stats_cramers_v_lang_source",
    _cramers_v,
    """
WITH obs AS (SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, count(*)::BIGINT AS rt FROM documents GROUP BY 1),
ct AS (SELECT source, count(*)::BIGINT AS ct FROM documents GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
grid AS (
  SELECT rt.rt, ct.ct, n.n, coalesce(obs.o, 0)::BIGINT AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
  CROSS JOIN n
),
cells AS (
  SELECT rt, ct, n,
         CAST(floor((o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
              * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
              / (rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
              * 1000000 + 0.5) AS BIGINT) AS cell_micro
  FROM grid
),
agg AS (SELECT sum(cell_micro)::BIGINT AS chi2_micro, max(n)::BIGINT AS n FROM cells),
dims AS (SELECT count(DISTINCT lang)::BIGINT AS r,
                count(DISTINCT source)::BIGINT AS c FROM documents)
SELECT n AS n_docs, r AS n_langs, c AS n_sources,
       (r - 1) * (c - 1) AS dof, chi2_micro,
       CASE WHEN least(r - 1, c - 1) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
                  / (n::DOUBLE * least(r - 1, c - 1)::DOUBLE)), 6)
       END AS cramers_v6
FROM agg, dims
""",
)
