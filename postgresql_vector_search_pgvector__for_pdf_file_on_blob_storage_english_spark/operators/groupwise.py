"""Group-wise Python operators via ``applyInPandas`` — the escape hatch
for per-group logic that built-in aggregates can't express (model
scoring per segment, per-group normalization, grouped resampling).

Costs to respect at 100 TB: ``applyInPandas`` shuffles the *full group*
to one task, so group cardinality must bound memory (here: per
event_type / per label — thousands of rows per group, not billions);
prefer window functions when the computation is expressible natively
(the z-score below intentionally exists in both forms as a
correctness cross-check — the native form is the production path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def groupwise_zscore_pandas(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """(group, id, value) -> + zscore, computed per group in pandas
    (population std; groups must fit one task)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_col, T.StringType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        mean = v.sum() / len(v)
        std = float(((v - mean) ** 2).sum() / len(v)) ** 0.5
        out = pdf[[id_col, group_col, value_col]].copy()
        out["zscore"] = (v - mean) / std if std > 0 else 0.0
        return out

    return df.groupBy(group_col).applyInPandas(score, schema)


def groupwise_zscore_native(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """The same z-score as window expressions (no Python, no group-size
    limit) — the production form."""
    w = Window.partitionBy(group_col)
    mean = F.avg(value_col).over(w)
    std = F.sqrt(F.avg(F.col(value_col) * F.col(value_col)).over(w) - mean * mean)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    return df.select(id_col, group_col, value_col, z.alias("zscore"))


def hash_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = "sample"
) -> DataFrame:
    """Deterministic ``rate_pct``% sample: keep rows where a stable
    md5-derived bucket of (salt, id) falls below the rate.

    Unlike ``df.sample`` this is reproducible across runs, engines and
    partitionings — the property a training pipeline needs so every
    worker, retry and audit selects the identical subset.
    """
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long") % 100
    return df.filter(bucket < rate_pct)


def train_test_split_hash(
    df: DataFrame, id_col: str, test_pct: int = 10, salt: str = "split"
) -> DataFrame:
    """Adds a deterministic ``split`` column ('test' for ``test_pct``%
    of rows, else 'train') keyed on a stable hash — membership never
    changes when data is re-partitioned, appended to, or re-read."""
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long") % 100
    return df.withColumn("split", F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic per-source subsampling to a target mixture — the
    training-data "data mixture" stage (e.g. keep 100% of wiki, 30% of
    web, 5% of logs).

    Same stable-hash bucket contract as :func:`hash_sample` but in
    basis points (``% 10000``) for sub-percent rates, with the
    threshold selected per row by ``source_col``.  Pure codegen filter:
    zero shuffle, membership independent of partitioning/append order,
    and every worker/retry/audit selects the identical subset.  Rates
    are fractions in [0, 1]; sources absent from ``rates`` get
    ``default_rate``.
    """
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long") % 10000
    threshold = F.lit(int(round(default_rate * 10000)))
    for src, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(source_col) == src, F.lit(int(round(rate * 10000)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-source document quota: keep at most ``cap`` rows per source,
    chosen deterministically — the "domain cap" stage of web-corpus
    pipelines (CommonCrawl dedup recipes cap pages per domain so one
    mega-site can't dominate the mixture).

    Selection ranks rows WITHIN each source by the engine's stable md5
    hash of (salt, id) with an id tiebreak, so the surviving set is a
    uniform per-source sample that is reproducible across runs, engines
    and partitionings, and *monotone in cap*: raising the cap only adds
    rows, never swaps earlier survivors — an audit/incremental-build
    property ``df.limit``-per-group would not have.

    Cost: ONE shuffle keyed on ``source_col`` (the window partition).
    For a pathologically skewed source (one domain = a whole executor's
    input) the standard mitigation is a hash-threshold pre-filter at
    ~(cap / est_count) to shrink the window's input before the exact
    rank — same two-stage shape as the salted aggregations in skew.py.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_cap_rank", F.row_number().over(w))
        .filter(F.col("_cap_rank") <= cap)
        .drop("_cap_rank")
    )


def rebalance_classes(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    salt: str = "rebalance",
) -> DataFrame:
    """Balanced downsampling to the smallest class — the class-rebalance
    stage of a training pipeline (e.g. equalize languages or quality
    tiers before training so the majority class can't dominate).

    Unlike :func:`mixture_sample` (fixed caller-supplied rates), the
    per-class keep rate is DATA-DEPENDENT: ``rate_c = min_count /
    count_c`` in basis points, computed by one tiny per-class aggregate
    and broadcast back; membership then uses the same stable-hash
    bucket contract as every sampler here (deterministic, independent
    of partitioning, nests as counts change only via the rate).  The
    corpus-side work is a broadcast join + codegen filter — no shuffle
    of the data rows.  Integer math throughout (floor of an exact
    small-magnitude division), so Spark and a SQL replay agree exactly.

    Expected survivors per class ~ min_count (rate-based, not exact-N;
    pair with ``source_cap`` when a hard ceiling is needed)."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("_cnt"))
    min_cnt = counts.agg(F.min("_cnt").alias("_min_cnt"))
    rates = counts.crossJoin(F.broadcast(min_cnt)).select(
        label_col,
        F.floor(F.col("_min_cnt") * 10000 / F.col("_cnt")).alias("_thr"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long") % 10000
    return (
        df.join(F.broadcast(rates), label_col)
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )


def stratified_split_exact(
    df: DataFrame,
    train_frac: float = 0.8,
    label_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
    split_col: str = "split",
) -> DataFrame:
    """EXACT stratified train/test split: exactly ``floor(n_c *
    train_frac)`` training rows per class, selected by stable-hash rank
    — where :func:`train_test_split_hash` gives per-class counts only in
    expectation.  Use this when per-class budgets must be exact (small
    eval classes, contractual splits).

    One shuffle keyed on the class (the rank window) plus a broadcast
    of per-class counts; membership is deterministic and independent of
    partitioning, and lowering ``train_frac`` yields a subset of the
    higher fraction's training set (rank-prefix monotonicity)."""
    if not (0.0 <= train_frac <= 1.0):
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")
    counts = df.groupBy(label_col).agg(F.count("*").alias("_cnt"))
    w = Window.partitionBy(label_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(counts), label_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            split_col,
            F.when(
                F.col("_rk") <= F.floor(F.col("_cnt") * F.lit(train_frac)), "train"
            ).otherwise("test"),
        )
        .drop("_rk", "_cnt")
    )


def weighted_sample_topn(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
    key_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via
    Efraimidis-Spirakis A-ES keys: rank every row by
    ``u ** (1 / w)`` (equivalently ``-ln(u) / w`` ascending) where
    ``u`` is the same stable md5-derived uniform the other samplers
    use, and keep the global top ``n``.

    Inclusion probability is proportional to weight, yet — unlike
    ``df.sample`` — the selected set is identical across runs,
    engines, partitionings and appends, so every worker/retry/audit
    draws the same sample (the property a mixture-weighting stage
    needs when "sample 10k docs by quality score" must be replayable).

    Scale shape: the key is a per-row codegen expression; the global
    cut is top-n by (key, id) — ``TakeOrderedAndProject``, no full
    sort, no shuffle beyond the k-row partial winners.  Rows with
    non-positive weight are excluded (zero mass).

    The ordering cut compares the key QUANTIZED to integer 1e-8 units
    (``floor(key * 1e8 + 0.5)`` as a long, id tiebreak) rather than the
    raw double: ``ln()`` is libm-dependent (JVM ``Math.log`` vs C
    ``log`` can differ in the last ulp), so cutting on the raw key
    could select different rows on different engines at near-ties —
    the repo-wide quantize-before-ranking oracle rule (ADVICE r6).
    ``key_col`` is emitted as the quantized key rescaled (kq / 1e8),
    so output and selection compare identical bits everywhere.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # u in (0, 1]: (h + 1) / 2^32 over the first 8 md5 hex chars
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    w = F.col(weight_col).cast("double")
    key_q = F.floor((-F.log(u) / w) * F.lit(1e8) + F.lit(0.5)).cast("long")
    return (
        df.filter(w > 0)
        .withColumn("_es_q", key_q)
        .orderBy("_es_q", id_col)
        .limit(n)
        .withColumn(key_col, F.col("_es_q") / F.lit(1e8))
        .drop("_es_q")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-flattened sampling rates (the UniMax/multilingual
    mixture staple): keep-rate ``r_g = (c_min / c_g)^(1 - 1/T)``, which
    makes the SAMPLED distribution's shares proportional to ``c^(1/T)``
    while keeping the smallest group whole (its rate is exactly 1) —
    T=1 keeps everything, T->inf converges to uniform shares.

    Returns ``(group, n_docs, rate_bp)`` with the rate quantized to
    basis points BEFORE any filtering (the engine's oracle rule).  The
    computation stays in-plan: one partial-agg groupBy + a broadcast
    1-row minimum — no collect.  At the gated T=2 the exponent is 1/2
    and the whole expression is IEEE-correctly-rounded sqrt/division —
    bit-identical across engines; other temperatures go through pow(),
    which is not correctly rounded, so gate those rows-only."""
    if temperature < 1.0:
        raise ValueError(f"temperature must be >= 1, got {temperature}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    cmin = counts.agg(F.min("n_docs").alias("_cmin"))
    ratio = F.col("_cmin").cast("double") / F.col("n_docs").cast("double")
    if temperature == 2.0:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - 1.0 / temperature))
    return counts.crossJoin(F.broadcast(cmin)).select(
        group_col,
        "n_docs",
        F.floor(rate * 10000).cast("long").alias("rate_bp"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 2.0,
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Apply :func:`temperature_rates` with the engine's stable-hash
    basis-point bucket (the :func:`mixture_sample` contract): selection
    is deterministic, partition-independent, and nested across
    temperatures the way hash-threshold subsets nest.  The rate table
    re-enters via a broadcast join keyed on the group — no data-row
    shuffle."""
    rates = temperature_rates(df, group_col, temperature)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long") % 10000
    return (
        df.join(F.broadcast(rates.select(group_col, "rate_bp")), group_col)
        .filter(bucket < F.col("rate_bp"))
        .drop("rate_bp")
    )


def waterfill_budget(
    avail: DataFrame,
    budget_num: int = 4,
    budget_den: int = 10,
    group_col: str = "source",
    avail_col: str = "avail",
) -> DataFrame:
    """Water-filling token-budget allocation across groups — the
    mixture-construction step AFTER rates are chosen: given each
    source's available token count and a total budget
    ``T = (budget_num * sum(avail)) div budget_den``, allocate
    ``min(avail_g, level)`` per group with the unique level that spends
    the budget exactly, +1 token to the first ``T mod``-many
    unsaturated groups (rank order) so ``sum(alloc) == T`` to the
    token.  Small sources are kept WHOLE (saturated), large sources are
    clipped to the common level — max-min fairness, the standard cure
    for "the biggest crawl eats the whole budget".

    Exact integer derivation, no floats anywhere: groups sort by
    (avail, group) through :func:`~..operators.ranking.global_rank`
    (rank + exclusive prefix sum, never a single-partition window); the
    pivot rank r is the unique row where
    ``level = (T - prefix_r) div (n - r + 1)`` falls in
    ``[avail_{r-1}, avail_r)`` — every rank below r is saturated.  Both
    Spark ``div``/``%`` and DuckDB ``//``/``%`` truncate toward zero,
    and all pivot-side operands are non-negative, so the engines agree
    bit-for-bit.  The degenerate ``T >= total`` case allocates
    everything (pivot row is NULL).

    Scale shape: one partial-agg groupBy to the per-group relation
    (|groups| rows — bounded by the source domain), one global_rank
    over it, a rank-shift self-join for the predecessor, and broadcast
    one-row joins for totals/pivot.  Data rows are touched exactly
    once, in the caller's aggregation.
    """
    from .ranking import global_rank

    if budget_num <= 0 or budget_den <= 0 or budget_num >= budget_den:
        raise ValueError(
            f"budget fraction must be in (0, 1): {budget_num}/{budget_den}"
        )
    # Three |groups|-row relations each feed 2 consumers (avail ->
    # rank+totals, ranked -> predecessor+cand, cand -> pivot+final);
    # as plain branches the fan-out multiplied — the caller's corpus
    # aggregation re-ran up to 8x (44 Exchange nodes in the gated
    # plan; r13 opt).  Pin each once: the chain above the data rows
    # runs exactly once.
    avail = avail.localCheckpoint(eager=False)
    ranked = global_rank(
        avail,
        [F.col(avail_col).asc(), F.col(group_col).asc()],
        prefix_col=avail_col,
    ).localCheckpoint(eager=False)
    tot = avail.agg(
        F.sum(avail_col).alias("_total"),
        F.expr(f"({budget_num} * sum({avail_col})) div {budget_den}").alias(
            "_budget"
        ),
    )
    prev = ranked.select(
        (F.col("_rank") + 1).alias("_nrank"),
        F.col(avail_col).alias("_pavail"),
    )
    cand = (
        ranked.crossJoin(F.broadcast(tot))
        .join(F.broadcast(prev), F.col("_rank") == F.col("_nrank"), "left")
        .withColumn("_pavail", F.coalesce("_pavail", F.lit(0)))
        .withColumn(
            "_level", F.expr("(_budget - _before) div (_n - _rank + 1)")
        )
        .withColumn(
            "_rem", F.expr("(_budget - _before) % (_n - _rank + 1)")
        )
        .localCheckpoint(eager=False)
    )
    pivot = cand.where(
        f"_budget < _total AND _level >= _pavail AND _level < {avail_col}"
    ).agg(
        F.max("_rank").alias("_pivot_rank"),
        F.max("_level").alias("_plevel"),
        F.max("_rem").alias("_prem"),
    )
    return (
        cand.crossJoin(F.broadcast(pivot))
        .selectExpr(
            group_col,
            f"CAST({avail_col} AS BIGINT) AS avail_tokens",
            f"""CAST(CASE
                WHEN _pivot_rank IS NULL THEN {avail_col}
                WHEN _rank < _pivot_rank THEN {avail_col}
                ELSE _plevel
                     + CASE WHEN _rank - _pivot_rank + 1 <= _prem
                            THEN 1 ELSE 0 END
            END AS BIGINT) AS alloc_tokens""",
            "CAST(CASE WHEN _pivot_rank IS NULL OR _rank < _pivot_rank"
            " THEN 1 ELSE 0 END AS BIGINT) AS saturated",
        )
    )
