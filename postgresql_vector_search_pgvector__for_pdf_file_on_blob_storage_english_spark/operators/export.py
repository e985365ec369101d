"""Training-data export: deterministic global shuffle into shards, and
deterministic token-budget selection.

The last mile of a corpus pipeline hands tokenizer/trainer jobs a set of
shard files whose contents and ORDER are reproducible — retraining from
the same corpus snapshot must read byte-identical shards, and adding
data must not reshuffle what earlier runs already wrote.  Random
`repartition` gives neither property; the engine's stable md5 hash
(groupwise.hash_sample convention) gives both:

* shard membership = hash % n_shards — independent of input
  partitioning, append order, and Spark version (NOT `hash()`/
  `repartition`, which are seed- and partition-count-bound);
* intra-shard order = (hash, id) — a deterministic "global shuffle" (the
  hash decorrelates neighboring source docs) that every engine replays
  identically.

The reference has no export stage (its corpus lives in a vector table;
SSEOpenAIController.java serves queries, never training jobs); this is
part of the training-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stable_hash(id_col: str, salt: str):
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("§", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    shard_col: str = "shard",
    sort_col: str = "sort_key",
) -> DataFrame:
    """Adds (shard, sort_key): shard = stable-hash % n_shards, sort_key =
    the hash itself.  Pure codegen projection — zero shuffle; the
    shuffle happens once, in the writer, keyed on the shard."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _stable_hash(id_col, salt)
    return df.withColumn(sort_col, h).withColumn(
        shard_col, (F.col(sort_col) % n_shards).cast("int")
    )


def shard_export_write(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> None:
    """Write the training shards: parquet hive-partitioned by ``shard``,
    rows within each shard in (hash, id) order.

    ONE shuffle (repartition on the shard key) + a partition-local sort
    — the minimal cost of a deterministic global shuffle.  Each shard
    directory is an independent unit of trainer input: a 1000-file
    DataLoader maps shards to workers with no cross-file coordination.
    sortWithinPartitions (not orderBy) keeps the sort local: no range
    exchange, no global sort barrier.
    """
    assigned = shard_assign(df, n_shards, id_col=id_col, salt=salt)
    (
        assigned.repartition(n_shards, F.col("shard"))
        # Leading the sort with the partition column matters: the parquet
        # writer demands its input clustered by partition cols and will
        # insert its own NON-STABLE sort on `shard` alone if the incoming
        # order doesn't already provide it — scrambling the (sort_key, id)
        # order this sort establishes.  Satisfying the requirement here
        # keeps one partition-local sort and the order it promises.
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Deterministically fill a token budget: walk documents in stable
    (hash, id) order, keep each doc whose inclusion STARTS below the
    budget (so output tokens land in [budget, budget + max_doc) — the
    "take until full" convention; the final doc may overshoot).

    This is the "cut a 1B-token training set from a 15T-token corpus"
    stage.  Hash order makes the cut a uniform corpus sample, and the
    selection is monotone in ``budget``: raising it only appends docs.
    Cost: the exact prefix sum runs on the two-pass
    :func:`~.ranking.global_rank` (range repartition on the hash order
    + partitioned running sum — never a single-partition window); the
    cheaper scale variant estimates tokens/doc from a sample and cuts
    by hash threshold (zero shuffle, approximate budget) like
    mixture_sample.
    """
    from .ranking import global_rank

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    h = _stable_hash(id_col, salt)
    staged = df.withColumn("_bh", h)
    ranked = global_rank(
        staged,
        [F.col("_bh").asc(), F.col(id_col).asc()],
        prefix_col=tokens_col,
    )
    return (
        ranked.filter(F.col("_before") < budget)
        .drop("_bh", "_before", "_rank", "_n")
    )


def shard_export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> None:
    """The JSONL twin of :func:`shard_export_write` — trainer tooling
    that consumes text shards (one JSON object per line) instead of
    parquet.  Identical shard membership, identical intra-shard
    (hash, id) order, identical single shuffle + partition-local sort;
    only the sink format differs (hive-partitioned ``shard=N``
    directories of .json line files).  Numeric fidelity note: JSON
    round-trips longs/strings/booleans exactly; floating-point columns
    re-parse to the same doubles (shortest-round-trip encoding), but
    binary columns don't belong in a JSONL export — drop or base64 them
    first."""
    assigned = shard_assign(df, n_shards, id_col=id_col, salt=salt)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )


def hrw_shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "hrw",
    shard_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment:
    ``shard(id) = argmax_s md5(salt § s § id)`` (Thaler & Ravishankar
    1998 — the consistent-hashing scheme with NO ring state).

    Why it exists next to :func:`shard_assign`: modulo sharding
    reshuffles (n-1)/n of every row's placement when ``n_shards``
    changes, so growing a 100 TB training-shard layout from 512 to 513
    shards rewrites essentially all of it.  Under HRW a row moves ONLY
    if the new shard wins its argmax — an expected 1/(n+1) of rows —
    so elastic re-sharding rewrites ~1/(n+1) of the bytes.  The
    assignment is a pure codegen projection over a literal shard array
    (n_shards md5 terms per row, no shuffle, no state); the argmax
    tie-break is (weight, shard_id) and every term is the same
    portable md5 the rest of the engine hashes with, so the oracle
    replays it cell-for-cell.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    id_str = F.col(id_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws("§", F.lit(salt), F.lit(str(s)), id_str)
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long").alias("w"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).cast("long").alias("w"), F.lit(-1).alias("s")),
        lambda acc, x: F.when(
            (x["w"] > acc["w"]) | ((x["w"] == acc["w"]) & (x["s"] < acc["s"])), x
        ).otherwise(acc),
    )
    return df.withColumn(shard_col, best["s"])


def hrw_resize_churn(
    df: DataFrame,
    n_before: int,
    n_after: int,
    id_col: str = "doc_id",
    salt: str = "hrw",
) -> DataFrame:
    """The elastic-resharding report: per-(before, after) shard-pair
    row counts plus the moved flag — ``sum(moved)/count`` is the churn
    fraction, expected ``1 - min(n)/max(n)`` for nested HRW resizes
    (exactly the rows whose argmax lands in the added/removed shards).
    Modulo sharding's churn on the same resize is reported alongside
    for contrast."""
    both = hrw_shard_assign(
        hrw_shard_assign(df, n_before, id_col, salt, shard_col="shard_before"),
        n_after, id_col, salt, shard_col="shard_after",
    )
    h = _stable_hash(id_col, "shard")
    return both.select(
        "shard_before",
        "shard_after",
        (F.col("shard_before") != F.col("shard_after")).alias("moved_hrw"),
        ((h % n_before) != (h % n_after)).alias("moved_mod"),
    ).groupBy("shard_before", "shard_after").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("moved_hrw").cast("long")).alias("n_moved_hrw"),
        F.sum(F.col("moved_mod").cast("long")).alias("n_moved_mod"),
    )
