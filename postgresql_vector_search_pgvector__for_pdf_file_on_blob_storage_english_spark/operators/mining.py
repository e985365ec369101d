"""Contrastive-pair mining for embedding/metric training: per anchor,
the nearest same-label vectors (positives) and the nearest
DIFFERENT-label vectors (hard negatives) — the standard triplet /
InfoNCE sampling stage of an embedding training pipeline, run inside
the engine so the pairs ship with the shards instead of being mined by
a separate service.

Shape (the batched-KNN pattern, ``knn.py::knn_join``): anchors
broadcast into one corpus pass, distance computed per (candidate,
anchor), the embedding dropped BEFORE the exchange so the shuffle
carries ``(ids, labels, distance)`` only, then two role-filtered
windows over the anchor key.  The mining must filter BEFORE ranking —
pruning a top-k pool first and filtering after would under-deliver
negatives whenever an anchor's neighborhood is label-pure (exactly the
anchors hard-negative mining cares about).

Determinism: ``(distance, id)`` ordering, double arithmetic — the same
cross-engine contract as the flagship KNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import DISTANCE_FNS


def triplet_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    n_pos: int = 1,
    n_neg: int = 3,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
    anchor_label_col: str = "anchor_label",
    anchor_vec_col: str = "anchor_vec",
) -> DataFrame:
    """Returns ``(anchor_id, role, rank, vec_id, label, distance)`` with
    ``role`` in {'positive', 'hard_negative'}: the ``n_pos`` nearest
    same-label rows (the anchor itself excluded) and the ``n_neg``
    nearest different-label rows, per anchor.

    ``anchors`` must carry (anchor_id, anchor_label, anchor_vec); build
    it from the corpus with a rename-select.  One corpus pass scores
    every anchor (anchors broadcast); the windows run over role-filtered
    slices keyed on ``anchor_id``."""
    if n_pos < 0 or n_neg < 0 or (n_pos == 0 and n_neg == 0):
        raise ValueError("need n_pos >= 0, n_neg >= 0, and at least one positive")
    dist_fn = DISTANCE_FNS[metric]
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .withColumn("distance", dist_fn(F.col(vec_col), F.col(anchor_vec_col)))
        .select(anchor_id_col, anchor_label_col, id_col, label_col, "distance")
    )
    w = Window.partitionBy(anchor_id_col).orderBy("distance", id_col)

    def _ranked(slice_df: DataFrame, role: str, n: int) -> DataFrame:
        return (
            slice_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(
                anchor_id_col,
                F.lit(role).alias("role"),
                "rank",
                id_col,
                label_col,
                F.round("distance", 4).alias("distance"),
            )
        )

    pos = _ranked(
        scored.filter(
            (F.col(label_col) == F.col(anchor_label_col))
            & (F.col(id_col) != F.col(anchor_id_col))
        ),
        "positive",
        n_pos,
    )
    neg = _ranked(
        scored.filter(F.col(label_col) != F.col(anchor_label_col)),
        "hard_negative",
        n_neg,
    )
    return pos.unionByName(neg)


def label_prototypes(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """Per-class mean embedding (class prototypes): ``(label, n_members,
    prototype array<double>)`` — the nearest-class-mean building block
    (prototypical-network inference, per-class centroid drift checks,
    embedding-quality triage).

    Fully distributed: ``posexplode`` to (label, dim, value), one
    partial-agg shuffle keyed (label, dim), prototypes reassembled with
    an ordered ``array_sort(collect_list(struct))`` — no driver
    participation, corpus never collected.  Prototype components are
    rounded to ``round_to`` so downstream consumers (and cross-engine
    replays) operate on identical bits."""
    ex = corpus.select(label_col, F.posexplode(F.col(vec_col)).alias("pos", "val"))
    per = ex.groupBy(label_col, "pos").agg(
        F.sum(F.col("val").cast("double")).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    )
    return per.groupBy(label_col).agg(
        F.max("_c").alias("n_members"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        (F.round(F.col("_s") / F.col("_c"), round_to) + F.lit(0.0)).alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("prototype"),
    )


def prototype_confusion(
    corpus: DataFrame,
    prototypes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-prototype classification confusion counts:
    ``(label, pred_label, n)`` — how often each class's vectors land
    nearest their own (or another) class mean.  The standard
    embedding-space sanity check before training on a labeled corpus.

    Prototypes broadcast; the argmin is the ``min_by`` map-side-partial
    shape (one shuffled row per vector, ``(distance, pred_label)``
    tiebreak), then a tiny confusion aggregate."""
    protos = prototypes.select(
        F.col(label_col).alias("_proto_label"), F.col("prototype").alias("_proto")
    )
    scored = corpus.crossJoin(F.broadcast(protos)).withColumn(
        "_d",
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("_proto"),
                lambda a, b: F.pow(a.cast("double") - b, F.lit(2.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    pred = (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(F.col(label_col), F.col("_proto_label")),
                F.struct(F.col("_d"), F.col("_proto_label")),
            ).alias("_best")
        )
        .select(F.col(f"_best.{label_col}").alias(label_col), F.col("_best._proto_label").alias("pred_label"))
    )
    return pred.groupBy(label_col, "pred_label").agg(F.count(F.lit(1)).alias("n"))


def prototypicality_prune(
    corpus: DataFrame,
    pct_prune: int = 40,
    keep: str = "hard",
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws" — public method; with SemDeDup upstream this is the
    D4 pipeline of Abbas et al. 2023): rank each example by squared L2
    distance to its class prototype and drop the ``pct_prune`` percent
    EASIEST (most prototypical, ``keep='hard'`` — the abundant-data
    regime) or HARDEST (``keep='easy'`` — the scarce-data regime).

    Returns the KEPT rows ``(id, label, proto_dist2)``.

    Scale shape: prototypes are a labels x dims aggregate (map-side
    partial) broadcast back; the rank is one window shuffle keyed on
    the label — salting is unnecessary because the per-label work is a
    single ordered pass, and the per-class cut floor(n * pct / 100)
    uses exact integer arithmetic.  Distances are computed from the
    ROUNDED prototypes (the label_prototypes contract), so ranking and
    replay are bit-deterministic cross-engine."""
    from pyspark.sql import Window

    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    if not 0 <= pct_prune <= 100:
        raise ValueError(f"pct_prune must be in [0, 100], got {pct_prune}")
    protos = label_prototypes(corpus, vec_col=vec_col, label_col=label_col)
    joined = corpus.join(F.broadcast(protos), label_col)
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("prototype"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    asc = d2.asc() if keep == "hard" else d2.desc()
    w = Window.partitionBy(label_col).orderBy(asc, F.col(id_col))
    ranked = joined.select(
        F.col(id_col),
        F.col(label_col),
        d2.alias("proto_dist2"),
        F.row_number().over(w).alias("_rn"),
        F.col("n_members"),
    )
    cut = F.expr(f"(n_members * {pct_prune}) div 100")
    return ranked.filter(F.col("_rn") > cut).select(
        id_col, label_col, F.round("proto_dist2", 4).alias("proto_dist2")
    )


def mine_bitext_margin(
    df: DataFrame,
    k: int = 2,
    margin_threshold: float = 1.05,
    block_col: str = "block",
    side_col: str = "side",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix
    / LASER recipe — public method): candidate translation pairs are
    the pairs whose cosine STANDS OUT from each side's neighborhood,
    scored with the ratio margin

        margin(x, y) = 2 * cos(x, y) / (avg_k(x -> tgt) + avg_k(y -> src))

    where ``avg_k`` is the mean cosine of the row's k nearest
    neighbors on the OTHER side.  Raw cosine ranks false friends (hubs
    near everything) above true pairs; the margin normalizes by each
    point's own neighborhood density — the reason every production
    bitext miner uses it.

    ``df`` carries ``(block, side 'src'|'tgt', id, vec)``.  Mining runs
    INSIDE blocks (one applyInPandas group per block, one GEMM per
    side-pair): at 100 TB the blocks come from a coarse quantizer (IVF
    assignment / LSH bucket — the persisted-index operators here), the
    standard sharded-mining layout; a block missing either side emits
    nothing.  Candidates = the union of x's top-k and y's top-k
    (value-ties at the k-th cosine are all admitted — deterministic,
    order-free); pairs with ``margin > margin_threshold`` are emitted
    as ``(block, src_id, tgt_id, cos, margin)`` with RAW double scores
    (gating entries round with F.round so both engines share one
    rounding rule).
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bt = df.schema[block_col].dataType.simpleString()
    it = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{block_col} {bt}, src_id {it}, tgt_id {it}, cos double, margin double"
    )

    def mine(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cols = [block_col, "src_id", "tgt_id", "cos", "margin"]
        src = pdf[pdf[side_col] == "src"]
        tgt = pdf[pdf[side_col] == "tgt"]
        if not len(src) or not len(tgt):
            return pd.DataFrame(columns=cols)
        A = np.array(src[vec_col].tolist(), dtype=np.float64)
        B = np.array(tgt[vec_col].tolist(), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        C = A @ B.T  # (S, T) cosines
        kf, kb = min(k, C.shape[1]), min(k, C.shape[0])
        top_f = np.sort(C, axis=1)[:, -kf:]          # per-src top-k cosines
        top_b = np.sort(C, axis=0)[-kb:, :]          # per-tgt top-k cosines
        avg_f = top_f.mean(axis=1)                   # (S,)
        avg_b = top_b.mean(axis=0)                   # (T,)
        margin = 2.0 * C / (avg_f[:, None] + avg_b[None, :])
        kth_f = top_f[:, 0][:, None]                 # k-th largest per row
        kth_b = top_b[0, :][None, :]                 # k-th largest per col
        cand = (C >= kth_f) | (C >= kth_b)
        keep = cand & (margin > margin_threshold)
        si, ti = np.nonzero(keep)
        sids = src[id_col].to_numpy()
        tids = tgt[id_col].to_numpy()
        return pd.DataFrame(
            {
                block_col: pdf[block_col].iloc[0],
                "src_id": sids[si],
                "tgt_id": tids[ti],
                "cos": C[si, ti],
                "margin": margin[si, ti],
            },
            columns=cols,
        )

    return df.groupBy(block_col).applyInPandas(mine, schema)
