"""Edit-distance self-join via deletion neighborhoods (FastSS,
Bocek et al. 2007 — public algorithm): the record-linkage /
fuzzy-matching operator a data-cleaning pipeline runs over names,
titles and codes.

Soundness (d = 1): if ``levenshtein(a, b) <= 1`` then a and b share at
least one *deletion signature* — the string itself or the string with
one character deleted.  (Substitution at i: both sides' deletion at i
coincide; insertion/deletion: the longer side's deletion at the edit
position equals the shorter side itself.)  So an equality join on the
signature set is a COMPLETE candidate generator, and the exact
``levenshtein`` verification only ever runs on candidates.

Scale shape: signature generation is a per-row codegen explode
(``length + 1`` signatures per row — short keys by assumption);
signatures are md5-hashed BEFORE the exchange, so the candidate
self-join shuffles ``(id, 16-byte hash)`` and never the strings (the
engine-wide dedup discipline); verification re-attaches the two
strings by keyed id joins and evaluates one ``levenshtein`` per
candidate pair.  All-pairs never happens — the blowup is bounded by
signature collisions, exactly like the MinHash band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_signature_rows(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """``(id, sig_hash)`` rows: md5 of the string itself and of each
    single-character deletion.  ``array_distinct`` collapses repeated
    deletions (e.g. runs of the same character) so a pair is counted
    once per distinct shared signature."""
    c = f"`{key_col}`"
    sigs = F.expr(
        f"""array_distinct(concat(
              array({c}),
              transform(sequence(1, length({c})),
                        i -> concat(substring({c}, 1, i - 1),
                                    substring({c}, i + 1, length({c}))))))"""
    )
    return df.select(
        F.col(id_col).alias("_fid"), F.explode(sigs).alias("_sig")
    ).select("_fid", F.md5(F.col("_sig")).alias("_h"))


def fuzzy_self_join_d1(
    df: DataFrame,
    key_col: str,
    id_col: str,
    dist_col: str = "dist",
) -> DataFrame:
    """All pairs with edit distance <= 1, exactly: FastSS candidate
    generation + levenshtein verification.  Returns
    ``(id_a, id_b, <key>_a, <key>_b, dist)`` with ``id_a < id_b``."""
    sigs = deletion_signature_rows(df, key_col, id_col)
    a = sigs.select(F.col("_fid").alias("_ida"), "_h")
    b = sigs.select(F.col("_fid").alias("_idb"), "_h")
    cand = (
        a.join(b, "_h")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    left = df.select(
        F.col(id_col).alias("_ida"), F.col(key_col).alias(f"{key_col}_a")
    )
    right = df.select(
        F.col(id_col).alias("_idb"), F.col(key_col).alias(f"{key_col}_b")
    )
    return (
        cand.join(left, "_ida")
        .join(right, "_idb")
        .withColumn(
            dist_col,
            F.levenshtein(F.col(f"{key_col}_a"), F.col(f"{key_col}_b")).cast("int"),
        )
        .filter(F.col(dist_col) <= 1)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            f"{key_col}_a",
            f"{key_col}_b",
            dist_col,
        )
    )
