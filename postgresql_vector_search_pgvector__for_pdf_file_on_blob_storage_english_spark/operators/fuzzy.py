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


def fuzzy_value_pairs_d1(
    df: DataFrame,
    key_col: str,
    id_col: str,
    dist_col: str = "dist",
) -> DataFrame:
    """The scale form of the d<=1 join: run FastSS over the DISTINCT
    key values (the same working-set discipline as the tokenizer
    trainers), carrying each value's multiplicity and min id.  Returns
    value-level pairs ``(<key>_a, <key>_b, n_a, n_b, min_id_a,
    min_id_b, dist)`` ordered by ``min_id_a < min_id_b`` (the underlying
    self-join orders by min id, NOT lexically — the lexically smaller
    value may sit on the ``_b`` side when its min id is larger).  The
    two values of a pair are always distinct, so dist is exactly 1 —
    equal values are a GROUP, not n^2/2 pairs.

    Why this is the deployed shape: signature-blocked self-joins cost
    the sum of squared block sizes, and duplicated values multiply
    every block — :func:`fuzzy_self_join_d1` over a corpus where each
    name repeats k times does k^2 times the work for no new
    information.  Here duplicates collapse into multiplicities first
    (one partial-agg groupBy), the quadratic stage runs on distinct
    values only, and the id-level pair count is recovered
    ARITHMETICALLY: a value pair contributes ``n_a * n_b`` id pairs, a
    duplicated value contributes ``n * (n-1) / 2``."""
    # The value collapse feeds the signature join AND both re-attachment
    # sides; as a plain DataFrame each branch re-derives the corpus
    # groupBy (13 string-keyed exchanges measured at sf0.1 — the same
    # branch-copy pathology the Ed-Join plan gate caught).  The
    # checkpoint pins it to one computation.
    vals = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_ids"), F.min(id_col).alias("min_id")
    ).localCheckpoint(eager=False)
    pairs = fuzzy_self_join_d1(vals, key_col, "min_id", dist_col=dist_col)
    left = vals.select(
        F.col("min_id").alias("id_a"),
        F.col("n_ids").alias("n_a"),
    )
    right = vals.select(
        F.col("min_id").alias("id_b"),
        F.col("n_ids").alias("n_b"),
    )
    return (
        pairs.join(left, "id_a")
        .join(right, "id_b")
        .select(
            f"{key_col}_a",
            f"{key_col}_b",
            "n_a",
            "n_b",
            F.col("id_a").alias("min_id_a"),
            F.col("id_b").alias("min_id_b"),
            dist_col,
        )
    )


def fuzzy_pair_count_d1(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """One row ``(n_id_pairs)``: the total number of id-level pairs at
    edit distance <= 1, computed from the distinct-value join plus the
    duplicate-group arithmetic — never materializing the quadratic
    pair set."""
    _vp, total = fuzzy_value_report_d1(df, key_col, id_col)
    return total


def fuzzy_value_report_d1(
    df: DataFrame,
    key_col: str,
    id_col: str,
    dist_col: str = "dist",
) -> tuple[DataFrame, DataFrame]:
    """Value-level pairs AND the corpus-total id-pair count off ONE
    FastSS pass: ``(pairs_df, total_df)`` where ``pairs_df`` is exactly
    :func:`fuzzy_value_pairs_d1`'s relation and ``total_df`` is the
    1-row ``(n_id_pairs)`` relation of :func:`fuzzy_pair_count_d1`.

    Callers that need both (the gated linkage report does) previously
    paid the signature join + levenshtein verification TWICE — the
    count path re-derived the whole value-pair relation from scratch.
    Here the verified pair relation is localCheckpointed once and the
    total is two bounded aggregates over it: a 2x on the dominant
    (quadratic candidate) stage, with bit-identical output."""
    vp = fuzzy_value_pairs_d1(df, key_col, id_col, dist_col=dist_col)
    # the pair relation is bounded by signature collisions (the same
    # bound the join itself relies on); both the report and the total
    # read it, so pin one computation
    vp = vp.localCheckpoint(eager=False)
    # exact integer arithmetic (n*(n-1) is even; a double division
    # would round past 2^53 at corpus scale)
    dup_pairs = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .agg(
            F.coalesce(
                F.sum(F.expr("(n_ids * (n_ids - 1)) div 2")), F.lit(0)
            ).alias("_dups")
        )
    )
    cross = vp.agg(
        F.coalesce(F.sum(F.col("n_a") * F.col("n_b")), F.lit(0)).alias("_cross")
    )
    total = dup_pairs.crossJoin(cross).select(
        (F.col("_dups") + F.col("_cross")).alias("n_id_pairs")
    )
    return vp, total


# ==========================================================================
# Ed-Join (Xiao, Wang, Lin 2008, VLDB — public algorithm): edit-distance
# self-join for thresholds k >= 1 via positional q-gram PREFIX filtering,
# complementing FastSS (which is d = 1 only and fans out length+1
# signatures per row).  Candidate generation here is CONTENT-adaptive:
# each string contributes only its q*k + 1 globally-rarest grams, so
# blocks form on the distinguishing substrings, not the shared
# boilerplate prefix every name carries.
#
# Completeness: if ed(a, b) <= k, then a and b share at least one
# positional q-gram whose occurrences sit within k positions of each
# other AND which lies in the (q*k + 1)-prefix of both strings' gram
# lists under any fixed global order (mismatching more than q*k grams
# forces ed > k — the count-filter bound of Gravano et al. 2001 applied
# to the prefix).  Strings too short to carry q*k + 1 grams contribute
# every gram; strings with fewer than q characters carry no grams at
# all and are routed through a short-string block whose size is bounded
# by the alphabet (|distinct strings| < |sigma|^(q + k)) — quadratic on
# a CONSTANT, not on the corpus.
# ==========================================================================


def qgram_prefix_rows(
    vals: DataFrame, key_col: str, id_col: str, q: int = 2, k: int = 2
) -> DataFrame:
    """``(id, gram_hash, pos, len)`` rows for the q*k + 1 rarest
    positional q-grams of each string, under the global
    (document-frequency, gram, position) order.  Two linear passes: a
    gram-frequency aggregate (map-side partial), then a per-string
    window rank bounded at q*k + 1 (one shuffle keyed on the string id,
    partitions bounded by string length)."""
    from pyspark.sql import Window

    c = f"`{key_col}`"
    grams = F.expr(
        f"""transform(sequence(1, greatest(length({c}) - {q - 1}, 0)),
                      i -> struct(substring({c}, i, {q}) AS g, i AS pos))"""
    )
    rows = vals.select(
        F.col(id_col).alias("_eid"),
        F.length(key_col).alias("_len"),
        F.explode(grams).alias("_gp"),
    ).select("_eid", "_len", F.col("_gp.g").alias("_g"), F.col("_gp.pos").alias("_pos"))
    dfreq = rows.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_eid").orderBy("_df", "_g", "_pos")
    return (
        rows.join(dfreq, "_g")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= q * k + 1)
        .select("_eid", F.md5("_g").alias("_h"), "_pos", "_len")
    )


def edjoin_candidates(
    vals: DataFrame, key_col: str, q: int = 2, k: int = 2
) -> DataFrame:
    """The Ed-Join candidate set over a DISTINCT-value relation
    carrying ``min_id``: prefix-gram join plus the short-string block,
    as distinct ``(_ida, _idb), _ida < _idb`` pairs.  Shared by the
    verified join and the blocking-quality audit, so the audited
    candidate generator IS the deployed one."""
    longs = vals.filter(F.length(key_col) >= q)
    pre = qgram_prefix_rows(longs, key_col, "min_id", q=q, k=k)
    a = pre.select(
        F.col("_eid").alias("_ida"), "_h",
        F.col("_pos").alias("_pa"), F.col("_len").alias("_la"),
    )
    b = pre.select(
        F.col("_eid").alias("_idb"), "_h",
        F.col("_pos").alias("_pb"), F.col("_len").alias("_lb"),
    )
    cand_long = (
        a.join(b, "_h")
        .filter(
            (F.col("_ida") < F.col("_idb"))
            & (F.abs(F.col("_pa") - F.col("_pb")) <= k)
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
        )
        .select("_ida", "_idb")
    )
    # Short-string block.  The q-gram count bound
    # max(|a|,|b|) - q + 1 - q*k >= 1 is VACUOUS when both strings are
    # shorter than q*(k+1): such a pair can sit at ed <= k while
    # sharing zero grams (e.g. q=2, k=2: 'aa' vs 'abba'), so gram
    # blocking cannot see it.  Route every string with len < q*(k+1)
    # (gram-less len < q included) through an explicit block; any
    # partner OUTSIDE the block is long enough to force a shared
    # prefix gram, so the gram join covers those.  For bounded
    # alphabets the block holds < |sigma|^(q*(k+1)) distinct values —
    # but sigma is NOT always small (CJK corpora), so the pairing is a
    # length-keyed hash join, not a broadcast cross: side a fans out to
    # keys len..len+k, side b joins on its own length — every unordered
    # pair within k length lands in exactly the buckets it must, and an
    # adversarial pile of short strings shuffles instead of OOMing the
    # driver.
    smalls = vals.filter(F.length(key_col) < q * (k + 1)).select(
        F.col("min_id").alias("_sid"), F.length(key_col).alias("_sl")
    )
    sa = smalls.select(
        F.col("_sid").alias("_ida"),
        F.col("_sl").alias("_la"),
        F.explode(
            F.sequence(F.col("_sl"), F.col("_sl") + F.lit(k))
        ).alias("_lk"),
    )
    sb = smalls.select(
        F.col("_sid").alias("_idb"), F.col("_sl").alias("_lb"),
        F.col("_sl").alias("_lk"),
    )
    # The fan-out reaches only shorter -> longer, so a pair surfaces in
    # ONE role order; canonicalize ids with least/greatest rather than
    # filtering on _ida < _idb (which would drop pairs whose shorter
    # string carries the larger id).
    cand_small = (
        sa.join(sb, "_lk")
        .filter(
            (F.col("_ida") != F.col("_idb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
        )
        .select(
            F.least("_ida", "_idb").alias("_ida"),
            F.greatest("_ida", "_idb").alias("_idb"),
        )
    )
    return cand_long.unionAll(cand_small).distinct()


def edjoin_value_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    q: int = 2,
    k: int = 2,
    dist_col: str = "dist",
) -> DataFrame:
    """All DISTINCT-value pairs at edit distance 1..k, exactly:
    Ed-Join prefix-filtered candidates + levenshtein verification, in
    the multiplicity-carrying working-set form the FastSS join ships
    (the 43x sf1 lesson: collapse duplicates BEFORE the quadratic
    stage).  Returns ``(<key>_a, <key>_b, n_a, n_b, min_id_a, min_id_b,
    dist)`` ordered by ``min_id_a < min_id_b``."""
    # One value-collapse pass, shared by every branch: without the
    # checkpoint the logical subtree is COPIED into longs/smalls/left/
    # right and column pruning specializes each copy past exchange
    # reuse — the corpus would be scanned and grouped per branch
    # (found by the plan gate counting 8 string-keyed exchanges).
    vals = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_ids"), F.min(id_col).alias("min_id")
    ).localCheckpoint(eager=False)
    cand = edjoin_candidates(vals, key_col, q=q, k=k)
    left = vals.select(
        F.col("min_id").alias("_ida"),
        F.col(key_col).alias(f"{key_col}_a"),
        F.col("n_ids").alias("n_a"),
    )
    right = vals.select(
        F.col("min_id").alias("_idb"),
        F.col(key_col).alias(f"{key_col}_b"),
        F.col("n_ids").alias("n_b"),
    )
    return (
        cand.join(left, "_ida")
        .join(right, "_idb")
        .withColumn(
            dist_col,
            F.levenshtein(F.col(f"{key_col}_a"), F.col(f"{key_col}_b")).cast("int"),
        )
        .filter((F.col(dist_col) >= 1) & (F.col(dist_col) <= k))
        .select(
            f"{key_col}_a",
            f"{key_col}_b",
            "n_a",
            "n_b",
            F.col("_ida").alias("min_id_a"),
            F.col("_idb").alias("min_id_b"),
            dist_col,
        )
    )
