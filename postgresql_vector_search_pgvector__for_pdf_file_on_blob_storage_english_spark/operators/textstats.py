"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

Everything is a composition of built-in string/regex functions —
no Python in the hot path, so the operators run inside whole-stage
codegen and scale linearly with the scan.  All of them are
oracle-checkable (the regexes are chosen to mean the same thing in
Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_whitespace_col

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Counting is done on ' word '-padded text so markers match whole words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]

# BPE-ish pretokenizer: letter runs | digit runs | single non-space symbol.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), " "))


def _marker_hits(padded: Column, words: list[str]) -> Column:
    """Total whole-word occurrences of the marker list."""
    out = F.lit(0)
    for w in words:
        out = out + F.size(F.split(padded, f" {w} ", -1)) - 1
    return out


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    markers: dict[str, list[str]] | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Argmax of per-language marker-word counts, 'und' when all zero.

    Ties break in lexicographic language order (deterministic, declared).
    ``keep_cols`` pass through unchanged so pipeline compositions stay a
    single projection instead of re-joining on id.
    """
    markers = markers or LANG_MARKERS
    padded = F.concat(F.lit(" "), normalize_whitespace_col(text_col), F.lit(" "))
    scores = {lang: _marker_hits(padded, ws) for lang, ws in sorted(markers.items())}
    best_score = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    pred = F.lit("und")
    for lang in sorted(markers, reverse=True):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        pred.alias("pred_lang"),
        best_score.cast("long").alias("marker_hits"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1].

    Features mirror the usual web-corpus filters: length, mean word
    length, stopword ratio, symbol ratio.  ``keep_cols`` pass through
    unchanged (single-projection pipeline composition).
    """
    norm = normalize_whitespace_col(text_col)
    n_chars = F.length(norm)
    n_words = _word_count(norm)
    avg_word_len = (n_chars - (n_words - 1)).cast("double") / n_words.cast("double")
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    stop_hits = _marker_hits(padded, STOPWORDS_EN)
    stop_ratio = stop_hits.cast("double") / n_words.cast("double")
    sym_ratio = (
        F.length(F.regexp_replace(norm, "[A-Za-z0-9 ]", "")).cast("double") / n_chars.cast("double")
    )
    score = (
        F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(sym_ratio * 10.0, F.lit(1.0))) * 0.3
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish pretoken count + chars/token."""
    norm = normalize_whitespace_col(text_col)
    ws_tokens = _word_count(norm)
    bpe_tokens = F.regexp_count(norm, F.lit(BPE_REGEX))
    return df.select(
        F.col(id_col),
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_tokens.cast("long").alias("bpe_tokens"),
        F.round(F.length(norm).cast("double") / bpe_tokens.cast("double"), 4).alias("chars_per_token"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of normalized text + a 60-bit prefix key
    (cheap join/partition key for dedup pipelines)."""
    norm = normalize_whitespace_col(text_col)
    full = F.md5(norm)
    return df.select(
        F.col(id_col),
        full.alias("fingerprint"),
        F.conv(F.substring(full, 1, 15), 16, 10).cast("long").alias("fingerprint60"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher's intra-document repetition filters: duplicate-line
    fractions and the most-repeated word bigram — the rules that catch
    boilerplate/spam documents whole-document dedup misses.

    Two cost regimes, each in its right engine tier:

    * Line stats are per-row array expressions (split → trim → filter →
      aggregate) — no shuffle, the whole corpus pass stays scan-bound.
      ``dup_line_char_frac`` is O(lines²) per document via a nested HOF,
      fine because line counts per document are small and bounded.
    * The top-bigram needs per-key counting, so it is the idiomatic
      explode → groupBy(doc, bigram) → per-doc argmax — map-side partial
      aggregation keeps the exchange ∝ distinct bigrams, and the argmax
      is a ``min_by`` on (−count, bigram) so ties are deterministic.

    Emitted per document:
      * n_lines            — non-empty (trimmed) lines
      * dup_line_frac      — 1 − distinct/total lines
      * dup_line_char_frac — chars in lines occurring >1× / line chars
      * top_bigram         — most frequent word bigram ('' if <2 words)
      * top_bigram_frac    — its share of all bigram occurrences
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n", -1), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    total_line_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    dup_line_chars = F.aggregate(
        lines,
        F.lit(0),
        lambda a, l: a
        + F.when(F.size(F.filter(lines, lambda x: x == l)) > 1, F.length(l)).otherwise(0),
    )
    zero = F.lit(0.0)
    line_stats = df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(
            F.when(
                n_lines > 0,
                (n_lines - n_distinct).cast("double") / n_lines.cast("double"),
            ).otherwise(zero),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                total_line_chars > 0,
                dup_line_chars.cast("double") / total_line_chars.cast("double"),
            ).otherwise(zero),
            4,
        ).alias("dup_line_char_frac"),
    )

    words = F.split(F.trim(normalize_whitespace_col(text_col)), " ")
    # Explode INDICES, not the composed bigram array: Spark's Generate
    # re-evaluates a non-attribute generator per OUTPUT row, making
    # explode(bigram_array) O(words^2) text work per doc (measured ~7x
    # wall-clock at sf0.1 — same pathology fixed in decontam.py).  The
    # sequence generator is cheap; each bigram is built once per output
    # row from the carried words attribute.  Docs with <2 words are
    # filtered out pre-explode (sequence(1, 0) runs *descending* and
    # would index out of bounds) and re-enter via the left join.
    staged = df.select(F.col(id_col), words.alias("_bw")).withColumn(
        "_nw", F.size("_bw")
    )
    ex = staged.filter(F.col("_nw") >= 2).select(
        F.col(id_col),
        "_bw",
        F.explode(F.sequence(F.lit(1), F.col("_nw") - 1)).alias("_i"),
    )
    exploded = ex.select(
        F.col(id_col),
        F.concat(
            F.element_at("_bw", F.col("_i")),
            F.lit(" "),
            F.element_at("_bw", F.col("_i") + 1),
        ).alias("bigram"),
    )
    counts = exploded.groupBy(id_col, "bigram").agg(F.count("*").alias("_c"))
    top = counts.groupBy(id_col).agg(
        F.min_by(
            F.col("bigram"), F.struct((-F.col("_c")).alias("_nc"), F.col("bigram"))
        ).alias("top_bigram"),
        F.max("_c").alias("_top_c"),
        F.sum("_c").alias("_n_bigrams"),
    )
    return (
        line_stats.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
            F.round(
                F.coalesce(
                    F.col("_top_c").cast("double") / F.col("_n_bigrams").cast("double"),
                    zero,
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style document filter rules as native expressions —
    the per-document pass/fail bits a web-scale curation pipeline
    applies before training.  All whole-stage codegen; thresholds are
    the published Gopher rules where applicable.

    Emitted flags (True = passes the rule):
      * word_count_ok     — 50 <= n_words <= 100_000
      * mean_word_len_ok  — 3 <= mean word length <= 10
      * symbol_ratio_ok   — '#' or '...' to word ratio <= 0.1
      * bullet_ratio_ok   — <= 90% of lines start with a bullet
      * ellipsis_ratio_ok — <= 30% of lines end with '...'
      * alpha_word_ratio_ok — >= 80% of words contain a letter
      * keep              — conjunction of all flags
    """
    norm = normalize_whitespace_col(text_col)
    words = F.split(F.trim(norm), " ")
    n_words = F.size(words)
    n_chars_in_words = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = n_chars_in_words.cast("double") / n_words.cast("double")

    hash_count = F.size(F.split(norm, "#", -1)) - 1
    ellipsis_count = F.size(F.split(norm, r"\.\.\.", -1)) - 1
    symbol_ratio = (hash_count + ellipsis_count).cast("double") / n_words.cast("double")

    # line structure is judged on the RAW text (normalization folds \n)
    lines = F.split(F.col(text_col), "\n", -1)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))

    flags = {
        "word_count_ok": (n_words >= 50) & (n_words <= 100000),
        "mean_word_len_ok": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "symbol_ratio_ok": symbol_ratio <= 0.1,
        "bullet_ratio_ok": bullet_lines.cast("double") / n_lines.cast("double") <= 0.9,
        "ellipsis_ratio_ok": ellipsis_lines.cast("double") / n_lines.cast("double") <= 0.3,
        "alpha_word_ratio_ok": alpha_words.cast("double") / n_words.cast("double") >= 0.8,
    }
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in flags.items()])
    keep = None
    for k in flags:
        keep = F.col(k) if keep is None else (keep & F.col(k))
    return out.withColumn("keep", keep)


def line_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    blocklist: tuple[str, ...] = ("javascript", "cookie", "lorem ipsum"),
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style LINE-level quality filtering (Raffel et al. 2020 §2.2) —
    the page-level Gopher flags' (``gopher_quality_flags``) line-grained
    sibling: each document is split on newlines, lines failing any rule
    are dropped, survivors are rejoined.

    Rules (all C4's):  a line must have >= ``min_words`` words, must not
    contain a blocklist phrase (case-insensitive; C4 uses a policy/
    javascript/cookie list), and — when ``require_terminal_punct`` —
    must end in a terminal punctuation mark (. ! ? or closing quote).

    Pure per-row array HOFs: zero shuffle, whole-stage codegen, trivially
    streamable.  Output: ``(id, n_lines, n_kept, filtered_text)``.
    """
    lines = F.split(F.col(text_col), "\n")

    def keep(line: Column) -> Column:
        ok = F.size(F.split(F.trim(line), " ")) >= min_words
        low = F.lower(line)
        for phrase in blocklist:
            ok = ok & (F.instr(low, phrase) == 0)
        if require_terminal_punct:
            punct = (
                line.endswith(".") | line.endswith("!")
                | line.endswith("?") | line.endswith('"')
            )
            ok = ok & punct
        return ok

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("filtered_text"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the CCNet-style (Wenzek et al. 2020) language-model
    quality signal (there KenLM perplexity; the unigram LM is its
    self-contained, SQL-replayable analog: score = mean over tokens of
    ln(count(term) / total_tokens); higher = more typical text).

    Shape at 100 TB: tokenization is map-only; the score is computed on
    per-(doc, term) tf — one partial-agg shuffle ∝ distinct doc-term
    pairs, never the token stream.  Term totals (vocab-sized) are
    broadcast when ``broadcast_vocab`` (right up to ~100M-term vocabs);
    set False for open-vocab web corpora and the join shuffles on term
    instead.  No smoothing is needed: every scored token is in the
    vocabulary by construction (the LM is fit on the same corpus).
    Output: (id, n_tokens, logprob) — logprob in [-ln(N), 0].
    """
    tokens = (
        df.select(
            id_col,
            F.explode(
                F.split(F.trim(normalize_whitespace_col(text_col)), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .withColumn("term", F.lower("term"))
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    vocab = F.broadcast(cnt) if broadcast_vocab else cnt
    term_lp = F.col("tf") * F.log(
        F.col("c").cast("double") / F.col("n").cast("double")
    )
    return (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(term_lp) / F.sum("tf")).alias("logprob"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    names: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by LM score and
    cut into equal-frequency buckets (best third = "head", used as the
    highest-quality training slice; Wenzek et al. 2020 §4.3).

    The rank orders by the ROUNDED score (4 dp) with an id tiebreak so
    bucket membership is well-defined across engines/partitionings —
    raw double ordering could flip boundary docs on accumulation-order
    ulps.  The exact equal-frequency split runs on the two-pass
    :func:`~..ranking.global_rank` (range repartition + partitioned
    window — never a single-partition sort), so it stays exact AND
    distributed at corpus scale; the still-cheaper approximate variant
    cuts on sampled score quantiles (a zero-shuffle threshold filter
    like mixture_sample), trading exact bucket sizes for a scan-local
    plan.
    """
    from .ranking import global_rank, ntile_from_rank

    if len(names) != n_buckets:
        raise ValueError(f"need {n_buckets} bucket names, got {len(names)}")
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col).withColumn(
        "_sc", F.round("logprob", 4)
    )
    ranked = global_rank(scored, [F.col("_sc").desc(), F.col(id_col).asc()])
    tile = ntile_from_rank(F.col("_rank"), F.col("_n"), n_buckets).cast("int")
    bucket = F.element_at(F.array(*[F.lit(n) for n in names]), tile)
    return ranked.select(
        id_col,
        "n_tokens",
        F.col("_sc").alias("logprob"),
        bucket.alias("bucket"),
    )
