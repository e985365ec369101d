"""Serving veneer — the query-side presentation operators
(SURVEY.md §2.3: Q5-Q8, S8), kept thin and set-oriented.

The reference drives these per-hit and per-token over SSE
(SSEOpenAIController.java:136-239); the engine's analog treats the
top-k result as a relation and derives prompts, summaries, links and
the SSE event stream as columns — the per-user demux (Q9) is a
serving-process concern with no analytic content and is intentionally
out of scope (SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Q5 — SSEOpenAIController.java:151-155 (exact template; note the space
# between the closing triple-quote and the newlines, '""" \n\n' at :153)
PROMPT_TEMPLATE_PREFIX = '""" '
PROMPT_TEMPLATE_SUFFIX = (
    ' """ \n\nFrom the above document "{query}" Please extract the part that describes.'
)

# Q6 — the reference's fixed system prompt drives a GPT-4 call per hit
# (SSEOpenAIController.java:90-94, 158-184).  Outside the deterministic
# correctness surface: the default mock extracts a prefix.
MOCK_SUMMARY_LEN = 80

# Q8 — index.html:157 undoes this sentinel client-side
SSE_SPACE_SENTINEL = "<SPECIAL_WHITE_SPACE>"


def build_prompt(text_col: Column | str, query_text: str) -> Column:
    """Q5: the per-hit chat prompt as a column expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.concat(
        F.lit(PROMPT_TEMPLATE_PREFIX),
        c,
        F.lit(PROMPT_TEMPLATE_SUFFIX.replace("{query}", query_text)),
    )


def llm_extract(
    df: DataFrame,
    text_col: str = "origntext",
    out_col: str = "summary",
    llm_fn: Callable[[list[str]], list[str]] | None = None,
) -> DataFrame:
    """Q6: per-hit summarize stage.

    ``llm_fn`` (prompts -> completions) is the external-model hook,
    applied via an Arrow-batched pandas UDF.  The default mock —
    first ``MOCK_SUMMARY_LEN`` chars + ellipsis — is a *native* column
    expression: deterministic, oracle-checkable, and zero-cost.
    """
    if llm_fn is None:
        c = F.col(text_col)
        mock = F.when(
            F.length(c) > MOCK_SUMMARY_LEN,
            F.concat(F.substring(c, 1, MOCK_SUMMARY_LEN), F.lit("...")),
        ).otherwise(c)
        return df.withColumn(out_col, mock)

    @F.pandas_udf(T.StringType())
    def run(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield pd.Series(llm_fn(s.fillna("").tolist()))

    return df.withColumn(out_col, run(F.col(text_col)))


def blob_url(account_url: str, file_col: Column | str = "fileName", page_col: Column | str = "pageNumber") -> Column:
    """Q7: ``{account}/{fileName}#page={pageNumber}`` citation link
    (SSEOpenAIController.java:204-206)."""
    f = F.col(file_col) if isinstance(file_col, str) else file_col
    p = F.col(page_col) if isinstance(page_col, str) else page_col
    return F.concat(F.lit(account_url), f, F.lit("#page="), p)


def sse_escape(col: Column | str) -> Column:
    """Q8: the space sentinel applied to streamed token text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, " ", SSE_SPACE_SENTINEL)


def json_escape(col: Column | str) -> Column:
    """Escape ``\\`` and ``\"`` in a string column destined for a JSON
    string literal — the two characters the reference's Gson serializer
    escapes that can appear in fileName/summary payloads
    (SSEOpenAIController.java:189-234).  Backslash first so the quote
    escape's own backslash is not re-escaped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"'))


def sse_events(
    hits: DataFrame,
    account_url: str,
    id_col: str = "id",
    summary_col: str = "summary",
) -> DataFrame:
    """S8: the three-event-per-hit SSE stream as a relation.

    The reference emits a tagged union — ``create`` area, ``createLink``,
    ``addMessage`` (entities/Create*.java, serialized at
    SSEOpenAIController.java:189-234) — per hit, in that order.  Here:
    one row per event, ``event_json`` shaped exactly like the
    reference's Gson payloads (field order = record component order),
    ``seq`` making the per-hit ordering explicit.
    """
    esc_file = json_escape("fileName")
    create = F.concat(
        F.lit('{"type":"create","id":"'), F.col(id_col), F.lit('"}')
    )
    link = F.concat(
        F.lit('{"type":"createLink","id":"'), F.col(id_col),
        F.lit('","link":"'), blob_url(account_url, file_col=esc_file),
        F.lit('","pageNumber":'), F.col("pageNumber").cast("string"),
        F.lit(',"fileName":"'), esc_file, F.lit('"}'),
    )
    message = F.concat(
        F.lit('{"type":"addMessage","id":"'), F.col(id_col),
        F.lit('","content":"'), sse_escape(json_escape(summary_col)), F.lit('"}'),
    )
    events = F.array(
        F.struct(F.lit(1).alias("seq"), create.alias("event_json")),
        F.struct(F.lit(2).alias("seq"), link.alias("event_json")),
        F.struct(F.lit(3).alias("seq"), message.alias("event_json")),
    )
    return hits.select(
        F.col(id_col), F.explode(events).alias("_e")
    ).select(id_col, F.col("_e.seq").alias("seq"), F.col("_e.event_json").alias("event_json"))


def expand_context(
    hits: DataFrame,
    corpus: DataFrame,
    window: int = 1,
    file_col: str = "fileName",
    page_col: str = "pageNumber",
    text_col: str = "origntext",
    sep: str = "\n\n",
) -> DataFrame:
    """Small-to-big retrieval: stitch each KNN hit's +/-``window``
    neighboring pages (same file) into one ``context`` string.

    The reference serves the matched chunk text alone as the LLM
    context (SSEOpenAIController.java:151-155 builds the prompt from
    the single hit row).  The standard RAG refinement retrieves SMALL
    units (precise vector match) but feeds the LLM BIG units (the hit
    plus its physical neighbors) — chunk boundaries routinely split a
    sentence's evidence across pages, and the expansion recovers it
    without blurring the search signal.

    Scale shape: ``hits`` is k rows; its exploded wanted-page relation
    (k * (2*window+1) rows) is broadcast, so the corpus side — the
    100 TB relation — is scanned once with NO shuffle, pruned to
    ``(file, page, text)``, and only matching neighbor rows survive to
    the (tiny) grouped stitch.  With the corpus bucketed by fileName
    (``ingest.write_corpus``) the broadcast hash join touches only the
    hit files' buckets.

    Output: one row per hit — ``(fileName, pageNumber, distance,
    n_parts, context)`` where ``n_parts`` counts the pages actually
    found (edge pages have fewer neighbors) and ``context`` is the
    found pages' text joined by ``sep`` in page order.
    """
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    wanted = hits.select(
        F.col(file_col).alias("_hf"),
        F.col(page_col).alias("_hp"),
        "distance",
        F.explode(
            F.sequence(F.col(page_col) - window, F.col(page_col) + window)
        ).alias("_want"),
    )
    parts = F.broadcast(wanted).join(
        corpus.select(
            F.col(file_col).alias("_cf"),
            F.col(page_col).alias("_cp"),
            F.col(text_col).alias("_ct"),
        ),
        on=[F.col("_hf") == F.col("_cf"), F.col("_want") == F.col("_cp")],
        how="inner",
    )
    return (
        parts.groupBy("_hf", "_hp", "distance")
        .agg(F.array_sort(F.collect_list(F.struct("_cp", "_ct"))).alias("_ps"))
        .select(
            F.col("_hf").alias(file_col),
            F.col("_hp").alias(page_col),
            "distance",
            F.size("_ps").alias("n_parts"),
            F.array_join(F.transform("_ps", lambda s: s["_ct"]), sep).alias("context"),
        )
    )
