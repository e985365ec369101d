"""Blob/PDF source + per-page text extraction.

Reference surface (SURVEY.md §2.1/S1-S2, §2.2/P1):

* S1 — blob-arrival PDF source delivering ``(fileName, bytes)``
  (Function.java:73-81, ``@BlobTrigger`` on path ``pdfs/{name}``).
  Spark: the ``binaryFile`` data source — batch **and** streaming
  flavors of the same scan (`readStream` for arrival-driven mode).
* S2 — ``.pdf`` extension predicate (Function.java:85).  Pushed into
  the scan via ``pathGlobFilter`` so non-matching blobs are never
  opened — at 100 TB the filter must prune *files*, not rows.
* P1 — PDF bytes -> per-page text (Function.java:92-134, PDFBox
  ``PDFTextStripper`` page loop).  This is a table function:
  ``binary -> array<struct<pageNumber int, text string>>``, exploded
  with ``posexplode``; runs as an Arrow-batched ``mapInPandas`` so one
  Python worker handles a whole batch of files.

Real ``%PDF`` bytes decode with ``pypdf`` when importable, else with
the vendored stdlib-only codec (:mod:`.pdfcodec` — classic-xref +
FlateDecode + text-operator subset, round-trip-tested against its own
writer's goldens).  The deterministic ``\\f``-separated text format is
kept alongside as the bit-reproducible fixture path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SEP = "\f"

PAGES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("pageNumber", T.IntegerType()),  # 1-based, Function.java:104
            T.StructField("text", T.StringType()),
        ]
    )
)


def read_binary_docs(
    spark: SparkSession, path: str, glob: str = "*.pdf", stream: bool = False
) -> DataFrame:
    """S1/S2: binary scan of a directory with the extension filter pushed
    down as a path-glob (file-level pruning, no bytes read for misses).

    Returns ``(path, modificationTime, length, content)``; ``stream=True``
    gives the identical relation as a streaming source.
    """
    reader = spark.readStream if stream else spark.read
    return reader.format("binaryFile").option("pathGlobFilter", glob).load(path)


def extract_pages_bytes(content: bytes) -> list[tuple[int, str]]:
    """Pure-Python page extraction (unit-test twin of the UDF).

    ``%PDF`` magic -> pypdf when importable, else the vendored
    :mod:`.pdfcodec` reader — the stdlib stand-in for PDFBox's
    page-by-page ``PDFTextStripper`` loop (Function.java:99-118).
    Anything else -> UTF-8 text split on form-feed page separators.
    """
    if content[:5] == b"%PDF-":
        try:
            import io

            from pypdf import PdfReader  # noqa: PLC0415 — optional, preferred
        except ImportError:
            from .pdfcodec import extract_text_pdf

            return extract_text_pdf(content)
        reader = PdfReader(io.BytesIO(content))  # pragma: no cover
        return [(i + 1, p.extract_text() or "") for i, p in enumerate(reader.pages)]
    text = content.decode("utf-8", errors="replace")
    return [(i + 1, page) for i, page in enumerate(text.split(PAGE_SEP))]


def extract_pages(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "pages",
    on_error: str = "fail",
) -> DataFrame:
    """P1 as an Arrow-batched table function: adds ``pages
    array<struct<pageNumber,text>>`` plus ``extract_error string``
    (null on success); explode downstream.

    ``mapInPandas`` (not a scalar UDF) so each Python worker invocation
    amortizes over a whole Arrow batch of files, and the binary column
    is dropped from the output — page text, not raw blobs, crosses the
    next shuffle.

    ``on_error``: ``'fail'`` propagates the first decode exception
    (fail-fast default); ``'skip'`` emits the row with empty pages and
    the error message in ``extract_error`` — one malformed blob among
    millions must not kill a 1000-executor ingest, and the error rows
    feed the status store as FAILED entries.
    """
    import pandas as pd

    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    keep = [c for c in df.columns if c != content_col]
    schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField(out_col, PAGES_SCHEMA), T.StructField("extract_error", T.StringType())]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pages, errors = [], []
            for b in pdf[content_col]:
                try:
                    pages.append(extract_pages_bytes(b) if b is not None else [])
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine contract
                    if on_error == "fail":
                        raise
                    pages.append([])
                    errors.append(f"{type(e).__name__}: {e}")
            out = pdf[keep].copy()
            out[out_col] = [[(n, t) for n, t in ps] for ps in pages]
            out["extract_error"] = errors
            yield out

    return df.mapInPandas(run, schema)


def pdf_source(
    spark: SparkSession, path: str, glob: str = "*.pdf", stream: bool = False
) -> DataFrame:
    """S1+S2+P1 composed: one row per page, ``(fileName, pageNumber, text)``.

    ``fileName`` is the file's base name (the reference's blob name).
    """
    binary = read_binary_docs(spark, path, glob, stream)
    paged = extract_pages(binary)
    return paged.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fileName"),
        F.posexplode_outer(F.col("pages")).alias("_pos", "page"),
    ).select(
        "fileName",
        F.col("page.pageNumber").alias("pageNumber"),
        F.col("page.text").alias("text"),
    )
