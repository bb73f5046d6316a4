"""PII detection and redaction over text columns.

Training-corpus hygiene: count and scrub emails, NANP-style phone
numbers, and IPv4 addresses with pure regex expressions
(``regexp_count`` / ``regexp_replace``) — JVM-side, codegen'd, no UDFs,
and exactly mirrorable by a DuckDB oracle (the patterns below restrict
themselves to syntax RE2 and java.util.regex interpret identically:
character classes, bounded repetition, ASCII word boundaries).

This is a *pattern* scrubber — the cheap first pass a 100 TB pipeline
runs on every document. Model-based NER redaction (names, addresses)
belongs in the per-executor model seam (functions/embed.py
``model_inference_udf``) and is out of scope here.

Scale: one narrow projection per document — no shuffle, no join; the
regexes ride the parquet scan. Redaction order is email → phone → ipv4:
email first because an email can CONTAIN a phone-shaped local part
(``555-123-4567@example.com`` must become ``[EMAIL]``, not
``[PHONE]@example.com`` with the domain surviving), and phone before
ipv4 so dotted phone separators are never half-eaten by the ipv4 pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_RE",
    "PHONE_RE",
    "IPV4_RE",
    "pii_count_columns",
    "pii_stats",
    "pii_redact",
]

#: RFC-ish email (the pragmatic subset every scrubber uses).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: NANP phone with -, . or space separators (555-123-4567 etc.).
PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
#: dotted-quad IPv4 (syntactic; 999.0.0.1 matches — scrubbers accept that).
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern)).cast("int")


def pii_count_columns(text_col: str = "text") -> list[Column]:
    """The named count/flag columns — composable into any projection
    (``df.select(id, *pii_count_columns(), ...)``) so one scan can
    carry counts next to other derived columns."""
    t = F.col(text_col)
    n_em = _count(t, EMAIL_RE)
    n_ph = _count(t, PHONE_RE)
    n_ip = _count(t, IPV4_RE)
    return [
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        n_ip.alias("n_ipv4"),
        ((n_em + n_ph + n_ip) > 0).alias("has_pii"),
    ]


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII hit counts: ``(id, n_emails, n_phones, n_ipv4,
    has_pii)`` — the filter/routing columns (e.g. quarantine docs with
    ``has_pii`` before human review)."""
    return docs.select(F.col(id_col), *pii_count_columns(text_col))


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Replace PII spans with typed placeholders — ``[PHONE]``,
    ``[EMAIL]``, ``[IP]`` — keeping the rest of the text byte-identical.
    Adds ``out_col`` next to the original columns."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, IPV4_RE, "[IP]")
    return docs.withColumn(out_col, red)
