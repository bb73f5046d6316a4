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
    "CARD_RE",
    "luhn_valid",
    "card_candidates",
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


#: 16-digit payment card, contiguous or 4-4-4-4 with - or space — the
#: syntactic candidate; :func:`luhn_valid` separates real card numbers
#: from phone-adjacent digit runs (checksum verify, not just shape).
CARD_RE = r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[0-9]{16}\b"


def _count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern)).cast("int")


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum of a (possibly -/space-separated) digit string as
    a pure expression: strip separators, double every second digit
    from the RIGHT (−9 when >9), sum ≡ 0 (mod 10). No UDF — a
    transform over character positions inside codegen'd array ops,
    mirrorable in SQL."""
    ds = F.regexp_replace(cand, r"[- ]", "")
    n = F.length(ds)

    def d(i):
        return ds.substr(i, F.lit(1)).cast("long")

    # the check digit is the LAST digit (n − i = 0, plain); doubling
    # starts second-from-right (n − i odd) ⇒ 2d, −9 when > 9 — written
    # as (2d mod 10) + floor(2d / 10), all integer arithmetic
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            F.pmod(n - i, F.lit(2)) == 1,
            F.pmod(d(i) * 2, F.lit(10)) + F.floor(d(i) * 2 / 10),
        ).otherwise(d(i)),
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.pmod(total, F.lit(10)) == 0


def card_candidates(text: Column) -> Column:
    """All card-shaped substrings that PASS the Luhn check — the spans
    redaction must scrub."""
    return F.filter(F.regexp_extract_all(text, F.lit(CARD_RE), 0), luhn_valid)


def pii_count_columns(text_col: str = "text", cards: bool = False) -> list[Column]:
    """The named count/flag columns — composable into any projection
    (``df.select(id, *pii_count_columns(), ...)``) so one scan can
    carry counts next to other derived columns. ``cards=True`` adds
    ``n_cards`` (Luhn-VERIFIED 16-digit payment cards — checksum, not
    just shape) and folds it into ``has_pii``; off by default so
    existing oracle-pinned outputs stay byte-stable."""
    t = F.col(text_col)
    n_em = _count(t, EMAIL_RE)
    n_ph = _count(t, PHONE_RE)
    n_ip = _count(t, IPV4_RE)
    cols = [
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        n_ip.alias("n_ipv4"),
    ]
    if cards:
        n_cd = F.size(card_candidates(t)).cast("int")
        cols.append(n_cd.alias("n_cards"))
        cols.append(((n_em + n_ph + n_ip + n_cd) > 0).alias("has_pii"))
    else:
        cols.append(((n_em + n_ph + n_ip) > 0).alias("has_pii"))
    return cols


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
    cards: bool = False,
) -> DataFrame:
    """Replace PII spans with typed placeholders — ``[PHONE]``,
    ``[EMAIL]``, ``[IP]`` (and ``[CARD]`` with ``cards=True``) —
    keeping the rest of the text byte-identical. Adds ``out_col``
    next to the original columns.

    Card scrubbing runs FIRST and only on Luhn-VALID candidates (a
    left-to-right fold of literal replaces over the verified span
    list — regexp_replace can't be conditional per match); an invalid
    card-shaped digit run is left for a human, not silently eaten."""
    t = F.col(text_col)
    red = t
    if cards:
        red = F.aggregate(
            card_candidates(t),
            t,
            lambda acc, c: F.replace(acc, c, F.lit("[CARD]")),
        )
    red = F.regexp_replace(red, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, IPV4_RE, "[IP]")
    return docs.withColumn(out_col, red)
