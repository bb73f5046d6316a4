"""Text expression library: tokenization, shingles, stats.

The reference's only text operator is fixed-size word chunking
(rag_demo/ingest.py:22-25). We generalize to the primitives a training-
data pipeline needs — all as built-in-function expressions so they stay
JVM-side and are mirrorable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "n_tokens",
    "shingles",
    "word_chunks",
    "word_chunks_strided",
    "EN_STOPWORDS",
    "stopword_ratio",
    "portable_token_hash",
    "canonical_text",
]

#: Small deterministic English stopword list for language-ID heuristics
#: and quality scoring. Public-knowledge word list (most frequent English
#: function words).
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>.

    Matches the reference chunker's ``text.split()``
    (rag_demo/ingest.py:23) — Python str.split() semantics on trimmed
    input (split on runs of whitespace, no empty tokens).
    """
    return F.split(F.trim(_as_col(text)), r"\s+")


def n_tokens(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(_as_col(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def shingles(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    For docs shorter than ``n`` tokens, emits the whole doc as one
    shingle (so every doc has ≥1 shingle and MinHash is defined).

    Built by zipping ``n`` shifted copies of the token array and
    concatenating element-wise — O(tokens) with cheap per-element ops.
    The direct ``transform(sequence(1, cnt), i -> array_join(slice(
    toks, i, n)))`` form produces identical strings but evaluates an
    interpreted slice+join per window (O(tokens·n) with per-call
    overhead): 3.7× slower end-to-end on the sf0.1 corpus, and this
    function sits under every dedup/contamination pipeline.

    PERF: pass an ATTRIBUTE (a projected column), not an inline
    ``tokens(text)`` expression — ``toks`` is referenced ~7× here, and
    higher-order functions run interpreted with no common-subexpression
    elimination, so an inline argument is re-evaluated per reference
    (measured 2.4× end-to-end on the contamination probe). Project
    ``tokens(text)`` into its own column first; CollapseProject keeps
    the projection separate precisely because it is non-cheap and
    multi-referenced.
    """
    toks = _as_col(toks)
    shifted = [toks] + [
        F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0)))
        for i in range(1, n)
    ]
    # pin the struct field names: arrays_zip names fields after the
    # source column when given a named column/attribute (e.g. a plain
    # F.col("toks")), which would break the s[str(i)] accesses below
    z = F.arrays_zip(*[c.alias(str(i)) for i, c in enumerate(shifted)])
    cnt = F.size(toks) - F.lit(n - 1)
    full = F.transform(
        F.slice(z, 1, F.greatest(cnt, F.lit(1))),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )
    return F.when(cnt >= 1, full).otherwise(F.array(F.array_join(toks, " ")))


def word_chunks(text: Column | str, max_words: int = 120) -> Column:
    """Fixed-size word chunking — the reference's ``chunk()``
    (rag_demo/ingest.py:22-25): split on whitespace, emit
    ``max_words``-word windows; empty text → no chunks.

    Returns array<string>; pair with ``posexplode`` for (chunk_idx,
    chunk_text) rows.
    """
    toks = tokens(text)
    n_chunks = F.ceil(F.size(toks) / F.lit(max_words)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    out = F.transform(idx, lambda i: F.array_join(F.slice(toks, i * max_words + 1, max_words), " "))
    return F.when(F.trim(_as_col(text)) == "", F.array().cast("array<string>")).otherwise(out)


def word_chunks_strided(
    text: Column | str, size: int = 120, stride: int = 60
) -> Column:
    """Overlapping word chunking — the RAG-standard sliding window
    (``stride < size`` ⇒ consecutive chunks share ``size − stride``
    words, so a sentence cut by one boundary is whole in the next
    chunk).  Windows start at 0, stride, 2·stride, …; the final window
    may be shorter; ``stride == size`` degrades to :func:`word_chunks`;
    empty text → no chunks.  Returns array<string> (pair with
    ``posexplode``)."""
    if stride <= 0 or stride > size:
        raise ValueError("stride must be in [1, size]")
    toks = tokens(text)
    n_tok = F.size(toks)
    n_win = F.when(n_tok <= size, F.lit(1)).otherwise(
        F.ceil((n_tok - F.lit(size)) / F.lit(stride)).cast("int") + 1
    )
    idx = F.sequence(F.lit(0), F.greatest(n_win - 1, F.lit(0)))
    out = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " ")
    )
    # coalesce: NULL text → no chunks (not a single-NULL array), matching
    # blank text and the SQL mirror's WHERE filter
    return F.when(
        F.coalesce(F.trim(_as_col(text)), F.lit("")) == "",
        F.array().cast("array<string>"),
    ).otherwise(out)


def canonical_text(c: Column | str) -> Column:
    """C4/CCNet-style canonical form for normalization-aware dedup:
    lowercase, every run of non-alphanumeric characters collapsed to a
    single space, trimmed. Case changes, punctuation and whitespace
    layout no longer distinguish two copies of the same prose. Pure
    projection; mirror is ``regexp_replace(lower(x), '[^a-z0-9]+', ' ',
    'g')`` + trim in any regex-bearing engine."""
    return F.trim(F.regexp_replace(F.lower(_as_col(c)), "[^a-z0-9]+", " "))


def portable_token_hash(c: Column | str) -> Column:
    """60-bit token hash every engine can reproduce: first 15 hex chars
    of md5, parsed as an integer. Slower than ``xxhash64`` but exactly
    mirrorable in the DuckDB oracle
    (``CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)``); use
    xxhash64 on hot production paths where no cross-engine parity is
    needed."""
    return F.conv(F.substring(F.md5(_as_col(c)), 1, 15), 16, 10).cast("long")


def stopword_ratio(toks: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (lowercased match)."""
    toks = _as_col(toks)
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")
