"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting (SURVEY.md §2.3 X4 + north-star text
analysis).

All pure Column expressions over the ``documents`` table — no UDFs, so
they stay in whole-stage codegen and mirror 1:1 into the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import fan_out

__all__ = [
    "token_stats",
    "quality_columns",
    "quality_score",
    "lang_columns",
    "lang_id",
    "rolling_fingerprint",
    "corpus_stats",
    "repetition_stats",
    "top_ngrams",
    "gopher_rules",
    "script_ratios",
    "lexical_diversity",
    "zipf_slope",
    "readability_scores",
]

#: rolling-hash base/modulus for k-gram fingerprints (Rabin-Karp style);
#: int64-safe for token ids < 2^30.
FP_BASE = 1_000_003
FP_PRIME = 2_147_483_647


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: whitespace token count, a BPE-ish
    subword-regex token count (runs of letters / digits / single
    punctuation — a tokenizer-rate proxy), char length, average token
    length."""
    toks = TX.tokens(F.col(text_col))
    bpeish = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return fan_out(docs).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        TX.n_tokens(text_col).alias("n_tokens"),
        bpeish.cast("int").alias("n_subword_tokens"),
        (
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("avg_token_len"),
    )


def quality_columns(text_col: str = "text", toks_col: str | None = None) -> list[Column]:
    """The quality-signal expressions as named columns — composable
    into any projection (no join needed to attach them to a row).

    ``toks_col`` (optional) names an already-projected token-array
    column (``TX.tokens(text_col)``): the signals below reference the
    token array ~4×, and inlined ``tokens(text)`` re-runs the regex
    split per reference — higher-order-function expressions evaluate
    interpreted with no CSE (the shingle-pipeline lesson,
    dedup.shingle_tids_hash). Same expressions, same values either
    way; pre-projecting just evaluates the split once per row."""
    toks = F.col(toks_col) if toks_col else TX.tokens(F.col(text_col))
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z ]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    ).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    sw_ratio = TX.stopword_ratio(toks)
    len_ok = (F.size(toks) >= 20) & (F.size(toks) <= 10000)
    score = (
        F.when(len_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sw_ratio > 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * distinct_ratio
    )
    return [
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        F.round(score, 6).alias("quality"),
    ]


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: blend of length band,
    stopword presence, alphabetic ratio, and repetition (distinct-token
    ratio) — the standard cheap pre-filter signals for LLM training
    corpora (C4/Gopher-style rules, public literature)."""
    base = fan_out(docs).select(
        F.col(id_col), F.col(text_col), TX.tokens(F.col(text_col)).alias("__toks")
    )
    return base.select(F.col(id_col), *quality_columns(text_col, toks_col="__toks"))


_LANG_WORDLISTS = {
    "en": TX.EN_STOPWORDS,
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "uno", "para", "con", "por"],
}


def lang_columns(text_col: str = "text", ltoks_col: str | None = None) -> list[Column]:
    """Language-ID expressions as named columns — composable into any
    projection (no join needed to attach them to a row).

    ``ltoks_col`` (optional) names an already-projected column holding
    ``array_distinct(transform(tokens(text), lower))``: the per-language
    structs below otherwise re-run split+lower+distinct once PER
    LANGUAGE per row (interpreted HOF evaluation has no CSE — see
    quality_columns). Identical values either way."""
    if ltoks_col:
        distinct_toks = F.col(ltoks_col)
    else:
        distinct_toks = F.array_distinct(
            F.transform(TX.tokens(F.col(text_col)), F.lower)
        )
    scores = [
        F.struct(
            F.size(F.array_intersect(distinct_toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in _LANG_WORDLISTS.items()
    ]
    best = F.array_max(F.array(*scores))
    return [
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("stopword_hits"),
    ]


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit-rate per language wordlist,
    argmax wins (n-gram-free variant of the classic stopword profile
    method; 'und' when nothing matches). Wordlists are tiny broadcast
    literals — the scan stays one narrow projection."""
    base = fan_out(docs).select(
        F.col(id_col),
        F.array_distinct(F.transform(TX.tokens(F.col(text_col)), F.lower)).alias("__ltoks"),
    )
    return base.select(F.col(id_col), *lang_columns(text_col, ltoks_col="__ltoks"))


def rolling_fingerprint(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_path: str = "portable",
) -> DataFrame:
    """Document fingerprint: minimum Rabin-Karp rolling hash over
    k-token windows (winnowing-style min-sampling, Schleimer et al.).
    Token → int folded to 2^30 (``hash_path='portable'`` = md5-derived,
    exactly mirrorable by the DuckDB oracle; ``'xxhash'`` = faster
    JVM xxhash64 for production); window hash = Σ tid·BASEʲ mod P;
    fingerprint = min window hash. One projection, no shuffle."""
    toks = TX.tokens(F.col(text_col))
    token_hash = TX.portable_token_hash if hash_path == "portable" else F.xxhash64
    tids = F.transform(toks, lambda t: F.pmod(token_hash(t), F.lit(1 << 30)))
    n_win = F.greatest(F.size(tids) - F.lit(k - 1), F.lit(1))
    win_hash = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.aggregate(
            F.slice(tids, i, k),
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(acc * F.lit(FP_BASE) + t, F.lit(FP_PRIME)),
        ),
    )
    # portable path = one md5 per token per row: CPU-bound projection —
    # fan out under-split sources (no-op on real multi-row-group tables)
    return fan_out(docs).select(
        F.col(id_col),
        F.array_min(win_hash).alias("fingerprint"),
        F.size(F.array_distinct(win_hash)).alias("n_distinct_windows"),
    )


def repetition_stats(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repeated-n-gram repetition signals per document — the standard
    boilerplate/loop detector for LLM training corpora (Gopher-style
    "fraction of duplicate n-grams" and "fraction in the most frequent
    n-gram" rules, public literature).

    Emits ``(id, n_ngrams, n_distinct_ngrams, dup_ngram_ratio,
    top_ngram_ratio)`` where ``dup_ngram_ratio = 1 − distinct/total``
    and ``top_ngram_ratio = count(mode n-gram)/total``.

    Shape for scale: ZERO shuffle. Every n-gram of a document already
    lives in that document's row, so all three statistics are per-row
    expressions: sort the n-gram array, mark run boundaries (positions
    ``i`` where ``s[i] ≠ s[i+1]``), then ``n_distinct`` = number of
    boundaries and ``top count`` = max gap between consecutive
    boundaries. One scan, one projection, whole plan skew-free.
    (History, all measured at 50k docs: the original
    explode → groupBy(doc, n-gram) → groupBy(doc) shape was scale-SAFE
    — shuffle keys contained the doc id — but moved every n-gram string
    through two exchanges: 13.9 s vs DuckDB's 3.0 s. An ``aggregate``
    struct-state fold avoided the shuffles but evaluated an interpreted
    lambda per element: ~2× worse than the explode. This
    boundary-position form keeps the per-element lambdas trivial
    (one comparison, one subtraction) and runs in 0.77 s — 18× over
    the explode shape and 4× faster than DuckDB on the same data.)
    """
    # tokens projected first: shingles() references its argument ~7×
    # and an inlined tokens(text) would re-tokenize per reference
    # (interpreted HOF eval has no CSE — see contamination.py)
    ngrams = TX.shingles(F.col("__toks"), n)
    # CPU-bound projection: fan out under-split sources
    base = fan_out(docs).select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.array_sort(ngrams).alias("__s"))
    s = F.col("__s")
    # 1-based positions where a run of equal n-grams ends (always
    # includes the last position: try_element_at past the end is NULL →
    # coalesce(TRUE)). n-grams themselves are never NULL (concat_ws).
    ends = F.filter(
        F.sequence(F.lit(1), F.size("__s")),
        lambda i: F.coalesce(
            F.try_element_at(s, i + 1) != F.element_at(s, i), F.lit(True)
        ),
    )
    stage = base.select(
        F.col(id_col),
        F.size("__s").cast("long").alias("n_ngrams"),
        ends.alias("__ends"),
    )
    # run lengths = pairwise diffs of end positions (0-prepended)
    starts = F.concat(
        F.array(F.lit(0)),
        F.slice(F.col("__ends"), 1, F.greatest(F.size("__ends") - 1, F.lit(0))),
    )
    top = F.array_max(F.zip_with(F.col("__ends"), starts, lambda e, p: e - p))
    total = F.col("n_ngrams").cast("double")
    return stage.select(
        F.col(id_col),
        F.col("n_ngrams"),
        F.size("__ends").cast("long").alias("n_distinct_ngrams"),
        F.round(F.lit(1.0) - F.col("n_distinct_ngrams") / total, 6).alias("dup_ngram_ratio"),
        F.round(top / total, 6).alias("top_ngram_ratio"),
    )


def corpus_stats(docs: DataFrame, group_cols: list[str] | None = None, text_col: str = "text") -> DataFrame:
    """Corpus-level rollup: docs, chars, tokens, avg doc length per
    group (default: lang × source). Partial aggregation (map-side
    combine) makes this one narrow shuffle of the group keys."""
    groups = group_cols or ["lang", "source"]
    return (
        docs.groupBy(*groups)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).alias("total_chars"),
            F.sum(TX.n_tokens(text_col)).alias("total_tokens"),
            F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        )
        .orderBy(*groups)
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    top: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level heavy hitters: the ``top`` most frequent word
    n-grams with total count and the number of distinct docs containing
    each — the boilerplate detector (navigation chrome, license
    headers, cookie banners) that feeds stop-shingle lists for the
    dedup/contamination family.

    Shape: one explode → one hash aggregation keyed by n-gram (partial
    map-side combine bounds the shuffle by distinct n-grams, not corpus
    tokens) → global top-``top`` via TakeOrderedAndProject (no full
    sort).  Ties break lexicographically so the cut is deterministic
    across engines.
    """
    grams = docs.select(
        "doc_id", TX.tokens(text_col).alias("__toks")
    ).select(
        "doc_id", F.explode(TX.shingles(F.col("__toks"), n)).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(
        F.desc("n_occurrences"), F.asc("ngram")
    ).limit(top)


#: the Gopher rules' required-stopword list (Rae et al. 2021, Table A1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A1 —
    the published MassiveWeb filter), one boolean per rule so a
    curation pipeline can audit WHICH gate dropped a page, not just
    that one did:

    * ``r_word_count`` — word count in [min_words, max_words];
    * ``r_mean_word_len`` — mean word length in [3, 10];
    * ``r_symbol_ratio`` — (# of '#' or '…'/'...')/words ≤ 0.1;
    * ``r_bullet_lines`` — ≤ 90% of lines start with a bullet;
    * ``r_ellipsis_lines`` — ≤ 30% of lines end with an ellipsis;
    * ``r_alpha_words`` — ≥ 80% of words contain a letter;
    * ``r_stopwords`` — ≥ 2 distinct required stopwords present;
    * ``gopher_pass`` — the conjunction.

    Pure projection (array ops over the token/line splits — no
    shuffle, no UDF); thresholds are the paper's.
    """
    txt = F.col(text_col)
    toks = TX.tokens(txt)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
        / nw
    )
    n_symbols = F.regexp_count(txt, F.lit("#")) + F.regexp_count(
        txt, F.lit(r"\.\.\.")
    )
    symbol_ratio = n_symbols.cast("double") / nw
    lines = F.split(txt, "\n")
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*\u2022]")))
        .cast("double")
        / nl
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))).cast("double")
        / nl
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / nw
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "r_symbol_ratio": symbol_ratio <= 0.1,
        "r_bullet_lines": bullet_frac <= 0.9,
        "r_ellipsis_lines": ellipsis_frac <= 0.3,
        "r_alpha_words": alpha_frac >= 0.8,
        "r_stopwords": stop_hits >= 2,
    }
    passed = None
    for c in rules.values():
        passed = c if passed is None else (passed & c)
    return fan_out(docs).select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("n_stopword_kinds"),
        *[c.alias(name) for name, c in rules.items()],
        passed.alias("gopher_pass"),
    )


def script_ratios(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script mix per document: the fraction of non-space
    characters that are Latin letters, digits, Cyrillic, or CJK — the
    cheap multilingual routing signal next to the wordlist
    :func:`lang_id` (scripts catch what wordlists can't: a doc can be
    0% English words but 100% Latin script, or vice versa).

    Pure regex-count projection (count = length minus length-after-
    removal, the same trick as the PII counters): one scan, no shuffle,
    no UDF. ``other_ratio`` is the remainder (punctuation, Greek,
    Arabic, emoji, …).
    """
    t = F.col(text_col)

    def n_of(pattern: str):
        return F.length(t) - F.length(F.regexp_replace(t, pattern, ""))

    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    denom = F.greatest(non_space, F.lit(1))
    latin = n_of(r"[A-Za-z]")
    digit = n_of(r"[0-9]")
    cyr = n_of(r"[Ѐ-ӿ]")
    cjk = n_of(r"[一-鿿]")
    return docs.select(
        F.col(id_col),
        non_space.alias("n_chars"),
        (latin / denom).alias("latin_ratio"),
        (digit / denom).alias("digit_ratio"),
        (cyr / denom).alias("cyrillic_ratio"),
        (cjk / denom).alias("cjk_ratio"),
        ((non_space - latin - digit - cyr - cjk) / denom).alias("other_ratio"),
    )


def lexical_diversity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity profile: token count, distinct
    types, type-token ratio, hapax legomena (tokens occurring once),
    and Shannon entropy of the token distribution — the vocabulary-
    richness quality signals next to :func:`repetition_stats`
    (templated/boilerplate text scores low entropy and low TTR).

    Entropy uses the one-pass identity
    ``H = log2(n) − Σ c·log2(c) / n`` over the per-type run lengths.

    Shape for scale: ZERO shuffle — every token of a document already
    lives in that document's row, so the whole profile is a per-row
    projection: sort the token array, mark run boundaries (positions
    ``i`` where ``s[i] ≠ s[i+1]``), and every statistic falls out of
    the run-length array (types = #runs, hapax = #length-1 runs,
    Σ c·log2(c) = one array fold) — the same boundary-position form
    that took :func:`repetition_stats` from 13.9 s to 0.77 s at 50k
    docs. (History: the original explode → groupBy(doc, token) →
    groupBy(doc) shape was scale-SAFE — shuffle keys contained the doc
    id — but moved every token string through two exchanges: 2.07 s vs
    DuckDB's 1.06 s at the 10× probe, the round-7 verdict's last
    near-bar family.) Docs whose token array is empty are dropped,
    matching the explode semantics of the original and the SQL mirror.
    Per-element lambdas are trivial (compare / subtract / multiply);
    token arrays are projected to their own column first — interpreted
    HOF eval has no common-subexpression elimination (contamination.py
    lesson), so multi-referenced non-cheap arrays must be materialized
    columns.
    """
    base = (
        fan_out(docs)
        .select(F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(F.col(id_col), F.array_sort("__toks").alias("__s"))
    )
    s = F.col("__s")
    # 1-based positions where a run of equal tokens ends (always
    # includes the last position: try_element_at past the end is NULL →
    # coalesce(TRUE)). tokens are never NULL (split output).
    ends = F.filter(
        F.sequence(F.lit(1), F.size("__s")),
        lambda i: F.coalesce(
            F.try_element_at(s, i + 1) != F.element_at(s, i), F.lit(True)
        ),
    )
    stage = base.select(
        F.col(id_col),
        F.size("__s").cast("long").alias("n_tokens"),
        ends.alias("__ends"),
    )
    # run lengths = pairwise diffs of end positions (0-prepended)
    starts = F.concat(
        F.array(F.lit(0)),
        F.slice(F.col("__ends"), 1, F.greatest(F.size("__ends") - 1, F.lit(0))),
    )
    runs = F.zip_with(F.col("__ends"), starts, lambda e, p: e - p)
    stage2 = stage.select(F.col(id_col), "n_tokens", runs.alias("__runs"))
    r = F.col("__runs")
    n = F.col("n_tokens").cast("double")
    clog = F.aggregate(
        r,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log2(c.cast("double")),
    )
    return stage2.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.size(r).cast("long").alias("n_types"),
        F.size(F.filter(r, lambda c: c == F.lit(1))).cast("long").alias("hapax"),
        (F.size(r) / n).alias("ttr"),
        (F.log2(n) - clog / n).alias("entropy"),
    )


def zipf_slope(docs: DataFrame, top_n: int = 1000, text_col: str = "text") -> DataFrame:
    """Corpus-level Zipf fit: the least-squares slope of
    ``log(freq) ~ log(rank)`` over the ``top_n`` most frequent tokens
    (natural-language corpora sit near −1; heavily templated or
    synthetic text drifts off). One corpus-wide token count
    (partial-agged), a bounded top-N (TakeOrderedAndProject — the
    window that ranks runs on the N-row frame only, never the full
    vocabulary), and one ``regr_slope`` aggregate. Ties on count are
    broken token-asc in BOTH the top-N cut and the rank, so the fit is
    deterministic. Returns 1 row ``(slope, intercept, n_terms)``."""
    counts = (
        docs.select(F.explode(TX.tokens(F.col(text_col))).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__tok"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("__c"), F.asc("__tok"))
    ranked = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("__lr"),
        F.log(F.col("__c").cast("double")).alias("__lf"),
    )
    return ranked.agg(
        F.regr_slope("__lf", "__lr").alias("slope"),
        F.regr_intercept("__lf", "__lr").alias("intercept"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-reading-ease-style readability per document, from fully
    deterministic proxies (no dictionary): sentences = runs of
    ``[.!?]`` (min 1), words = whitespace tokens, syllables = vowel
    groups ``[aeiouy]+`` in the lowercased text floored at one per
    word. ``flesch = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)``. Pure projection — no shuffle, no UDF;
    every term is a regexp_count/size expression Catalyst evaluates
    in one pass over the text column."""
    text = F.col(text_col)
    n_words = F.greatest(TX.n_tokens(text), F.lit(1)).cast("long")
    n_sents = F.greatest(F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)).cast("long")
    n_syll = F.greatest(
        F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")), n_words
    ).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )
