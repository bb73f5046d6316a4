"""Benchmark decontamination: n-gram overlap between a training corpus
and a (small) probe/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix-C-style 13-gram
collision checks, public literature): a training document is flagged
when it shares at least ``threshold`` of a probe document's word
n-grams. Nothing in the reference covers this; it belongs to the
north-star "LLM-data-pipeline operators" mandate next to dedup
(operators/dedup.py), which it deliberately mirrors in shape.

Scale design (the part that matters at 100 TB):

* The probe side is a benchmark suite — thousands of documents, a few
  million distinct n-grams at most. It is therefore **broadcast**: the
  train corpus is scanned once, map-side hash-joined against the probe
  n-gram table, and only colliding (train_id, probe_id) pairs enter the
  one aggregation shuffle. No shuffle of the 100 TB side ever happens.
* Collisions are counted per (train_id, probe_id) — the aggregate is
  partial (map-side combine), so a boilerplate n-gram shared by many
  train docs fans out into *distinct* train-doc keys rather than one
  hot reducer key.
* ``max_probe_df`` drops n-grams that appear in more than that many
  probe docs ("stop-shingles": common phrases that would otherwise
  dominate the collision count without indicating contamination) —
  computed on the tiny probe side before the broadcast.

All expression-level (no UDFs); mirrored term-for-term by a DuckDB
oracle in the contract.

Perf history (all exact-equal outputs at the sf0.1×10 / 50k-doc
probe). Rounds 4–6 sat at 1.8–2.1× DuckDB; profiling in round 7 found
the real cost was NOT the explode row machinery but the shingle
EXPRESSION: referenced inline under the explode, ``split(trim(text))``
appears ~7× in the tree, and higher-order functions force the whole
thing into interpreted eval with no common-subexpression elimination —
the corpus was being re-tokenized ~7× per row (plus 2 more times by
the ``size>0`` filter ``InferFiltersFromGenerate`` clones onto inner
explodes). Fixes, in order of measured effect: (1) project the token /
token-hash array into its own column first (see :func:`_base_array`) —
7.9 s → 3.3 s; (2) hash key path — windows hashed from the token-hash
array, no n-gram strings — 5.1 s → 2.6 s full query; (3) optional
Bloom prefilter of each doc's key array before the explode (see
:func:`probe_bloom`) — wins on the string path (5.1 → 3.9 s), a wash
on the hash path. End state: 2.6 s vs DuckDB 4.0 s at the probe
(0.65×), with the 100 TB contract (broadcast probe side, no big-side
shuffle) intact. Earlier measured-and-rejected variants (skip per-row
``array_distinct``: 22% slower; 5-token struct join keys: 6% faster;
pairwise-doubling shingle build: 1.9× slower) predate the tokstep fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX

__all__ = [
    "probe_ngrams",
    "probe_bloom",
    "keys_from_base",
    "contamination_pairs",
    "contaminated_docs",
    "shingle_keys",
]


def probe_bloom(
    pr: DataFrame,
    bits_per_key: int = 64,
    min_bits: int = 1 << 16,
    max_bits: int = 1 << 27,
):
    """Single-probe Bloom bitset of the probe n-gram set, as a Spark
    ``array<long>`` LITERAL plus its (power-of-two) bit count.

    Why: the train-side cost of the collision check is the explode —
    at sf0.1 ~97% of exploded shingle rows match nothing and exist
    only to be discarded by the broadcast hash join. Testing each
    shingle against this bitset INSIDE the array (``F.filter`` before
    ``F.explode``) drops the explode volume to true matches plus the
    false-positive dribble (~1/64 at 64 bits/key, one probe), while
    the join re-verifies every survivor, so results are EXACT — the
    filter is invisible to the oracle.

    Driver contract: the probe side is a benchmark suite (small by
    the module contract — it is broadcast anyway); collecting its
    hashed bucket ids is the same order of driver traffic as the
    broadcast itself, and the bitset is capped at ``max_bits``
    (2^27 b = 16 MB) no matter how large the suite grows. Bit test is
    pure codegen arithmetic: ``xxhash64 & (m-1)``, word lookup via
    ``F.get``, mask via shiftleft — no UDF, no extra shuffle.
    """
    n = pr.count()
    m = 1 << max(
        min_bits.bit_length() - 1,
        min(max_bits.bit_length() - 1, (bits_per_key * max(n, 1) - 1).bit_length()),
    )
    buckets = (
        pr.select(F.xxhash64("ngram").bitwiseAND(F.lit(m - 1)).alias("b"))
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in buckets:
        b = r.b
        words[b >> 6] |= 1 << (b & 63)
    # Spark longs are signed two's-complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return F.lit(words), m


def _bloom_test(blit, m: int, key):
    """Membership test of one shingle against a :func:`probe_bloom`
    bitset — usable inside an ``F.filter`` array lambda."""
    idx = F.xxhash64(key).bitwiseAND(F.lit(m - 1))
    word = F.get(blit, F.shiftright(idx, 6).cast("int"))
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), idx.bitwiseAND(F.lit(63)).cast("int")
    )
    return word.bitwiseAND(mask) != 0


def _base_array(text_col, key_path: str):
    """The one-pass-per-doc array the shingle keys derive from:
    the token array (string path) or the per-token xxhash64 array
    (hash path). Projected into its OWN column by the callers — the
    single most important perf fact in this module: a shingle
    expression that references ``split(text)`` inline duplicates the
    regex tokenization ~7× per row (interpreted higher-order eval has
    no common-subexpression elimination), and CollapseProject
    deliberately refuses to inline a non-cheap multi-referenced
    projection, so materializing this array first cuts the measured
    train-side cost ~2.4× (7.9 s → 3.3 s at the sf0.1×10 probe)."""
    toks = TX.tokens(F.col(text_col))
    if key_path == "string":
        return toks
    return F.transform(toks, lambda t: F.xxhash64(t))


def keys_from_base(arr, n: int, key_path: str = "string"):
    """Distinct shingle join keys from a :func:`_base_array` COLUMN
    (cheap attribute reference — safe to mention many times).
    String path: concatenated n-gram strings. Hash path: xxhash64 of
    each n-token-hash window; no n-gram string is ever built. Short
    docs (< n tokens) fall back to one whole-doc key either way."""
    if key_path == "string":
        return F.array_distinct(TX.shingles(arr, n))
    shifted = [arr] + [
        F.slice(arr, i + 1, F.greatest(F.size(arr) - i, F.lit(0)))
        for i in range(1, n)
    ]
    z = F.arrays_zip(*[c.alias(str(i)) for i, c in enumerate(shifted)])
    cnt = F.size(arr) - F.lit(n - 1)
    full = F.transform(
        F.slice(z, 1, F.greatest(cnt, F.lit(1))),
        lambda s: F.xxhash64(*[s[str(i)] for i in range(n)]),
    )
    keys = F.when(cnt >= 1, full).otherwise(F.array(F.xxhash64(arr)))
    return F.array_distinct(keys)


def shingle_keys(text_col, n: int, key_path: str = "string"):
    """Distinct shingle join keys for a document's text, as ONE
    self-contained expression — convenience form of
    ``keys_from_base(_base_array(...))``.

    ``"string"`` — the n-gram strings themselves. ``"hash"`` — xxhash64
    each TOKEN once, then hash the n zipped token-hash columns per
    window (``xxhash64(h_i, …, h_{i+n-1})``); no n-gram string is ever
    built. Same pairs modulo xxhash64 collisions (~|ngrams|²/2⁶⁴ —
    negligible; path parity is pytest-asserted), same engine-private-
    hash tradeoff as dedup's ``tid_path='hash'``.

    PERF WARNING: inlined under an explode/filter this form re-derives
    the token array at every reference (see :func:`_base_array`). Hot
    paths should project ``_base_array`` first and build keys with
    :func:`keys_from_base` — exactly what :func:`probe_ngrams` and
    :func:`contamination_pairs` do internally.
    """
    return keys_from_base(_base_array(text_col, key_path), n, key_path)


def probe_ngrams(
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_probe_df: int | None = None,
    key_path: str = "string",
) -> DataFrame:
    """Distinct word n-grams per probe doc → ``(probe_id, ngram)`` rows,
    with stop-shingles (probe document frequency > ``max_probe_df``)
    removed. Small by construction; the caller broadcasts it."""
    ex = probes.select(
        F.col(id_col).alias("probe_id"),
        _base_array(text_col, key_path).alias("__arr"),
    ).select(
        "probe_id",
        F.explode(keys_from_base(F.col("__arr"), n, key_path)).alias("ngram"),
    )
    if max_probe_df is not None:
        keep = (
            ex.groupBy("ngram")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_probe_df)
            .select("ngram")
        )
        ex = ex.join(keep, "ngram").select("probe_id", "ngram")
    return ex


def contamination_pairs(
    train: DataFrame,
    probes: DataFrame,
    n: int = 5,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_probe_df: int | None = None,
    key_path: str = "string",
    bloom: bool | None = None,
) -> DataFrame:
    """(train_id, probe_id, n_common, containment) for every pair whose
    n-gram containment — shared distinct n-grams over the probe's
    distinct n-gram count — reaches ``threshold``.

    Containment (not Jaccard) is the right asymmetry here: a 100-page
    training doc that embeds a whole benchmark question must flag even
    though its own n-gram set is huge.

    ``key_path="hash"`` joins on token-hash window keys instead of
    n-gram strings (see :func:`keys_from_base`) — the production
    setting AND what the oracle-checked contract entry runs: the
    output columns are pair counts, not n-grams, so hash and string
    paths agree exactly modulo xxhash64 window collisions
    (~|ngrams|²/2⁶⁴, negligible; path parity is pytest-asserted and
    the entry is hash-vs-SQL green at sf0.01).

    ``bloom`` prefilters each train doc's shingle array against a
    Bloom bitset of the probe n-gram set BEFORE the explode (see
    :func:`probe_bloom`): the broadcast join re-verifies every
    survivor, so the output is bit-identical with the filter on or
    off. Measured at the sf0.1×10 probe: string path 5.1 s → 3.9 s
    with bloom (worth it), hash path 2.6 s → 2.7 s (the join probe is
    already cheaper than the bit test) — hence the default is on only
    for the string path.
    """
    if bloom is None:
        bloom = key_path == "string"
    pr = probe_ngrams(probes, n=n, id_col=id_col, text_col=text_col,
                      max_probe_df=max_probe_df, key_path=key_path)
    if bloom:
        pr = pr.persist()
    # denominator BEFORE stop-shingle removal would undercount; after is
    # correct — containment over the n-grams that can actually collide
    denom = pr.groupBy("probe_id").agg(F.count("*").alias("n_probe_ngrams"))
    base = train.select(
        F.col(id_col).alias("train_id"),
        _base_array(text_col, key_path).alias("__arr"),
    )
    keys = keys_from_base(F.col("__arr"), n, key_path)
    if bloom:
        blit, m = probe_bloom(pr)
        keys = F.filter(keys, lambda k: _bloom_test(blit, m, k))
    tr = base.select("train_id", F.explode(keys).alias("ngram"))
    hits = (
        tr.join(F.broadcast(pr), "ngram")
        .groupBy("train_id", "probe_id")
        .agg(F.count("*").alias("n_common"))
    )
    out = hits.join(F.broadcast(denom), "probe_id").select(
        "train_id",
        "probe_id",
        "n_common",
        F.round(
            F.col("n_common") / F.col("n_probe_ngrams").cast("double"), 6
        ).alias("containment"),
    )
    return out.filter(F.col("containment") >= threshold)


def contaminated_docs(
    train: DataFrame,
    probes: DataFrame,
    n: int = 5,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_probe_df: int | None = None,
    key_path: str = "string",
    bloom: bool | None = None,
) -> DataFrame:
    """Distinct train doc ids to drop: any probe pushed them over the
    containment threshold. The drop step is then an anti-join
    (``train.join(flagged, id, "left_anti")``) — one broadcast."""
    pairs = contamination_pairs(
        train, probes, n=n, threshold=threshold,
        id_col=id_col, text_col=text_col, max_probe_df=max_probe_df,
        key_path=key_path, bloom=bloom,
    )
    return pairs.select(F.col("train_id").alias(id_col)).distinct()
