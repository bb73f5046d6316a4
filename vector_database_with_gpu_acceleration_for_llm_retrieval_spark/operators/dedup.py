"""Deduplication operators for training-data pipelines.

The reference has no dedup (append-only inserts, SURVEY.md §1.4); these
are the north-star extensions (SURVEY.md §2.3 X2/X3) built for 100 TB:

* exact dedup — hash-groupBy, one shuffle of (hash, id), never the
  payload;
* MinHash + LSH banding — shingle → minhash signature → band buckets →
  candidate pair join → exact-Jaccard verify; only bucket-colliding
  pairs are ever joined, so cost tracks collisions, not N²;
* SimHash — 64-bit signed-bit-aggregate signature, Hamming-ball
  candidates;
* n-gram Jaccard — exact set similarity on shingles for verification
  and small corpora;
* embedding cosine near-dup — threshold self-join, LSH-prefiltered at
  scale.

Two shingle-id paths: ``shingle_tids_hash`` (xxhash64 — production, no
global state) and ``shingle_tids_vocab`` (dense vocabulary ids via a
rank join — engine-independent arithmetic, used by the DuckDB-checked
queries; same MinHash math either way).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import vector as V
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import fan_out

__all__ = [
    "exact_dedup",
    "minhash_perms",
    "shingle_tids_hash",
    "shingle_tids_vocab",
    "minhash_signature",
    "lsh_candidate_pairs",
    "lsh_over_cap_buckets",
    "jaccard_pairs",
    "near_dup_pairs",
    "portable_token_hash",
    "simhash",
    "simhash_candidate_pairs",
    "embedding_near_dup_pairs",
    "dedup_clusters",
    "dup_span_stats",
    "remove_dup_spans",
    "normalized_dedup",
    "near_dup_against_corpus",
    "fuzzy_pairs",
    "prefix_jaccard_pairs",
    "containment_pairs",
    "sorted_neighborhood_pairs",
]

#: Mersenne-ish prime > 2^32 for the universal-hash family
#: h_i(x) = (a_i·x + b_i) mod P — classic MinHash construction
#: (Broder 1997). Fits int64 products for token ids < 2^30.
MINHASH_PRIME = 4_294_967_311


def _dedup_key(cols: list[str]) -> Column:
    """Collision-free row key over ``cols``: each column is encoded as
    ``<len>#<payload>`` with an explicit null sentinel, so (x, NULL) vs
    (NULL, x) and separator-embedding values stay distinct (plain
    ``concat_ws`` silently skips NULLs and can't distinguish them)."""
    parts = []
    for c in cols:
        s = F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n"))
        parts.append(F.concat(F.length(s).cast("string"), F.lit("#"), s))
    return F.sha2(F.concat(*parts), 256)


def exact_dedup(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per distinct value of ``cols`` (X2).

    Shape: rank within ``sha2`` groups, keep rank 1. At scale the
    window shuffles (hash, id) pairs only after column pruning; for
    wide payloads, dedup on the hash then semi-join back.
    """
    key = _dedup_key(cols)
    w = Window.partitionBy(key).orderBy(F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_perms(n_hashes: int, seed: int = 11) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the hash family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_PRIME, size=n_hashes)
    b = rng.integers(0, MINHASH_PRIME, size=n_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def shingle_tids_hash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, tids: array<long>) with shingle ids from xxhash64 — the
    production path: stateless, no global vocabulary, scales linearly.
    Ids are folded into [0, 2^30) so the universal-hash products stay
    in int64."""
    # project the token array FIRST: shingles() references its token
    # argument ~7×, and inlined tokens(text) would re-run the regex
    # split per reference (interpreted HOF eval has no CSE; measured
    # 2.4× on the contamination twin of this shape). CollapseProject
    # keeps the two selects separate because __toks is non-cheap and
    # multi-referenced.
    sh = TX.shingles(F.col("__toks"), n=n)
    tids = F.array_distinct(
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 30)))
    )
    # shingling + hashing is per-row CPU-bound: spread an under-split
    # source across cores (no-op on a properly row-grouped table)
    return (
        fan_out(docs)
        .select(F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), tids.alias("tids"))
    )


def shingle_tids_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    vocab_docs: DataFrame | None = None,
) -> DataFrame:
    """(id, tids) with *dense vocabulary* shingle ids: rank of the
    shingle in the sorted global shingle vocabulary. One extra
    aggregate + broadcast join vs the hash path, but the arithmetic is
    reproducible in any engine (the DuckDB oracle mirrors it 1:1).

    .. warning:: Oracle/test path ONLY. The vocabulary is built with a
       single-partition ``row_number`` window and broadcast whole — both
       die once distinct shingles outgrow one executor (~10⁷). At scale
       use :func:`shingle_tids_hash`, which is stateless and identical
       for dedup purposes (MinHash only needs distinct, stable ids).
    """
    sh = fan_out(docs).select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(TX.shingles(F.col("__toks"), n=n))).alias("shingle"),
    )
    # vocab over vocab_docs when given — lets two frames share ONE id
    # space (cross-frame dedup needs comparable tids)
    vsrc = sh if vocab_docs is None else fan_out(vocab_docs).select(
        TX.tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.explode(
            F.array_distinct(TX.shingles(F.col("__toks"), n=n))
        ).alias("shingle")
    )
    vocab = (
        vsrc.select("shingle")
        .distinct()
        .withColumn("tid", F.row_number().over(Window.orderBy("shingle")))
    )
    return (
        sh.join(F.broadcast(vocab), "shingle")
        .groupBy(id_col)
        .agg(F.collect_set("tid").alias("tids"))
    )


def _perm_hash(a: int, b: int):
    """Unary lambda factory for one universal-hash permutation.

    (A plain ``lambda t, a=a, b=b`` would make PySpark see a 3-parameter
    lambda and demand a ternary higher-order function —
    INVALID_LAMBDA_FUNCTION_CALL.NUM_ARGS_MISMATCH.)"""
    return lambda t: F.pmod(F.lit(a) * t.cast("long") + F.lit(b), F.lit(MINHASH_PRIME))


def minhash_signature(tids_df: DataFrame, perms: list[tuple[int, int]], id_col: str = "doc_id") -> DataFrame:
    """MinHash signature: sig[i] = min over shingle ids x of
    (aᵢ·x + bᵢ) mod P. Pure higher-order-function expression — one
    narrow projection, no shuffle, no UDF."""
    sig = F.array(
        *[F.array_min(F.transform(F.col("tids"), _perm_hash(a, b))) for a, b in perms]
    )
    return tids_df.select(F.col(id_col), F.col("tids"), sig.alias("sig"))


def _band_buckets(
    sig_df: DataFrame, n_bands: int, n_hashes: int, id_col: str
) -> DataFrame:
    """(id, band, key) bucket membership rows for LSH banding."""
    if n_hashes % n_bands != 0:
        raise ValueError(f"n_hashes={n_hashes} must be divisible by n_bands={n_bands}")
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws("-", *[
                    F.element_at(F.col("sig"), j * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ]).alias("key"),
            )
            for j in range(n_bands)
        ]
    )
    return sig_df.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    n_bands: int,
    n_hashes: int,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``n_bands`` bands, bucket
    by (band index, band values); docs sharing any bucket become a
    candidate pair (a < b).

    This is the scale move: the only join is an equi-join on band
    buckets, so work is proportional to true collisions. Hot buckets
    (boilerplate docs) are the skew risk — AQE skew-join handles
    moderate cases; ``max_bucket_size`` caps the extreme ones: buckets
    with more than that many members are dropped from pair generation
    BEFORE the self-join (a bucket of B members yields B·(B−1)/2 pairs,
    so one million-doc boilerplate bucket is ~5·10¹¹ pairs — the cap
    turns that into zero). Docs in an over-cap bucket still pair through
    their other, sub-cap bands; the drop is auditable via
    :func:`lsh_over_cap_buckets` (same inputs), which a pipeline should
    count/log alongside its run. Default ``None`` = no cap (exhaustive,
    oracle-mirrorable).

    ``n_hashes`` is passed explicitly (len of the perms list) instead of
    probed with an action, so empty inputs are fine and no job runs at
    plan-build time. It must divide evenly into ``n_bands`` — trailing
    signature entries would otherwise be silently dropped from banding.
    """
    buckets = _band_buckets(sig_df, n_bands, n_hashes, id_col)
    if max_bucket_size is not None:
        # membership count per bucket, then anti-join the over-cap ones
        # out. Both sides shuffle on (band, key) — the same exchange the
        # self-join needs, so AQE/exchange-reuse keeps the extra cost to
        # the small aggregate, and the quadratic hot-bucket blowup never
        # materializes.
        over = (
            buckets.groupBy("band", "key")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("band", "key")
        )
        buckets = buckets.join(over, ["band", "key"], "left_anti")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_over_cap_buckets(
    sig_df: DataFrame,
    n_bands: int,
    n_hashes: int,
    max_bucket_size: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audit frame for the ``max_bucket_size`` cap: the (band, key,
    size) buckets that :func:`lsh_candidate_pairs` would drop. Count or
    sink this next to a capped dedup run so dropped collisions are
    logged, not silent."""
    return (
        _band_buckets(sig_df, n_bands, n_hashes, id_col)
        .groupBy("band", "key")
        .agg(F.count("*").alias("size"))
        .filter(F.col("size") > max_bucket_size)
    )


def jaccard_pairs(
    tids_df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact set Jaccard on shingle-id sets.

    With ``pairs`` given (LSH candidates), verifies just those pairs via
    two broadcast-able joins. Without, generates all colliding pairs
    through an explode-join on shared shingles — |intersection| counted
    by groupBy, union by inclusion-exclusion; never a full cross join.
    """
    if pairs is not None:
        t = tids_df.select(F.col(id_col), F.col("tids"))
        out = (
            pairs.join(t.withColumnRenamed(id_col, "id_a").withColumnRenamed("tids", "tids_a"), "id_a")
            .join(t.withColumnRenamed(id_col, "id_b").withColumnRenamed("tids", "tids_b"), "id_b")
        )
        inter = F.size(F.array_intersect("tids_a", "tids_b"))
        union = F.size("tids_a") + F.size("tids_b") - inter
        return out.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    ex = tids_df.select(F.col(id_col), F.size("tids").alias("n"), F.explode("tids").alias("tid"))
    a, b = ex.alias("a"), ex.alias("b")
    joined = a.join(b, "tid").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    agg = joined.groupBy(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    ).agg(F.count("*").alias("inter"))
    return agg.select(
        "id_a",
        "id_b",
        (
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    )


#: recently persisted signature frames — the result is lazy, so the
#: cache cannot be released inside near_dup_pairs itself; instead each
#: call either REUSES a live generation (sameResult logical plan →
#: same data; repeated runs over one corpus stay warm) or evicts the
#: oldest and caches the new one. Capacity THREE, not one: callers
#: alternate in practice (the raw-corpus near-dup, the curation
#: composite's filtered near-dup, and DSIR's token-hash frame all
#: interleave in any bench/pipeline loop), and fewer slots make every
#: alternation a full recompute (measured as 10-40 s first-rep spikes
#: at sf0.1 with one slot; the same thrash returned when DSIR joined a
#: two-slot cache). Executor cache stays bounded at three frames no
#: matter how many times the operators run.
_SIG_GENERATIONS: list[DataFrame] = []
_SIG_CACHE_CAP = 3


def clear_signature_cache() -> None:
    """Unpersist and forget every cached signature generation.

    Exists for HONEST BENCHMARKING (r13 verdict "what's wrong" #2): the
    LRU keeps a signature frame warm across repeated invocations over
    the same corpus, so a timed rep after a warm-up rep would skip the
    shingle→hash→min-fold subtree — the most expensive part — while a
    competing engine recomputes it every rep. bench.py calls this
    before every timed rep so each measurement pays the full plan; the
    within-plan branch reuse (the legitimate §5 persist) still applies
    inside each rep. Production pipelines should NOT call this — the
    cross-call reuse is the point of the cache there."""
    while _SIG_GENERATIONS:
        try:
            _SIG_GENERATIONS.pop().unpersist(False)
        except Exception:  # pragma: no cover - session already gone
            pass


def _persist_signature(sig: DataFrame) -> DataFrame:
    new_plan = sig._jdf.queryExecution().analyzed()
    for i, prev in enumerate(_SIG_GENERATIONS):
        try:
            if prev._jdf.queryExecution().analyzed().sameResult(new_plan):
                # LRU: move the hit to the front
                _SIG_GENERATIONS.insert(0, _SIG_GENERATIONS.pop(i))
                return prev
        except Exception:  # pragma: no cover - prev's session gone
            pass
    while len(_SIG_GENERATIONS) >= _SIG_CACHE_CAP:
        try:
            _SIG_GENERATIONS.pop().unpersist(False)
        except Exception:  # pragma: no cover - session already gone
            pass
    _SIG_GENERATIONS.insert(0, sig.persist())
    return sig


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    tid_path: str = "hash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline (X3): shingle → signature →
    band buckets → candidate pairs → exact-Jaccard verify ≥ threshold.
    False negatives are bounded by the (bands, rows) S-curve; verified
    pairs have *exact* Jaccard, so no false positives.
    ``max_bucket_size`` (optional) caps pathological LSH buckets — see
    :func:`lsh_candidate_pairs`."""
    tids_fn = shingle_tids_hash if tid_path == "hash" else shingle_tids_vocab
    tids = tids_fn(docs, id_col=id_col, text_col=text_col, n=shingle_n)
    # the signature frame feeds FOUR plan branches (both sides of the
    # bucket self-join + both sides of the Jaccard verify join); without
    # persist the shingle→hash→min-fold subtree — the expensive part —
    # is recomputed per branch. At 100 TB the same move is writing the
    # signature table to parquet once and joining against that.
    sig = _persist_signature(minhash_signature(tids, minhash_perms(n_hashes), id_col=id_col))
    cand = lsh_candidate_pairs(
        sig,
        n_bands=n_bands,
        n_hashes=n_hashes,
        id_col=id_col,
        max_bucket_size=max_bucket_size,
    )
    verified = jaccard_pairs(sig.select(id_col, "tids"), pairs=cand, id_col=id_col)
    return verified.filter(F.col("jaccard") >= threshold)


# canonical definition lives in functions.text; re-exported here because
# dedup is where cross-engine hashing is most often needed.
portable_token_hash = TX.portable_token_hash


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 48) -> DataFrame:
    """SimHash fingerprint: per token, take ``bits`` low bits of the
    portable token hash; signature bit j is set iff Σ_tokens (±1) ≥ 0.
    Entirely expression-level: aggregate over the token array with an
    int-array accumulator (no explode — token lists never leave the
    row). Bit shifts are unrolled over *Python* ints (``bits`` ≤ 60 is
    a literal; Spark's shift functions don't take Column shift
    amounts)."""
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60] (portable hash is 60 bits)")
    hashes = F.transform(TX.tokens(F.col(text_col)), portable_token_hash)
    zero = F.array(*[F.lit(0)] * bits).cast("array<long>")
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                    for j in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    fingerprint = F.aggregate(
        F.zip_with(
            counts,
            weights,
            lambda c, w: F.when(c >= 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # per-row cost is tokens × bits md5+branch work — fan out under-split
    # sources (no-op when the scan already parallelizes)
    return fan_out(docs).select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_candidate_pairs(
    sim_df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    bits: int = 48,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup candidates by SimHash Hamming distance ≤ ``max_hamming``.

    Pairs are generated by banding the fingerprint into ``n_blocks``
    equal blocks (pigeonhole: Hamming ≤ n_blocks-1 ⇒ at least one block
    equal), joining on block equality, then filtering by exact popcount
    — the same collide-then-verify shape as MinHash-LSH, never N².
    """
    if bits % n_blocks != 0:
        raise ValueError(f"bits={bits} must be divisible by n_blocks={n_blocks}")
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), j * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for j in range(n_blocks)
        ]
    )
    ex = sim_df.select(F.col(id_col), F.col("simhash"), F.explode(blocks).alias("b")).select(
        id_col, "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key")
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ τ).

    Default is the exact self-join (range-partitioned by Spark; fine to
    ~1e5 rows). With ``lsh_planes`` the join is restricted to equal LSH
    buckets first — the scale path: bucket at ingest, partition by
    bucket, and the candidate join becomes bucket-local.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if lsh_planes is not None:
        from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.search import lsh_bucket

        a = a.withColumn("bucket", lsh_bucket("va", lsh_planes))
        b = b.withColumn("bucket", lsh_bucket("vb", lsh_planes))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = V.cosine_sim(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def dedup_clusters(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Collapse near-dup pairs into clusters: label propagation to the
    minimum reachable id (connected components), iterated to a fixed
    point (≤ ``max_iter`` rounds; each round is one shuffle —
    alternating-algorithm CC à la Kiveris et al. for the full-scale
    variant).

    Input: (id_a, id_b) edges. Output: (doc_id, canonical_id); rows
    whose ``doc_id != canonical_id`` are the drop set.

    Each round does BOTH propagation steps: (1) an EDGE step — every
    node takes the min label among itself and its neighbors (the
    classic hook that guarantees the fixpoint is the true component
    minimum) — and (2) a pointer-doubling step — every node also takes
    its canonical's canonical, halving chain lengths so convergence is
    O(log diameter) rounds instead of O(diameter). The edge step is
    load-bearing for correctness, not just speed: pointer-jumping
    alone stalls on a "local minimum" node (smaller than all its
    neighbors but not the component min — its pointer is a self-loop
    and no information ever reaches it; a path graph ``1—10—2`` leaves
    node 2 unmerged forever). The original pointer-only form passed
    the near-dup oracle because near-dup pair sets are clique-like; a
    general graph (co-purchase components) exposed the stall — both
    topologies are regression-tested against a recursive-closure
    oracle now.

    If the loop exits without reaching the fixed point a warning is
    emitted (results would under-merge silently otherwise).
    """
    import warnings

    edges = pairs.select("id_a", "id_b")
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    labels = sym.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.least(F.min("id_b"), F.first("id_a")).alias("canonical_id")
    )
    for _ in range(max_iter):
        # edge step: min label over self ∪ neighbors
        nbr = (
            sym.join(labels, sym["id_b"] == labels["doc_id"])
            .select(F.col("id_a").alias("doc_id"), F.col("canonical_id"))
        )
        hooked = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("canonical_id").alias("canonical_id"))
        )
        # pointer-doubling step: follow my canonical's canonical
        relabeled = (
            hooked.alias("l")
            .join(
                hooked.select(
                    F.col("doc_id").alias("canonical_id"),
                    F.col("canonical_id").alias("parent"),
                ).alias("p"),
                "canonical_id",
                "left",
            )
            .select(
                "doc_id",
                F.least("canonical_id", F.coalesce("parent", "canonical_id")).alias(
                    "canonical_id"
                ),
            )
        )
        relabeled = relabeled.localCheckpoint(eager=True)
        changed = (
            relabeled.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.canonical_id") != F.col("o.canonical_id"))
            .limit(1)
            .count()
        )
        labels = relabeled
        if changed == 0:
            break
    else:
        warnings.warn(
            f"dedup_clusters exhausted max_iter={max_iter} before convergence; "
            "canonical ids may be under-merged — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    sym.unpersist()
    return labels


def dup_span_stats(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_portable_hash: bool = False,
) -> DataFrame:
    """Cross-document duplicated-span signal — the substring-level
    dedup statistic (Lee et al. 2021, *Deduplicating Training Data
    Makes Language Models Better*) approximated at word n-gram
    granularity: for each doc, the fraction of its n-gram occurrences
    whose n-gram also appears in at least one OTHER document.

    Complements the family: exact_dedup catches identical docs,
    MinHash/SimHash catch near-identical docs, :func:`dup_span_stats`
    catches *partial* overlap — a unique page wrapping a boilerplate
    block scores high here and nowhere else. Gate on
    ``dup_span_frac > τ`` (or route to span-removal downstream).

    Returns ``(id, n_spans, n_shared_spans, dup_span_frac)``.

    Plan shape (scale-safe, never all-pairs):

    1. explode n-grams, hash each to a long (`xxhash64` in production;
       the md5-derived portable hash when an external engine must
       mirror the arithmetic) — payload strings leave the plan at the
       first exchange;
    2. ``groupBy(id, h).count()`` — per-doc occurrence counts, with
       map-side partial aggregation shrinking boilerplate-heavy
       partitions before the shuffle;
    3. ``groupBy(h)`` over that (already one row per doc×hash) counts
       distinct docs per n-gram as a plain ``count(*)`` — no
       count_distinct state;
    4. LEFT-join occurrences against the ``doc_freq ≥ 2`` hashes and
       aggregate by doc ONCE — totals and shared sums in the same
       pass (r14). Popular boilerplate n-grams skew the join key; AQE
       skew-join splits them (the join is 1:N, not N:M, so splitting
       is safe).

    Every stage is an equi-key aggregation or join — at 100 TB the
    cost is two shuffles of (doc, hash) pairs, linear in corpus
    n-grams.
    """
    hash_fn = (
        TX.portable_token_hash
        if use_portable_hash
        else (lambda c: F.xxhash64(c))
    )
    sh = fan_out(docs).select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(TX.shingles(F.col("__toks"), n=n)).alias("s"),
    )
    occ = _persist_signature(
        sh.select(id_col, hash_fn(F.col("s")).alias("h"))
        .groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    shared = occ.groupBy("h").agg(F.count(F.lit(1)).alias("doc_freq")).filter(
        F.col("doc_freq") >= 2
    )
    # r14 optimization (§2.4 same-key fusion): totals and shared counts
    # come out of ONE pass over occ — a LEFT join against the shared
    # hashes tags each (doc, gram) row, and a single per-doc aggregate
    # computes both sums (Σ cnt ≡ size(shingles): every doc has ≥1
    # shingle, so no doc disappears). The old shape aggregated occ by
    # doc twice (totals + per-doc-shared) and SortMergeJoined the two
    # k-row results; same values, one fewer Exchange(id), one fewer
    # join. The join stays the skew-safe form (AQE splits hot
    # boilerplate hashes; a window over h would put a universal n-gram's
    # every (doc, cnt) row into one task at 100 TB). The corpus text is
    # scanned and exploded exactly once; the persisted occ frame feeds
    # both consumers.
    tagged = occ.join(
        shared.select("h", F.lit(1).alias("__dup")), "h", "left"
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_spans"),
            F.coalesce(
                F.sum(F.when(F.col("__dup") == 1, F.col("cnt"))), F.lit(0)
            ).alias("n_shared_spans"),
        )
        .withColumn(
            "dup_span_frac",
            F.col("n_shared_spans") / F.col("n_spans").cast("double"),
        )
    )


def remove_dup_spans(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-REMOVAL dedup — the rewriting action behind
    :func:`dup_span_stats` (Lee et al. 2021 substring dedup, word
    n-gram granularity): duplicated spans are dropped from the text,
    keeping the FIRST occurrence corpus-wide.

    Semantics (deterministic, engine-mirrorable): an n-gram occurrence
    ``(doc, pos)`` is *kept-as-first* iff it is the global minimum
    ``(doc_id, pos)`` among all occurrences of that n-gram. A token
    survives iff SOME kept-as-first span covers it — i.e. it
    participates in at least one piece of corpus-unique (or
    first-copy) context. Interior tokens of a copied block lose every
    covering span to the earlier copy and are removed; tokens within
    ``n−1`` of adjacent unique text survive through an overlapping
    first-occurrence span (span-boundary resolution is ±(n−1) tokens,
    the n-gram approximation of Lee et al.'s exact suffix-array
    spans). A fully-duplicated doc rewrites to the empty string; docs
    shorter than ``n`` tokens ride the whole-doc shingle
    (``TX.shingles`` emits one), so a unique short doc is untouched
    and a copied one is emptied.

    Returns ``(id, n_tokens, n_kept, text_clean)``.

    Plan shape (scale-safe, never all-pairs — the same skeleton as
    :func:`dup_span_stats` plus a per-row rebuild):

    1. one corpus scan → posexplode n-grams, hash to longs (payload
       strings leave the plan at the first exchange);
    2. ``groupBy(h) → min(struct(doc, pos))`` — partial-agged argmin,
       one shuffle of (hash, doc, pos) triples; the argmin struct IS
       the kept occurrence (r14: the former join-back of occurrences
       to their gram's argmin re-derived a row the aggregate already
       held, at the price of a second corpus-grams shuffle);
    3. ``groupBy(doc) → sorted kept-start positions`` over the
       distinct-gram argmin rows — one shuffle of int pairs — then a
       join back to the doc row, where
       coverage union, token selection, and reassembly are pure array
       expressions (interval expansion is O(n·|keeps|) ints/row).

    The token array is scanned and exploded exactly ONCE (the base
    frame is persisted for its two consumers, the LRU signature cache
    discipline of the MinHash path).
    """
    base = _persist_signature(
        fan_out(docs).select(
            F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
        )
    )
    sh = base.select(
        F.col(id_col),
        F.posexplode(TX.shingles(F.col("__toks"), n=n)).alias("__p0", "__s"),
    )
    occ = sh.select(
        F.col(id_col),
        (F.col("__p0") + 1).alias("pos"),
        F.xxhash64("__s").alias("h"),
    )
    # r14 optimization (§2.4/§3): the argmin row IS the kept occurrence
    # — ``min(struct(d, p))`` already carries the surviving (doc, pos),
    # so the old occ ⋈ firsts equi-join + equality filter (a second
    # corpus-grams shuffle of occ by h, then the join) reconstructed a
    # row the aggregate had in hand. Exactly one occ row matches each
    # gram's argmin (pos is unique within a doc), so regrouping the
    # argmin structs by doc is the identical multiset of kept
    # positions. Plan: one Exchange(h) + one Exchange(d) over
    # distinct-gram rows; the join and occ's second shuffle are gone.
    keeps = (
        occ.groupBy("h")
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("f")
        )
        .groupBy(F.col("f.d").alias(id_col))
        .agg(F.sort_array(F.collect_list("f.p")).alias("__keeps"))
    )
    joined = base.join(keeps, id_col, "left")
    m = F.size("__toks")
    starts = F.coalesce(F.col("__keeps"), F.array().cast("array<int>"))
    # union of covered intervals [p, min(p+n-1, m)]; clipping matters
    # only for the whole-doc shingle of short docs (p + n − 1 > m)
    kept = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(starts, lambda p: F.sequence(p, F.least(p + n - 1, m)))
            )
        )
    )
    stage = joined.select(
        F.col(id_col), F.col("__toks"), m.cast("long").alias("n_tokens"),
        kept.alias("__kept"),
    )
    toks = F.col("__toks")
    return stage.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.size("__kept").cast("long").alias("n_kept"),
        F.concat_ws(
            " ", F.transform(F.col("__kept"), lambda j: F.element_at(toks, j))
        ).alias("text_clean"),
    )


def normalized_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup AFTER text canonicalization (lowercase, punctuation
    and whitespace runs collapsed — :func:`functions.text.canonical_text`):
    catches re-encoded copies that byte-exact dedup misses (shouting,
    added punctuation, reflowed whitespace) while staying a pure
    hash-groupBy — the cheap middle ground before MinHash.

    One row per distinct canonical form: ``(id, n_copies, canon_md5)``
    with the lowest id as the keeper. Same scale shape as exact dedup —
    a single groupBy on the canonical hash; the payload never shuffles
    (only id + md5 key survive the projection).
    """
    canon = TX.canonical_text(F.col(text_col))
    keyed = docs.select(F.col(id_col), F.md5(canon).alias("canon_md5"))
    return (
        keyed.groupBy("canon_md5")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies", "canon_md5")
    )


def near_dup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    tid_path: str = "hash",
    max_bucket_size: int | None = None,
    corpus_sig: DataFrame | None = None,
    cache_new_signature: bool = True,
) -> DataFrame:
    """Incremental near-dup — match a NEW batch against an EXISTING
    corpus (the production crawl-ingest shape: every incoming shard is
    deduped against the accumulated 100 TB before it is appended).

    Pass ``corpus_sig`` (a ``minhash_signature`` frame over hash-path
    tids, e.g. the table a production ingest persists) to skip the
    corpus-side recompute entirely — ``corpus`` is then ignored; only
    the hash tid path is compatible with a precomputed signature.

    Same MinHash-LSH machinery as :func:`near_dup_pairs`, but the
    bucket join is CROSS-frame instead of a self-join: only corpus
    buckets containing a new doc's band key are ever touched, so the
    cost tracks the new batch's collisions, not the corpus size. At
    scale the corpus side is a precomputed signature table (write
    ``minhash_signature`` output at ingest; this function recomputes it
    when handed raw text). ``max_bucket_size`` caps pathological
    CORPUS buckets (the big side) before the join.

    ``tid_path='hash'`` (default) is stateless and the only choice at
    scale; ``'vocab'`` builds one SHARED vocabulary over both frames
    (tids must live in one id space for the exact-Jaccard verify) —
    oracle/test path only.

    Returns ``(new_id, corpus_id, jaccard)`` with exact Jaccard ≥
    ``threshold``. Gate with an anti-join on ``new_id`` to keep only
    novel documents.
    """
    perms = minhash_perms(n_hashes)
    if corpus_sig is not None:
        if tid_path != "hash":
            raise ValueError("corpus_sig requires tid_path='hash' (shared stateless id space)")
        tids_new = shingle_tids_hash(new_docs, id_col=id_col, text_col=text_col, n=shingle_n)
        sig_c = corpus_sig
    elif tid_path == "hash":
        tids_new = shingle_tids_hash(new_docs, id_col=id_col, text_col=text_col, n=shingle_n)
        tids_c = shingle_tids_hash(corpus, id_col=id_col, text_col=text_col, n=shingle_n)
    else:
        shared = new_docs.select(id_col, text_col).unionByName(
            corpus.select(id_col, text_col)
        )
        tids_new = shingle_tids_vocab(
            new_docs, id_col=id_col, text_col=text_col, n=shingle_n, vocab_docs=shared
        )
        tids_c = shingle_tids_vocab(
            corpus, id_col=id_col, text_col=text_col, n=shingle_n, vocab_docs=shared
        )
    # cache_new_signature=False keeps short-lived batches (e.g. one
    # streaming micro-batch per trigger) OUT of the shared 3-slot
    # signature cache — each would evict a long-lived corpus/DSIR frame
    # and thrash the cache for a signature used exactly once. The new
    # side then feeds its two plan branches by recompute, which is the
    # cheaper trade for a small batch.
    sig_new = minhash_signature(tids_new, perms, id_col=id_col)
    if cache_new_signature:
        sig_new = _persist_signature(sig_new)
    if corpus_sig is None:
        sig_c = _persist_signature(minhash_signature(tids_c, perms, id_col=id_col))
    bk_n = _band_buckets(sig_new, n_bands, n_hashes, id_col).withColumnRenamed(
        id_col, "new_id"
    )
    bk_c = _band_buckets(sig_c, n_bands, n_hashes, id_col).withColumnRenamed(
        id_col, "corpus_id"
    )
    if max_bucket_size is not None:
        over = (
            bk_c.groupBy("band", "key")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("band", "key")
        )
        bk_c = bk_c.join(over, ["band", "key"], "left_anti")
    cand = bk_n.join(bk_c, ["band", "key"]).select("new_id", "corpus_id").distinct()
    t_new = sig_new.select(F.col(id_col).alias("new_id"), F.col("tids").alias("tids_a"))
    t_c = sig_c.select(F.col(id_col).alias("corpus_id"), F.col("tids").alias("tids_b"))
    out = cand.join(t_new, "new_id").join(t_c, "corpus_id")
    inter = F.size(F.array_intersect("tids_a", "tids_b"))
    union = F.size("tids_a") + F.size("tids_b") - inter
    return out.select(
        "new_id",
        "corpus_id",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    prefix_len: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance near-duplicate pairs for SHORT strings (names,
    titles, SKUs) — the regime where shingle/MinHash similarity is
    meaningless because a one-character typo rewrites most shingles.

    Collide-then-verify like every other dedup path here: candidates
    must share a ``prefix_len``-char lowercase prefix (equi-join on the
    prefix bucket — a typo in the first characters escapes the block;
    standard blocking tradeoff, widen with a suffix or sorted-
    neighborhood pass when recall matters more), then exact
    ``levenshtein ≤ max_dist`` verifies. Pairs where the length gap
    already exceeds ``max_dist`` are pruned BEFORE the distance
    evaluates — length is the cheap lower bound on edit distance.

    Returns ``(id_a, id_b, dist)``, a < b.
    """
    key = F.lower(F.substring(F.col(col), 1, prefix_len))
    ex = df.select(F.col(id_col), F.col(col).alias("__s"), key.alias("__k"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, F.col("a.__k") == F.col("b.__k"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(
            F.abs(F.length("a.__s") - F.length("b.__s")) <= max_dist
        )
    )
    dist = F.levenshtein(F.col("a.__s"), F.col("b.__s"))
    return cand.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        dist.alias("dist"),
    ).filter(F.col("dist") <= max_dist)


def prefix_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT all-pairs set-similarity join via prefix filtering
    (Bayardo/Ma/Srikant 2007 "Scaling Up All Pairs", the ppjoin family)
    — every pair with shingle-set Jaccard ≥ ``threshold``, with a
    provable no-false-negative pruning instead of MinHash's
    probabilistic one.

    The filter: order each doc's shingle set by ascending global
    document frequency (rarest first, ties by value — one canonical
    order corpus-wide), and index only the first
    ``n − ⌈t·n⌉ + 1`` shingles. Any pair with J ≥ t must share a
    shingle inside BOTH prefixes under a common order, so the
    equi-join on prefix shingles is a guaranteed candidate superset;
    a length filter (``t·n_a ≤ n_b ∧ t·n_b ≤ n_a``, since
    J ≤ min/max) prunes further, and an exact
    ``array_intersect`` verify on the candidate pairs keeps truth.

    vs. :func:`jaccard_pairs` (no pairs arg), which joins on EVERY
    shared shingle: the prefix join touches only the ~(1−t) rarest
    fraction of each posting, and rarest-first ordering puts the join
    keys precisely where posting lists are shortest — at a 0.9
    threshold that is a ~10× candidate cut before the corpus grows.
    All equi-key work (two groupBys, the prefix self-join, two
    verify joins); never a cross product; per-doc state bounded by
    doc length. Returns ``(id_a, id_b, jaccard)``, id_a < id_b.
    """
    if not 0.0 < threshold <= 1.0:
        # t ≤ 0 makes the prefix longer than the set (slice underflow);
        # t > 1 is unsatisfiable — both are caller bugs, say so
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = docs.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__t")
    )
    sh = toks.select(
        id_col, F.array_distinct(TX.shingles(F.col("__t"), shingle_n)).alias("__sh")
    )
    ex = sh.select(id_col, F.explode("__sh").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ss")
        )
        .select(
            F.col(id_col),
            F.transform("__ss", lambda s: s["shingle"]).alias("__sorted"),
            F.size("__ss").alias("__n"),
        )
    )
    plen = (
        F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")).cast("int") + 1
    )
    pe = ordered.select(
        F.col(id_col).alias("id"),
        F.col("__n").alias("n"),
        F.explode(F.slice("__sorted", F.lit(1), plen)).alias("shingle"),
    )
    a, b = pe.alias("a"), pe.alias("b")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            (F.col("a.n") * threshold <= F.col("b.n"))
            & (F.col("b.n") * threshold <= F.col("a.n"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    full = ordered.select(F.col(id_col), F.col("__sorted"))
    v = cand.join(
        full.select(F.col(id_col).alias("id_a"), F.col("__sorted").alias("__sa")),
        "id_a",
    ).join(
        full.select(F.col(id_col).alias("id_b"), F.col("__sorted").alias("__sb")),
        "id_b",
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = inter.cast("double") / (
        F.size("__sa") + F.size("__sb") - inter
    ).cast("double")
    return (
        v.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT all-pairs set-CONTAINMENT join:
    every directed pair with ``C(A→B) = |A∩B| / |A| ≥ threshold`` over
    shingle sets — "is most of document A inside document B", the
    asymmetric question (quote/excerpt/近-superset detection) that
    Jaccard deliberately symmetrizes away: a short doc fully quoted
    inside a long one has containment 1.0 but Jaccard ≈ |A|/|B| → 0,
    invisible to :func:`prefix_jaccard_pairs` at any useful threshold.

    Prefix filter, asymmetric form (the ppjoin containment variant):
    under one corpus-wide rarest-first shingle order, if C(A→B) ≥ t
    then A∩B holds ≥ ⌈t·n_a⌉ of A's shingles, so A's first
    ``n_a − ⌈t·n_a⌉ + 1`` shingles must intersect B — A is probed by
    PREFIX only, but B must be indexed on its FULL shingle list (no
    lower bound relates n_b to n_a beyond ``n_b ≥ t·n_a``, which is
    applied as the size filter). Exact ``array_intersect`` verify
    keeps truth; the oracle mirrors with brute force, proving the
    pruning lossless.

    Scale: all equi-key work; candidate volume = Σ over A-prefix
    shingles of B-posting length — rarest-first puts probes where
    postings are shortest, but the full-B index means a stop-word-like
    shingle's posting is long: cap or drop df-dominant shingles
    upstream (the minhash bucket-cap discipline) when the corpus has
    no df ceiling. Returns directed ``(id_a, id_b, containment)``,
    ``id_a ≠ id_b``, A the contained side.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = docs.select(F.col(id_col), TX.tokens(F.col(text_col)).alias("__t"))
    sh = toks.select(
        id_col, F.array_distinct(TX.shingles(F.col("__t"), shingle_n)).alias("__sh")
    )
    ex = sh.select(id_col, F.explode("__sh").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ss")
        )
        .select(
            F.col(id_col),
            F.transform("__ss", lambda s: s["shingle"]).alias("__sorted"),
            F.size("__ss").alias("__n"),
        )
    )
    plen = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")).cast("int") + 1
    pa = ordered.select(
        F.col(id_col).alias("id_a"),
        F.col("__n").alias("n_a"),
        F.explode(F.slice("__sorted", F.lit(1), plen)).alias("shingle"),
    )
    pb = ordered.select(
        F.col(id_col).alias("id_b"),
        F.col("__n").alias("n_b"),
        F.explode("__sorted").alias("shingle"),
    )
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.ceil(F.lit(threshold) * F.col("n_a")) <= F.col("n_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    full = ordered.select(F.col(id_col), F.col("__sorted"))
    v = cand.join(
        full.select(F.col(id_col).alias("id_a"), F.col("__sorted").alias("__sa")),
        "id_a",
    ).join(
        full.select(F.col(id_col).alias("id_b"), F.col("__sorted").alias("__sb")),
        "id_b",
    )
    cont = F.size(F.array_intersect("__sa", "__sb")).cast("double") / F.size(
        "__sa"
    ).cast("double")
    return v.select("id_a", "id_b", cont.alias("containment")).filter(
        F.col("containment") >= threshold
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 3,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández/Stolfo 1995): order all
    records by a sort key, slide a ``window``-row neighborhood, and
    emit every in-window pair as a linkage candidate — the classic
    complement to equality blocking (prefix/LSH buckets): two typo'd
    titles land in DIFFERENT hash blocks but ADJACENT sort positions,
    so SNM catches what bucket equality misses, at a guaranteed
    ``n·window`` candidate budget (no hot-bucket blowup, ever).

    The global sort position comes from the distributed-prefix shape
    (``sampling._distributed_prefix``, weight 1): range-partition on
    (key, id), within-partition running counts, plus the broadcast
    P-row partition-offset ladder — an exact global rank with NO
    single-partition window over the data (the standard SNM "but the
    sort is sequential" objection doesn't survive contact with a
    range exchange). Neighborhood pairing is ``window`` exploded
    offsets equi-joined on rank — never a theta join.

    ``max_dist`` optionally verifies candidates with Levenshtein ≤
    ``max_dist`` (JVM-side ``levenshtein``), turning candidates into
    matches. Returns ``(id_a, id_b, key_a, key_b[, dist])`` with
    ``id_a`` the earlier sort position.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        _distributed_prefix,
    )

    base = records.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
    ranked = _distributed_prefix(
        base, [F.col("key"), F.col("id")], F.lit(1)
    ).select("id", "key", (F.col("__run") + F.col("__off")).alias("pos"))
    left = ranked.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        "pos",
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("__off2"),
    ).withColumn("__pos_b", F.col("pos") + F.col("__off2"))
    right = ranked.select(
        F.col("pos").alias("__pos_b"),
        F.col("id").alias("id_b"),
        F.col("key").alias("key_b"),
    )
    out = left.join(right, "__pos_b").select("id_a", "id_b", "key_a", "key_b")
    if max_dist is not None:
        out = out.withColumn(
            "dist", F.levenshtein("key_a", "key_b")
        ).filter(F.col("dist") <= max_dist)
    return out
