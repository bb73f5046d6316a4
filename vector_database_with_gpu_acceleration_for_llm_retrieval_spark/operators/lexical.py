"""Lexical retrieval: BM25 scoring and reciprocal-rank fusion.

The reference retrieves by dense embedding only (rag_demo/ask.py); a
production RAG engine pairs that with lexical retrieval and fuses the
two rankings. Both operators are pure DataFrame compositions:

* **BM25** — tokenize → per-doc term frequencies for the query's terms
  → document frequencies (broadcast: one row per query term) → per-term
  Okapi score → per-doc sum. The scan is one pass; the only wide ops
  are a (doc, term) partial-agg groupBy and the final per-doc groupBy —
  both shuffle O(matched docs · |q terms|) rows, never the corpus. At
  100 TB, materialize (term → df) once at ingest as a tiny dimension
  table and this becomes scan + broadcast join + groupBy.

* **RRF** — rank-only fusion (score = Σ 1/(c + rank)): integer ranks
  make it engine-exact and immune to score-scale mismatches between
  the dense and lexical sides (the reason RRF is the default hybrid
  baseline).

Cross-engine determinism: the per-doc score sum folds the per-term
scores IN TERM ORDER (sort_array + F.aggregate — same sequential
double fold as the SQL mirror's ``list_sum(list(s ORDER BY term))``),
so float addition order cannot differ between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX

__all__ = ["bm25_topk", "bm25_knn_join", "rrf_fuse", "linear_fuse", "write_bm25_index", "bm25_topk_indexed", "delete_from_bm25_index", "tfidf_top_terms"]

#: term-hash partition fan-out for the postings table — a query's terms
#: prune to ≤|q| of these partitions before any file opens.
BM25_TERM_BUCKETS = 64


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k: ``idf · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    summed over the query's distinct terms, ``idf = ln(1 + (N-df+0.5)/
    (df+0.5))``. Returns ``(id, score)``, score desc / id asc.

    N and avgdl are corpus constants — carried as a broadcast 1-row
    frame inside the SAME plan (r13 optimization): the previous
    ``collect()`` ran a synchronous extra job with its own full
    tokenize pass per invocation (guide §5: the driver should do no
    data work on a query path). ``avgdl = sdl/n`` is the identical
    double division either way (two int64 operands, one IEEE divide),
    so scores are bit-unchanged."""
    q_terms = sorted(set(query.split()))
    if not q_terms:
        return docs.sparkSession.createDataFrame([], f"{id_col} long, score double")
    # token array projected once (size() + explode both reference it;
    # interpreted HOF eval has no CSE — the shingle-pipeline lesson)
    base = docs.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.size("__toks").alias("dl"), F.col("__toks"))
    consts = base.agg(F.count("*").alias("__n"), F.sum("dl").alias("__sdl"))
    n_col = F.col("__n").cast("double")
    avgdl_col = F.col("__sdl").cast("double") / n_col

    terms = base.select(id_col, "dl", F.explode("__toks").alias("term")).filter(
        F.col("term").isin(q_terms)
    )
    tf = terms.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            id_col,
            "term",
            (
                F.log(
                    F.lit(1.0) + (n_col - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl_col))
            ).alias("s"),
        )
    )
    # fold per-term scores in term order — deterministic double addition
    summed = per_term.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("term", "s"))), lambda x: x["s"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    return summed.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def write_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = BM25_TERM_BUCKETS,
) -> None:
    """Materialize the lexical index the ``bm25_topk`` docstring
    promises at 100 TB: scan the corpus ONCE at ingest and persist

    * ``postings/`` — ``(id, dl, term, tf)`` partitioned by
      ``term_bucket = xxhash64(term) mod n_buckets``, so a query's
      terms prune to ≤|q| partitions before any file opens;
    * ``dfreq/`` — the tiny ``(term, df)`` dimension;
    * the ``(N, avgdl)`` corpus constants in the same Spark-written
      sidecar the ANN indexes use (hdfs:///s3:// safe).

    Queries then cost pruned-postings-read + broadcast join — the
    corpus text is never re-tokenized per query.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _write_meta,
    )

    base = docs.select(
        F.col(id_col),
        F.size(TX.tokens(F.col(text_col))).alias("dl"),
        TX.tokens(F.col(text_col)).alias("__toks"),
    )
    row = base.agg(F.count("*").alias("n"), F.sum("dl").alias("sdl")).collect()[0]
    n_docs = int(row["n"])
    avgdl = (int(row["sdl"]) / n_docs) if n_docs else 0.0
    postings = (
        base.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    postings.repartition("term_bucket").write.mode("overwrite").partitionBy(
        "term_bucket"
    ).parquet(path + "/postings")
    postings.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    ).write.mode("overwrite").parquet(path + "/dfreq")
    _write_meta(
        docs.sparkSession,
        path,
        {"kind": "bm25", "n_docs": n_docs, "avgdl": avgdl, "n_buckets": n_buckets},
    )


def bm25_topk_indexed(
    spark,
    path: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k over a materialized :func:`write_bm25_index` — scores
    identical to :func:`bm25_topk` on the indexed corpus (same
    constants, same term-ordered fold), but the per-query cost is a
    term-bucket-PRUNED postings read plus one broadcast join; the
    corpus text is never touched."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _read_meta,
    )

    meta = _read_meta(spark, path)
    n_docs, avgdl, n_buckets = meta["n_docs"], meta["avgdl"], int(meta["n_buckets"])
    q_terms = sorted(set(query.split()))
    if not q_terms or n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")
    # partition pruning via the bucket column: the predicate uses the
    # SAME expression the writer used, over literal terms, so Catalyst
    # constant-folds it to a bucket-id IN-list at planning time
    bucket_pred = F.col("term_bucket").isin(
        *[F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)) for t in q_terms]
    )
    tf = (
        spark.read.parquet(path + "/postings")
        .filter(bucket_pred)
        .filter(F.col("term").isin(q_terms))
    )
    dfreq = spark.read.parquet(path + "/dfreq").filter(F.col("term").isin(q_terms))
    per_term = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        (
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        ).alias("s"),
    )
    summed = per_term.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("term", "s"))), lambda x: x["s"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    return summed.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (``(id, rank)`` with
    1-based ranks): ``score = Σ_lists 1/(c + rank)``, absent list
    contributes 0. Returns ``(id, rrf_score)`` top-k, ties to id asc.

    CONTRACT: each input list carries at most one row per id (what a
    ranked top-k list is). Duplicate ids within one list are UNDEFINED
    behavior — this union+groupBy form collapses them via ``max(rank)``
    (one contribution), whereas a join form would emit one row per
    duplicate pair and sum contributions; neither reading is "the"
    semantics of a malformed ranking, so the contract is documented
    rather than enforced with a per-call distinct the well-formed 99%
    case would pay for.

    Executed as a tagged union + one k-row groupBy rather than a
    full-outer join (r13 optimization): FullOuter cannot broadcast, so
    the join form paid two exchanges + two sorts + a SortMergeJoin for
    a ≤2k-row fusion. The aggregate reconstructs each list's rank
    (``max`` over a single-element group side) and applies the SAME
    score expression in the same term order, so every double is
    bit-identical to the join form."""
    fa = a.select(F.col(id_col), F.col(rank_col).alias("__r"), F.lit(0).alias("__side"))
    fb = b.select(F.col(id_col), F.col(rank_col).alias("__r"), F.lit(1).alias("__side"))
    agg = (
        fa.unionByName(fb)
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("__side") == 0, F.col("__r"))).alias("__ra"),
            F.max(F.when(F.col("__side") == 1, F.col("__r"))).alias("__rb"),
        )
    )
    score = F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("__ra")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(c) + F.col("__rb")), F.lit(0.0)
    )
    return (
        agg.select(F.col(id_col), score.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def linear_fuse(
    a: DataFrame,
    b: DataFrame,
    weight_a: float = 0.5,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Weighted-sum fusion of two SCORED lists — the other standard
    hybrid combiner next to rank-only RRF.  Scores live on different
    scales (BM25 is unbounded, cosine is [−1, 1]), so each list is
    min-max normalized over its own k rows first:

        fused = w · norm_a(s_a) + (1 − w) · norm_b(s_b)

    with a missing entry contributing 0 (same absent-list semantics as
    RRF).  The min/max come from two k-row aggregates — driver-free,
    broadcast back — so the whole fusion is a few k-row frames; the
    expensive part stays in the upstream retrievers.  A degenerate list
    (all scores equal) normalizes to 1.0 rather than dividing by zero.
    Returns ``(id, fused_score)`` top-k, ties to id asc."""
    def norm(df: DataFrame, tag: str) -> DataFrame:
        s = df.select(F.col(id_col), F.col(score_col).alias(f"__s{tag}"))
        mm = s.agg(
            F.min(f"__s{tag}").alias(f"__lo{tag}"),
            F.max(f"__s{tag}").alias(f"__hi{tag}"),
        )
        rng = F.col(f"__hi{tag}") - F.col(f"__lo{tag}")
        return s.crossJoin(F.broadcast(mm)).select(
            F.col(id_col),
            F.when(rng == 0.0, F.lit(1.0))
            .otherwise((F.col(f"__s{tag}") - F.col(f"__lo{tag}")) / rng)
            .alias(f"__n{tag}"),
        )
    w = float(weight_a)
    joined = norm(a, "a").join(norm(b, "b"), id_col, "full_outer")
    fused = F.coalesce(F.col("__na"), F.lit(0.0)) * w + F.coalesce(
        F.col("__nb"), F.lit(0.0)
    ) * (1.0 - w)
    return (
        joined.select(F.col(id_col), fused.alias("fused_score"))
        .orderBy(F.desc("fused_score"), F.asc(id_col))
        .limit(k)
    )


def bm25_knn_join(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Batch BM25 — the lexical twin of ``search.knn_join``: one corpus
    scan answers a whole query SET.

    The union of all queries' distinct terms broadcast-semi-filters the
    corpus explode (the corpus is tokenized ONCE regardless of |Q|);
    ``tf``/``df`` are computed per (doc, term) / term — shared across
    queries, since df depends only on the term — and each query fans
    out over the tf frame via a broadcast join on its own terms.  The
    per-(query, doc) score uses the same term-ordered sequential double
    fold as :func:`bm25_topk`, and a candidates-only window keeps
    top-``k`` per query.  The corpus never shuffles by query: the only
    corpus-sized exchange is the (doc, term) tf aggregation, paid once.

    ``max_df_ratio`` is the stop-word guard: a query term present in
    more than that fraction of documents pulls EVERY matching doc into
    its query's candidate window — corpus-sized per-query state at
    100 TB — while contributing idf ≈ ln(1 + 0.5/(N+0.5)) ≈ 0 to the
    score.  Terms over the cap are dropped from scoring (the standard
    retrieval approximation; exact ranking for queries whose terms all
    survive, near-exact otherwise).  ``None`` (default) keeps exact
    semantics — the oracle-checked configuration.

    Output: ``(qid, id, score, rank)``.
    """
    qterms = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(TX.tokens(F.col(qtext_col)))).alias("term"),
    )
    union_terms = qterms.select("term").distinct()
    # token array projected once; corpus constants ride as a broadcast
    # 1-row frame instead of a driver collect()'s extra tokenize job —
    # same r13 rewrite (and bit-identical arithmetic) as bm25_topk
    base = docs.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.size("__toks").alias("dl"), F.col("__toks"))
    consts = base.agg(F.count("*").alias("__n"), F.sum("dl").alias("__sdl"))
    n_col = F.col("__n").cast("double")
    avgdl_col = F.col("__sdl").cast("double") / n_col
    terms = base.select(id_col, "dl", F.explode("__toks").alias("term")).join(
        F.broadcast(union_terms), "term"
    )
    tf = terms.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(consts))
    )
    if max_df_ratio is not None:
        # stop-word cap applied AFTER the single consts crossJoin (r14,
        # ADVICE): pre-filtering dfreq cross-joined consts a second
        # time, and without a guaranteed ReusedExchange that re-ran the
        # full corpus tokenize+aggregate once per reference. Same rows:
        # a term over the cap joins and is dropped here instead of
        # never joining — the broadcast only grows by the stop terms.
        joined = joined.filter(F.col("df") <= float(max_df_ratio) * F.col("__n"))
    per_term = (
        joined
        .select(
            qid_col,
            id_col,
            "term",
            (
                F.log(
                    F.lit(1.0) + (n_col - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl_col))
            ).alias("s"),
        )
    )
    summed = per_term.groupBy(qid_col, id_col).agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("term", "s"))), lambda x: x["s"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", "rank")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest-TF-IDF terms
    of each doc, ``tfidf = tf · (ln((1+N)/(1+df)) + 1)`` (smoothed idf,
    always > 0 so terms present in every doc still rank).

    The signal a curation pipeline uses for topic tagging / domain
    labeling when no model is available — pure lexical statistics, one
    corpus scan.

    Shape for scale: explode → (doc, term) partial-agg groupBy (the one
    corpus-sized shuffle), then the vocabulary-sized ``(term, df)``
    frame joins back on term (AQE broadcasts it when small). N arrives
    via a one-row scalar aggregate cross-joined in — no collect, the
    whole thing is one lazy plan. The final per-doc top-k is a window
    over ≤|distinct terms of one doc| rows — bounded by the longest
    document, never by the corpus.

    Ties: tfidf desc, then term asc — deterministic. Returns
    ``(id, term, tf, df, tfidf, rank)``.
    """
    from pyspark.sql import Window as W

    terms = docs.select(
        F.col(id_col), F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (
                    F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(
        F.desc(F.round(F.col("tfidf"), 6)), F.desc("tf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def delete_from_bm25_index(spark, path: str, ids: list, id_col: str = "doc_id") -> dict:
    """Right-to-erasure maintenance for a materialized BM25 index —
    the lexical sibling of ``ann_index.delete_from_index``, with the
    part the vector indexes don't have: the CORPUS STATISTICS move
    with the delete (a stale ``df``/``N``/``avgdl`` silently skews
    every later score), and all three update EXACTLY without
    re-scanning the corpus.

    Plan: one column-pruned pass over the postings locates the doomed
    rows; their term buckets rewrite under dynamic partition overwrite
    (untouched buckets never open — though note a document's terms
    spread over many buckets, so erasure locality is per-TERM, not
    per-doc); ``dfreq`` decrements by the deleted docs' per-term doc
    counts (and drops terms reaching df=0); the sidecar updates from
    the doomed rows alone: ``N' = N − |deleted docs|``,
    ``Σdl' = avgdl·N − Σ dl_deleted`` (each doomed doc's dl rides on
    its posting rows).  ``bm25_topk_indexed`` scores after the delete
    equal ``bm25_topk`` on the reduced corpus — asserted in
    tests/test_lexical-family.  Returns ``{"rows_deleted",
    "docs_deleted", "touched_buckets"}``."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.ann_index import (
        _dynamic_partition_overwrite,
        _read_meta,
        _write_meta,
    )

    meta = _read_meta(spark, path)
    if meta.get("kind") != "bm25":
        raise ValueError(f"not a bm25 index: kind={meta.get('kind')!r}")
    if not ids:
        return {"rows_deleted": 0, "docs_deleted": 0, "touched_buckets": []}
    id_frame = F.broadcast(
        spark.createDataFrame([(i,) for i in ids], [id_col]).distinct()
    )
    postings = spark.read.parquet(path + "/postings")
    doomed = postings.join(id_frame, id_col, "left_semi").localCheckpoint(
        eager=True
    )
    stats = doomed.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct(id_col).alias("docs"),
    ).collect()[0]
    rows_deleted = int(stats["rows"])
    docs_deleted = int(stats["docs"])
    if rows_deleted == 0:
        return {"rows_deleted": 0, "docs_deleted": 0, "touched_buckets": []}
    dl_deleted = (
        doomed.select(id_col, "dl").distinct().agg(F.sum("dl")).collect()[0][0]
    )
    touched = sorted(
        r["term_bucket"]
        for r in doomed.select("term_bucket").distinct().collect()
    )
    current = postings.filter(F.col("term_bucket").isin(touched))
    keep = current.join(id_frame, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    _dynamic_partition_overwrite(keep, path + "/postings", "term_bucket", touched)
    # dfreq: subtract each term's deleted-doc count; df=0 terms drop
    dec = doomed.groupBy("term").agg(F.count_distinct(id_col).alias("__dec"))
    dfreq = spark.read.parquet(path + "/dfreq")
    new_dfreq = (
        dfreq.join(F.broadcast(dec), "term", "left")
        .select(
            "term",
            (F.col("df") - F.coalesce(F.col("__dec"), F.lit(0))).alias("df"),
        )
        .filter(F.col("df") > 0)
        .localCheckpoint(eager=True)
    )
    new_dfreq.write.mode("overwrite").parquet(path + "/dfreq")
    n_docs = int(meta["n_docs"]) - docs_deleted
    sum_dl = float(meta["avgdl"]) * int(meta["n_docs"]) - float(dl_deleted)
    _write_meta(
        spark,
        path,
        {
            "kind": "bm25",
            "n_docs": n_docs,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
            "n_buckets": meta["n_buckets"],
        },
    )
    return {
        "rows_deleted": rows_deleted,
        "docs_deleted": docs_deleted,
        "touched_buckets": touched,
    }
