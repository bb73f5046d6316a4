"""Stratified sampling determinism/rates and sequence-packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sampling
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sampling as SA


def test_stratified_sample_deterministic_and_rate(tables):
    rates = {"en": 0.5, "de": 1.0}
    a = {r.doc_id for r in sampling.stratified_sample(tables["documents"], rates).collect()}
    b = {r.doc_id for r in sampling.stratified_sample(tables["documents"], rates).collect()}
    assert a == b  # hash-based: identical across runs
    by_lang = (
        sampling.stratified_sample(tables["documents"], rates)
        .groupBy("lang").count().collect()
    )
    counts = {r.lang: r["count"] for r in by_lang}
    totals = {r.lang: r["count"] for r in tables["documents"].groupBy("lang").count().collect()}
    assert counts["de"] == totals["de"]          # rate 1.0 keeps everything
    assert set(counts) == {"en", "de"}           # default rate 0 drops other strata
    assert 0.3 < counts["en"] / totals["en"] < 0.7  # ~half of en


def test_stratified_sample_subset_semantics(tables):
    """A lower rate keeps a SUBSET of a higher rate's rows (nested
    samples — the property that makes mixture re-weighting cheap)."""
    lo = {r.doc_id for r in sampling.stratified_sample(tables["documents"], {"en": 0.2}).collect()}
    hi = {r.doc_id for r in sampling.stratified_sample(tables["documents"], {"en": 0.6}).collect()}
    assert lo <= hi


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, " ".join(["x"] * 20)), (5, "z")],
        "doc_id int, text string",
    )
    rows = sorted(
        sampling.pack_sequences(docs, seq_len=8).collect(), key=lambda r: r.doc_id
    )
    # greedy in id order: docs 1(3)+2(2) fill bin 0 to offset 5; doc 3(4)
    # starts at cum 5 → bin 0 offset 5; doc 4(20) starts at cum 9 → bin 1;
    # doc 5 starts at cum 29 → bin 3
    got = [(r.doc_id, r.bin_id, r.bin_offset) for r in rows]
    assert got == [(1, 0, 0), (2, 0, 3), (3, 0, 5), (4, 1, 1), (5, 3, 5)]
    # every doc's start offset is inside the budget
    assert all(0 <= r.bin_offset < 8 for r in rows)


def test_budget_select_equals_naive_global_cumsum(spark):
    """The distributed prefix-sum (range partitions + offsets) must
    reproduce the single-partition global cumsum exactly — exercised
    with n_parts=4 so the offset path actually runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, " ".join(["w"] * ((i * 7) % 13 + 1)), float((i * 3) % 5)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, quality double")
    got = {
        (r.doc_id, r.cum_tokens)
        for r in sampling.budget_select(docs, 150, n_parts=4).collect()
    }
    w = Window.orderBy(F.desc("quality"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        docs.withColumn("n", F.size(F.split(F.trim("text"), r"\s+")))
        .withColumn("cum", F.sum("n").over(w))
        .filter(F.col("cum") <= 150)
    )
    want = {(r.doc_id, r.cum) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_budget_select_respects_budget_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", 0.9), (2, "d e f g", 0.8), (3, "h i", 0.99), (4, "j k l m n", 0.1)],
        "doc_id int, text string, quality double",
    )
    rows = sorted(sampling.budget_select(docs, 8).collect(), key=lambda r: r.cum_tokens)
    # order: 3(2) -> 1(3) -> 2(4 would hit 9 > 8, dropped) -> 4 dropped
    assert [(r.doc_id, r.cum_tokens) for r in rows] == [(3, 2), (1, 5)]


def test_mixture_plan_math(spark):
    # corpus: a=100, b=30, c=50 docs; target a:0.4 b:0.3 (c untargeted)
    rows = []
    i = 0
    for s, n in [("a", 100), ("b", 30), ("c", 50)]:
        for _ in range(n):
            rows.append((i, f"t {i}", s))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = {r["lang"]: r for r in sampling.mixture_plan(docs, {"a": 0.4, "b": 0.3}).collect()}
    # lam = min(100/0.4=250, 30/0.3=100) = 100 → a: 40 docs (rate .4), b: 30 (rate 1.0)
    assert set(plan) == {"a", "b"}  # untargeted stratum gets no plan row
    assert abs(plan["b"]["rate"] - 1.0) < 1e-9 and plan["b"]["n_avail"] == 30
    assert abs(plan["a"]["rate"] - 0.4) < 1e-9
    assert abs(plan["a"]["n_target"] - 40.0) < 1e-9


def test_mixture_sample_deterministic_and_binomialish(spark):
    rows = [(i, f"doc {i}", "a" if i % 4 else "b") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got1 = {r["doc_id"] for r in sampling.mixture_sample(docs, {"a": 0.5, "b": 0.5}).collect()}
    # identical under a different partitioning (hash filter, no RNG stream)
    got2 = {
        r["doc_id"]
        for r in sampling.mixture_sample(docs.repartition(13), {"a": 0.5, "b": 0.5}).collect()
    }
    assert got1 == got2
    # b is the binding stratum (100 docs, weight .5 → lam=200, b rate 1.0)
    b_ids = {i for i in range(400) if i % 4 == 0}
    assert b_ids <= got1
    # a sampled at ~ rate 100/300: binomial, loose band
    n_a = len(got1 - b_ids)
    assert 60 <= n_a <= 140


def test_dsir_weights_prefer_target_domain(spark):
    """Docs sharing the target domain's vocabulary get higher
    importance weights than out-of-domain docs; weights are finite for
    every doc (smoothing) and deterministic."""
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "wiki"),
        (2, "the quick brown fox runs past the lazy dog", "wiki"),
        (3, "buy cheap pills now click here winner prize", "spam"),
        (4, "the quick brown fox naps near the lazy dog", "web"),
        (5, "cheap prize winner click buy now pills here", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    res = sampling.dsir_weights(
        docs, target=F.col("source") == "wiki", n_buckets=64, alpha=0.5
    )
    got = {r.doc_id: r for r in res.collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # wiki-like web doc outranks the spam-like web doc
    assert got[4].avg_log_weight > got[5].avg_log_weight
    # in-domain docs score above the spam doc
    assert min(got[1].avg_log_weight, got[2].avg_log_weight) > got[3].avg_log_weight
    again = {r.doc_id: r.log_weight for r in res.collect()}
    assert all(abs(again[i] - got[i].log_weight) < 1e-12 for i in got)


def test_gumbel_topk_sample_deterministic_and_weighted(spark):
    """Same draw across runs and partitionings; temperature → 0 makes
    the draw collapse to the deterministic top-n by score."""
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling,
    )

    rows = [(i, float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    a = sorted(
        r.doc_id
        for r in sampling.gumbel_topk_sample(df, 20, score_col="score").collect()
    )
    b = sorted(
        r.doc_id
        for r in sampling.gumbel_topk_sample(
            df.repartition(7), 20, score_col="score"
        ).collect()
    )
    assert a == b  # partition-invariant draw
    # near-zero temperature: score dominates the noise entirely
    cold = sampling.gumbel_topk_sample(
        df, 10, score_col="score", temperature=1e-9
    ).collect()
    assert all(r.score == 9.0 for r in cold)


def test_dsir_weights_null_target_rows(spark):
    """Rows where the target predicate is NULL count as not-target and
    never crash the distribution collect."""
    from pyspark.sql import functions as F

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", "wiki"), (2, "alpha gamma", None), (3, "delta", "web")],
        "doc_id long, text string, source string",
    )
    res = sampling.dsir_weights(
        docs, target=F.col("source") == "wiki", n_buckets=32, alpha=0.5
    ).collect()
    assert {r.doc_id for r in res} == {1, 2, 3}
    assert all(r.log_weight is not None for r in res)


def test_epoch_upsample_deterministic_counts(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        epoch_upsample,
    )

    rows = [(i, "a" if i < 200 else "b") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_upsample(docs, {"a": 2.5, "b": 0.4})
    per = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # a: 200 docs x (2 + Bernoulli(0.5)) -> ~500; b: 100 x 0.4 -> ~40
    assert 440 <= per["a"] <= 560 and 25 <= per["b"] <= 55
    # deterministic: identical multiset on rerun and under repartition
    a = sorted((r.doc_id, r.epoch) for r in out.collect())
    b = sorted((r.doc_id, r.epoch) for r in
               epoch_upsample(docs.repartition(7), {"a": 2.5, "b": 0.4}).collect())
    assert a == b
    # whole-epoch floor: every kept 'a' doc appears at least twice
    from collections import Counter
    ca = Counter(d for d, _ in a if d < 200)
    assert all(v >= 2 for v in ca.values()) and len(ca) == 200
    # unlisted stratum defaults to exactly one copy
    out2 = epoch_upsample(docs, {"a": 2.0})
    assert out2.filter("lang = 'b'").count() == 100


def test_within_group_percentile_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        within_group_percentile,
    )

    rows = [(1, "x", 1.0), (2, "x", 2.0), (3, "x", 3.0),
            (4, "y", 10.0), (5, "y", 20.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    got = {r.doc_id: r.pctl for r in
           within_group_percentile(df, "score").collect()}
    assert got[1] == 0.0 and got[2] == pytest.approx(0.5) and got[3] == 1.0
    assert got[4] == 0.0 and got[5] == 1.0


def test_negative_samples_duplicate_corpus_ids_still_k_distinct(spark):
    # r8 ADVICE fix: duplicate corpus ids used to occupy several ranks
    # for the same (qid, id), shrinking the distinct-negative set
    pos = spark.createDataFrame([(1, 100)], "qid long, vec_id long")
    corpus = spark.createDataFrame(
        [(v,) for v in [100, 101, 101, 101, 101, 102, 103]], "vec_id long"
    )
    rows = sampling.negative_samples(pos, corpus, k=3).collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == 3
    assert len(set(ids)) == 3           # all distinct
    assert 100 not in ids               # positive excluded
    assert sorted(r.rank for r in rows) == [1, 2, 3]


def test_mixture_pipeline_equals_manual_chain(tables):
    # r8 composite: one call == manually chaining the four stages
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        curation,
    )

    docs = tables["documents"]
    target = {"en": 0.7, "und": 0.3}
    out = sampling.mixture_pipeline(docs, target, min_pctl=0.4, seq_len=512)
    sig = curation.doc_signals(docs)
    pct = sampling.within_group_percentile(sig, "quality", group_col="pred_lang")
    kept = pct.filter(F.col("pctl") >= 0.4).select("doc_id", "pred_lang")
    mixed = sampling.mixture_sample(kept, target, stratum_col="pred_lang")
    packed = sampling.pack_sequences(
        mixed.join(docs.select("doc_id", "text"), "doc_id"),
        seq_len=512,
        by="pred_lang",
    )
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in packed.collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# priority sampling (weighted without replacement, unbiased estimator)
# ---------------------------------------------------------------------------


def test_priority_sample_estimator_is_unbiased_shape(spark):
    """Structural properties: k rows, priority order, est_weight =
    max(w, tau) with tau = the (k+1)-th priority; population <= k is
    kept whole with est_weight == weight."""
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling as SMP,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "w": [1 + (i % 17) for i in range(200)]})
    )
    out = SMP.priority_sample(df, k=20, weight_col="w").collect()
    assert len(out) == 20
    ps = [r.priority for r in out]
    assert ps == sorted(ps, reverse=True)
    tau_candidates = {r.est_weight for r in out if r.est_weight != r.weight}
    assert len(tau_candidates) <= 1  # every clamped row clamps to the SAME tau
    # small population: all kept, estimator exact
    small = SMP.priority_sample(df.filter("doc_id < 5"), k=20, weight_col="w").collect()
    assert len(small) == 5
    assert all(r.est_weight == r.weight for r in small)


def test_priority_sample_subset_sum_estimate_close(spark):
    """The DLT guarantee actually used in practice: E[sum(est_weight)]
    = sum(w). One deterministic draw can't average, but at k=150 of
    1000 the single-draw estimate should land within a few percent."""
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling as SMP,
    )

    rows = pd.DataFrame({"doc_id": range(1000),
                         "w": [1 + ((i * 37) % 100) for i in range(1000)]})
    df = spark.createDataFrame(rows)
    total = float(rows.w.sum())
    est = sum(r.est_weight for r in
              SMP.priority_sample(df, k=150, weight_col="w").collect())
    assert abs(est - total) / total < 0.15, (est, total)


def test_priority_sample_excludes_nonpositive_weights(spark):
    import pandas as pd

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        sampling as SMP,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10),
                      "w": [0, -1, None, 2, 3, 4, 5, 6, 7, 8]})
    )
    got = {r.doc_id for r in SMP.priority_sample(df, k=10, weight_col="w").collect()}
    assert got == set(range(3, 10))


def test_sampled_aggregate_estimates(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        sampled_aggregate,
    )

    rows = [(i, "g", 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    r = sampled_aggregate(df, ["g"], "v", "id", denom=8).collect()[0]
    # deterministic sample: repeated runs identical
    r2 = sampled_aggregate(df, ["g"], "v", "id", denom=8).collect()[0]
    assert (r.n_sample, r.n_est) == (r2.n_sample, r2.n_est)
    # ~1/8 of 4000 with binomial spread; HT estimate near truth
    assert 350 < r.n_sample < 650
    assert r.n_est == r.n_sample * 8
    assert abs(r.sum_est - 4000.0) < 4 * r.se_sum + 1e-9
    # unit values: Var = (1-p)/p^2 * n_sample
    import math
    assert abs(r.se_sum - math.sqrt((1 - 0.125) / 0.125**2 * r.n_sample)) < 1e-9


def test_budget_select_token_count_bpe_matches_python_replay(spark, tables):
    """Tokenizer-true budgeting (r11 verdict #7): budget_select over a
    joined-on bpe_encode count column must equal a pure-Python replay
    (sort by order desc/id asc, cumsum of replayed BPE token counts,
    cut at the budget) — the no-SQL-mirror precedent for BPE."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        bpe as B,
    )

    docs = tables["documents"].filter(F.col("doc_id") < 150).select(
        "doc_id", "text", "n_chars"
    )
    merges = B.train_bpe(docs, n_merges=40)
    enc = B.bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens")
    base = docs.join(enc, "doc_id")
    budget = 9000
    res = SA.budget_select(
        base, budget, order_col="n_chars", token_count="n_bpe_tokens"
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.cum_tokens) for r in res.collect()
    )

    # python replay with an independent greedy-merge encoder
    ranks = {pair: i for i, pair in enumerate(merges)}
    rows = docs.collect()

    def count_tokens(text: str) -> int:
        total = 0
        for w in (text or "").split():
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                cands = [
                    (ranks[(a, b)], i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks
                ]
                if not cands:
                    break
                _, i = min(cands)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            total += len(syms)
        return total

    replay = sorted(
        ((r.doc_id, r.n_chars, count_tokens(r.text)) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )
    want, cum = [], 0
    for doc_id, _, n in replay:
        cum += n
        if cum > budget:
            break
        want.append((doc_id, n, cum))
    assert got == sorted(want)


def test_budget_select_and_pack_whitespace_mode_unchanged(spark, tables):
    """token_count=None must stay bit-identical to the pre-seam
    behavior, and a precomputed whitespace count through the seam must
    reproduce the default path exactly."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        text as TX,
    )

    docs = tables["documents"].filter(F.col("doc_id") < 200).select(
        "doc_id", "text", "n_chars"
    )
    a = {
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in SA.budget_select(docs, 5000, order_col="n_chars").collect()
    }
    pre = docs.withColumn("tc", TX.n_tokens(F.col("text")))
    b = {
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in SA.budget_select(
            pre, 5000, order_col="n_chars", token_count="tc"
        ).collect()
    }
    assert a == b and a
    pa = {
        (r.doc_id, r.n_tokens, r.bin_id, r.bin_offset)
        for r in SA.pack_sequences(docs, seq_len=512).collect()
    }
    pb = {
        (r.doc_id, r.n_tokens, r.bin_id, r.bin_offset)
        for r in SA.pack_sequences(pre, seq_len=512, token_count="tc").collect()
    }
    assert pa == pb and pa


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
