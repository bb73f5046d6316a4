"""Late-interaction MaxSim retrieval (operators/rag.maxsim_topk):
per-token best-alignment beats pooled single-vector retrieval on
multi-topic docs, and the plan stays one scan + one doc-keyed agg."""

from __future__ import annotations

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import rag


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_maxsim_rewards_per_token_alignment(spark):
    filler_a = " ".join(f"fillerA{i}" for i in range(6))
    filler_b = " ".join(f"fillerB{i}" for i in range(6))
    docs = _docs(
        spark,
        [
            # doc 1: both query topics, in DIFFERENT chunks (multi-topic)
            (1, f"alpha {filler_a} || beta {filler_b}".replace("||", " ")),
            # doc 2: only one topic
            (2, f"alpha {filler_a} gammagamma {filler_b}"),
            # doc 3: neither
            (3, f"{filler_a} deltadelta {filler_b}"),
        ],
    )
    out = rag.maxsim_topk(docs, "alpha beta", k=3, dim=32, max_words=8).collect()
    ranks = {r["doc_id"]: i for i, r in enumerate(out)}
    scores = {r["doc_id"]: r["score"] for r in out}
    # the doc aligning BOTH tokens (each via its own chunk) wins
    assert ranks[1] == 0
    assert scores[1] > scores[2] > scores[3]


def test_maxsim_plan_single_doc_shuffle(spark):
    docs = _docs(spark, [(1, "a b c d e f g h"), (2, "x y z w v u t s")])
    df = rag.maxsim_topk(docs, "a x", k=2, dim=16, max_words=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one exchange: the doc-keyed aggregation
    assert plan.count("Exchange hashpartitioning") <= 1
