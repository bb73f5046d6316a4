"""Known-answer tests for tfidf_top_terms and leakage_safe_split."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.lexical import (
    tfidf_top_terms,
)
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
    leakage_safe_split,
)


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf, r.rank)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    # N=3; idf(t) = ln(4/(1+df)) + 1
    idf1 = math.log(4.0 / 2.0) + 1.0  # df=1
    idf2 = math.log(4.0 / 3.0) + 1.0  # df=2
    assert got[(1, "apple")][:2] == (2, 1)
    assert abs(got[(1, "apple")][2] - 2 * idf1) < 1e-12
    assert got[(1, "apple")][3] == 1  # 2·idf1 > 1·idf2 for banana
    assert got[(1, "banana")][3] == 2
    # doc 3: cherry tf=3 df=2 vs date tf=1 df=1 → cherry wins
    assert got[(3, "cherry")][3] == 1
    assert abs(got[(3, "cherry")][2] - 3 * idf2) < 1e-12
    assert got[(3, "date")][3] == 2
    # k=2 caps output per doc
    assert all(rank <= 2 for (_, _, _, rank) in got.values())


def test_tfidf_empty_text_emits_nothing(spark):
    docs = spark.createDataFrame([(1, "   "), (2, "x")], "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=3).collect()
    assert {r.doc_id for r in rows} == {2}


def test_leakage_safe_split_groups_stay_together(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # two components: {0,1,2} (chain) and {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, val_frac=0.5).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 40  # no doc dropped or duplicated
    # all members of a component share group_id AND split
    assert {by_id[i].group_id for i in (0, 1, 2)} == {0}
    assert len({by_id[i].split for i in (0, 1, 2)}) == 1
    assert {by_id[i].group_id for i in (10, 11)} == {10}
    assert by_id[10].split == by_id[11].split
    # singletons group as themselves
    assert by_id[25].group_id == 25
    # both sides non-empty at val_frac=0.5 on 37 groups
    splits = {r.split for r in out}
    assert splits == {"train", "val"}


def test_leakage_safe_split_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
    a = {
        (r.doc_id, r.split)
        for r in leakage_safe_split(docs, pairs, val_frac=0.3).collect()
    }
    b = {
        (r.doc_id, r.split)
        for r in leakage_safe_split(
            docs.repartition(7), pairs, val_frac=0.3
        ).collect()
    }
    assert a == b


def test_global_rank_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 1.0), (3, 3.0), (4, 3.0), (5, 9.0)],
        "doc_id long, q double",
    )
    got = {r.doc_id: (r.rank, r.pct) for r in global_rank(df, "q").collect()}
    # asc order: 1.0 < 3.0(id3) < 3.0(id4) < 5.0 < 9.0 — id tiebreak
    assert [got[i][0] for i in (2, 3, 4, 1, 5)] == [1, 2, 3, 4, 5]
    assert got[2][1] == 0.0 and got[5][1] == 1.0
    assert abs(got[3][1] - 0.25) < 1e-12
    # descending
    gotd = {r.doc_id: r.rank for r in global_rank(df, "q", ascending=False).collect()}
    assert gotd[5] == 1 and gotd[2] == 5


def test_global_rank_partition_invariant(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).cast("double").alias("q")
    )
    a = {(r.doc_id, r.rank) for r in global_rank(df, "q", n_parts=4).collect()}
    b = {(r.doc_id, r.rank) for r in global_rank(df.repartition(13), "q", n_parts=9).collect()}
    assert a == b
    # ranks are a permutation of 1..N
    assert sorted(r for _, r in a) == list(range(1, 201))


def test_global_rank_single_row(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    r = global_rank(
        spark.createDataFrame([(1, 2.0)], "doc_id long, q double"), "q"
    ).collect()[0]
    assert r.rank == 1 and r.pct == 0.0
