"""Text function/operator correctness vs plain-Python oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import textstats as T

SAMPLES = [
    (1, "the quick brown fox"),
    (2, "  leading and trailing   spaces  "),
    (3, "one"),
    (4, ""),
    (5, "der hund ist nicht mit der katze und das ist gut"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SAMPLES, "doc_id int, text string")


def test_n_tokens_matches_python_split(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", TX.n_tokens("text").alias("n")).collect()}
    for doc_id, text in SAMPLES:
        assert got[doc_id] == len(text.split()), (doc_id, text)


def test_shingles_window_count_and_short_doc(docs):
    rows = docs.select(
        "doc_id", TX.shingles(TX.tokens("text"), n=3).alias("sh")
    ).collect()
    got = {r.doc_id: r.sh for r in rows}
    assert got[1] == ["the quick brown", "quick brown fox"]
    assert got[3] == ["one"]  # shorter than n → whole doc is one shingle


def test_word_chunks_reconstruct(docs):
    """Chunks of size 2 concatenated give back the whitespace-normalized
    text (reference chunk() semantics, rag_demo/ingest.py:22-25)."""
    rows = docs.select("doc_id", TX.word_chunks("text", max_words=2).alias("ch")).collect()
    got = {r.doc_id: r.ch for r in rows}
    for doc_id, text in SAMPLES:
        norm = " ".join(text.split())
        assert " ".join(got[doc_id]) == norm
        for chunk in got[doc_id][:-1]:
            assert len(chunk.split()) == 2
    assert got[4] == []  # empty text → no chunks


def test_portable_token_hash_matches_md5(spark):
    import hashlib

    words = ["hello", "spark", "ü-umlaut"]
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got = {r.t: r.h for r in df.select("t", TX.portable_token_hash("t").alias("h")).collect()}
    for w in words:
        expect = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        assert got[w] == expect


def test_stopword_ratio(docs):
    got = {
        r.doc_id: r.sw
        for r in docs.select(
            "doc_id", TX.stopword_ratio(TX.tokens("text")).alias("sw")
        ).collect()
    }
    assert got[1] == pytest.approx(1 / 4)  # "the" of 4 tokens


def test_lang_id_picks_planted_language(docs):
    got = {r.doc_id: r.pred_lang for r in T.lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_token_stats_columns(docs):
    row = {r.doc_id: r for r in T.token_stats(docs).collect()}[1]
    assert row.n_tokens == 4
    assert row.n_chars == len("the quick brown fox")
    assert row.avg_token_len == pytest.approx((3 + 5 + 5 + 3) / 4)


def test_quality_score_bounds(tables):
    rows = T.quality_score(tables["documents"]).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert len(rows) == tables["documents"].count()


def test_rolling_fingerprint_deterministic_and_shift_invariant(spark):
    """Same text → same fingerprint; winnowing min-hash changes when
    content changes."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.fingerprint for r in T.rolling_fingerprint(df, k=3).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_shingles_accepts_named_columns(spark):
    """shingles() must work on a named column/attribute, not just
    unnamed expressions — arrays_zip names struct fields after source
    columns unless pinned (regression: 'no such struct field 0')."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c d",)], "text string").withColumn(
        "toks", TX.tokens("text")
    )
    rows = df.select(
        TX.shingles(F.col("toks")).alias("by_col"),
        TX.shingles("toks").alias("by_name"),
        TX.shingles(TX.tokens("text")).alias("by_expr"),
    ).collect()
    want = ["a b c", "b c d"]
    assert rows[0].by_col == want and rows[0].by_name == want and rows[0].by_expr == want


def test_word_chunks_strided_overlap_and_tail(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", TX.word_chunks_strided(F.col("text"), size=4, stride=2).alias("c")
    ).collect()
    got = {r["doc_id"]: r["c"] for r in out}
    # windows at 0,2,4: last is the short tail
    assert got[1] == ["a b c d", "c d e f", "e f g"]
    # consecutive chunks share size - stride = 2 words
    assert got[1][0].split()[2:] == got[1][1].split()[:2]
    assert got[2] == ["x y"]
    assert got[3] == []
    assert got[4] == []  # NULL text -> no chunks, same as blank
    # stride == size degrades to the plain chunker
    plain = df.filter("doc_id = 1").select(
        TX.word_chunks(F.col("text"), max_words=4).alias("a"),
        TX.word_chunks_strided(F.col("text"), size=4, stride=4).alias("b"),
    ).head()
    assert plain["a"] == plain["b"]


def test_gopher_rules_known_answers(spark):
    """Each Gopher rule fires on a purpose-built page and passes on a
    clean one; the conjunction reflects the per-rule booleans."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        textstats as T,
    )

    clean = (
        "the quick brown fox likes to be jumping over lazy dogs and "
        "that fox will have fun with every single hound around here today"
    )
    bullets = "- one thing\n- two thing\n- red thing\n- blue thing"
    symbols = "# # # # the to of and " + "x " * 10
    rows = [(1, clean), (2, bullets), (3, symbols)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in T.gopher_rules(docs, min_words=10, max_words=100).collect()
    }
    assert got[1].r_stopwords and got[1].r_alpha_words and got[1].r_mean_word_len
    assert got[1].gopher_pass is True
    assert got[2].bullet_line_frac == 1.0 and got[2].r_bullet_lines is False
    assert got[2].gopher_pass is False
    assert got[3].symbol_word_ratio > 0.1 and got[3].r_symbol_ratio is False
    assert got[3].gopher_pass is False


def test_script_ratios_hand_computed(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.textstats import (
        script_ratios,
    )

    docs = spark.createDataFrame(
        [(1, "abc 12 привет 你好 !")],
        "doc_id long, text string",
    )
    r = script_ratios(docs).collect()[0]
    # non-space chars: abc(3) 12(2) привет(6) 你好(2) !(1) = 14
    assert r.n_chars == 14
    assert abs(r.latin_ratio - 3 / 14) < 1e-12
    assert abs(r.digit_ratio - 2 / 14) < 1e-12
    assert abs(r.cyrillic_ratio - 6 / 14) < 1e-12
    assert abs(r.cjk_ratio - 2 / 14) < 1e-12
    assert abs(r.other_ratio - 1 / 14) < 1e-12


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
