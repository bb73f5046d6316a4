"""Curation composite: stage semantics (gate → dedup → near-dup) and
the audit report."""

from __future__ import annotations

import pytest

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import curation


@pytest.fixture(scope="module")
def corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs through the field "
        "with great speed and a lot of joy for all to see in the morning light"
    )
    rows = [
        (1, good),                              # survives
        (2, good),                              # exact dup of 1 → dropped
        (3, good.replace("morning", "evening")),  # near-dup of 1 → dropped
        (4, "x y z"),                           # too short → quality gate drops
        (5, "der hund und die katze sind nicht mit dem vogel und der maus und dem pferd "
            "und das wetter ist gut und die sonne ist hell und alles ist schoen heute"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_curate_corpus_stages(corpus):
    out = curation.curate_corpus(
        corpus, min_quality=0.5, langs=["en", "de"], near_dup_threshold=0.5,
        n_hashes=16, n_bands=8,
    )
    kept = {r.doc_id: r.pred_lang for r in out.collect()}
    assert set(kept) == {1, 5}
    assert kept[1] == "en" and kept[5] == "de"


def test_curation_report(corpus):
    curated = curation.curate_corpus(
        corpus, min_quality=0.5, langs=["en", "de"], near_dup_threshold=0.5,
        n_hashes=16, n_bands=8,
    )
    row = curation.curation_report(corpus, curated).collect()[0]
    assert (row.n_input, row.n_survived) == (5, 2)
    assert row.drop_rate == pytest.approx(0.6)


def test_curate_corpus_full_all_stages(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs through the field "
        "with great speed and a lot of joy for all to see in the morning light"
    )
    rows = [
        (1, base),                                   # survives
        (2, base),                                   # exact dup -> dropped
        (3, base.replace("morning", "evening")),     # near-dup -> dropped
        (4, "x y z"),                                # quality gate
        # repetitive: one 3-gram looped -> repetition gate
        (5, " ".join(["spam and eggs"] * 40)),
        # PII: same as 1 apart from an email -> redacts, then exact-dups 1
        (6, base + " reach me at someone@example.com"),
        # contaminated: contains the probe excerpt verbatim inside other text
        (7, "totally different words surround the probe here "
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "and then trail off into more unique content for the quality gate "
            "to accept this document with the usual and necessary length of it"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    probes = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    out = curation.curate_corpus_full(
        docs, probes=probes, min_quality=0.5, langs=["en"],
        max_dup_ngram_ratio=0.5, near_dup_threshold=0.5,
        contam_n=5, contam_threshold=0.5, n_hashes=16, n_bands=8,
    )
    rows_out = {r.doc_id: r for r in out.collect()}
    assert set(rows_out) == {1}
    # redaction precedes dedup: alone, doc 6 survives with the email
    # replaced by the typed placeholder
    out2 = curation.curate_corpus_full(
        docs.filter("doc_id = 6"), probes=probes, min_quality=0.5, langs=["en"],
        max_dup_ngram_ratio=0.5, near_dup_threshold=0.5,
        contam_n=5, contam_threshold=0.5, n_hashes=16, n_bands=8,
    )
    texts = {r.doc_id: r.text for r in out2.collect()}
    assert 6 in texts and "[EMAIL]" in texts[6] and "someone@example.com" not in texts[6]


def test_curate_corpus_full_null_text_gated_not_joined_away(spark):
    """A NULL-text doc must flow through the pipeline (left-joined
    repetition signal, coalesced to 0) and be rejected by the QUALITY
    gate — not silently vanish in an inner join."""
    good = (
        "the quick brown fox jumps over the lazy dog and runs through the "
        "field with great speed and a lot of joy for all to see in the light"
    )
    docs = spark.createDataFrame(
        [(1, good), (2, None)], "doc_id int, text string"
    )
    out = curation.curate_corpus_full(
        docs, min_quality=0.5, langs=["en"], max_dup_ngram_ratio=0.5,
        near_dup_threshold=0.5, n_hashes=16, n_bands=8,
    )
    assert {r.doc_id for r in out.collect()} == {1}


def test_doc_signals_keeps_ungateable_docs_visible(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        curation,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, None),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.doc_signals(docs).collect()}
    # every input doc has a signals row — none silently dropped
    assert set(out) == {1, 2, 3}
    # real text gets LM scores; NULL/blank text surfaces NULL (not fake 0)
    assert out[1]["ppl"] is not None and out[1]["n_bigrams"] > 0
    assert out[2]["ppl"] is None and out[3]["ppl"] is None
    assert out[1]["pred_lang"] == "en"


def test_c4_clean_line_filter_and_page_gate(spark):
    """Line filter keeps punctuated >=5-word prose; nav stubs drop;
    marker pages are gated on the ORIGINAL text even when the marker
    line itself would not survive the line filter."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        curation,
    )

    good = "This is a perfectly fine prose sentence one.\nHome | About\nAnd here is a second good sentence too.\nA third closing sentence rounds it out."
    short = "Tiny stub.\nOk."
    marked = good + "\nvar x = { notkept }"
    rows = [(1, good), (2, short), (3, marked)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in curation.c4_clean(docs).collect()}

    assert got[1].n_lines == 4 and got[1].n_kept_lines == 3
    assert got[1].n_sentences == 3 and got[1].keep is True
    assert "Home | About" not in got[1].clean_text
    # too few sentences survive
    assert got[2].n_kept_lines == 0 and got[2].keep is False
    # brace marker gates the page though the brace line was dropped
    assert got[3].n_kept_lines == 3 and got[3].keep is False


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
