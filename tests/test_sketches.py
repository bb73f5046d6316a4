"""Sketch aggregates: error bounds vs the exact operators (their gate —
cross-engine sketch values can't hash-match an oracle by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import sketches


def test_approx_distinct_within_rsd_bound(tables):
    exact = {
        r.event_type: r.n
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_distinct
        for r in sketches.approx_distinct_counts(
            tables["events"], ["event_type"], "user_id", rsd=0.02
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 5 * 0.02 * n), (k, approx[k], n)


def test_approx_quantiles_near_exact(tables):
    probs = [0.25, 0.5, 0.75]
    got = sketches.approx_quantiles(
        tables["orders"], "o_totalprice", probs, accuracy=10_000
    ).collect()[0].quantiles
    exact = (
        tables["orders"]
        .agg(F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("q"))
        .collect()[0]
        .q
    )
    spread = (
        tables["orders"].agg((F.max("o_totalprice") - F.min("o_totalprice")).alias("s")).collect()[0].s
    )
    for a, e in zip(got, exact):
        assert abs(a - e) <= 0.05 * spread  # loose sanity: rank error is tiny, value error bounded by local density
    assert got == sorted(got)


def test_approx_quantiles_grouped(tables):
    out = sketches.approx_quantiles(
        tables["orders"], "o_totalprice", [0.5], keys=["o_orderstatus"]
    )
    rows = out.collect()
    assert {r.o_orderstatus for r in rows} == {
        r.o_orderstatus for r in tables["orders"].select("o_orderstatus").distinct().collect()
    }
    for r in rows:
        assert len(r.quantiles) == 1 and r.quantiles[0] > 0
