"""fan_out no-op semantics and salted two-phase aggregation parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import (
    fan_out,
    salted_agg,
)


def test_fan_out_is_noop_when_enough_partitions(spark):
    df = spark.range(1000).repartition(64)
    assert fan_out(df, min_parts=32).rdd.getNumPartitions() == 64  # untouched
    small = spark.range(10).coalesce(1)
    assert fan_out(small, min_parts=8).rdd.getNumPartitions() == 8


def test_salted_agg_matches_plain_groupby(spark, tables):
    """Skewed input (one hot key): salted two-phase result == plain
    groupBy result, exactly (integer sums/counts/min/max)."""
    ev = tables["events"].select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    ).withColumn("event_type", F.lit("hot"))  # all rows on one key = max skew
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()[0]
    )
    salted = salted_agg(
        ev,
        keys=["event_type"],
        aggs={"n": ("value", "count"), "s": ("value", "sum"), "lo": ("value", "min"), "hi": ("value", "max")},
        n_salts=16,
        salt_on=F.col("event_id"),
    ).collect()[0]
    assert salted.n == plain.n
    assert salted.s == pytest.approx(plain.s, rel=1e-9)
    assert salted.lo == plain.lo and salted.hi == plain.hi


def test_salted_agg_rejects_non_mergeable(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="mergeable"):
        salted_agg(df, keys=["id"], aggs={"a": ("id", "avg")})


def test_skew_report_hand_computed(spark):
    """Counts, shares, and ratio-to-uniform on a known skewed key."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.plans.partitioning import (
        skew_report,
    )

    rows = [(i, "hot" if i < 60 else f"k{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = skew_report(df, ["k"], top_n=2).collect()
    assert got[0].k == "hot" and got[0].n_rows == 60
    assert abs(got[0].share - 0.6) < 1e-12
    # 5 distinct keys, uniform would be 20 rows → hot is 3x uniform
    assert abs(got[0].skew_ratio - 3.0) < 1e-12
    assert got[1].n_rows == 10  # the four cold keys tie at 10; key asc picks k0
    assert got[1].k == "k0"


# r14: part of the fast driver-gate subset (default `pytest` selection
# per pytest.ini; `-m ''` runs the full suite)
import pytest as _pytest

pytestmark = _pytest.mark.driver_gate
