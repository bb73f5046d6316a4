"""Sketch-based approximate aggregates: the bounded-memory scale path
for cardinality and quantiles.

The exact forms (X6's ``distinct_user_counts``, ``price_percentiles``)
shuffle full key sets / sort full columns; at 100 TB the sketch forms
are the only answers that fit: HyperLogLog++ partials
(``approx_count_distinct``) and quantile summaries
(``percentile_approx``) are MERGEABLE — each partition builds a
KB-sized sketch, the shuffle carries sketches instead of rows, and the
merge is associative, so the whole aggregate is one map-side-combined
pass regardless of data size.

These cannot hash-match a DuckDB oracle (different engines ship
different sketch implementations, approximation values diverge by
design), so their gate is error-bound tests vs the exact operators
(tests/test_sketches.py) rather than an ``oracle_sql`` mirror — the
same reason the driver contract keeps the exact forms as the checked
entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_distinct_counts", "approx_quantiles"]


def approx_distinct_counts(
    df: DataFrame,
    keys: list[str],
    count_col: str,
    rsd: float = 0.02,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative standard
    deviation ``rsd``). Memory per group is the sketch (~KBs at 2%),
    never the key set."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(count_col, rsd=rsd).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles via ``percentile_approx`` (mergeable
    quantile summary; max rank error ≈ 1/accuracy). Grouped when
    ``keys`` given; one row per group with an array of quantiles."""
    agg = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    ).alias("quantiles")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)
