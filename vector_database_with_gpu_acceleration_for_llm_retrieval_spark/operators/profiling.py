"""One-pass table profiling: the ANALYZE/data-quality summary.

Every ingestion pipeline starts by profiling what landed: null counts,
distinct cardinalities, and value ranges per column.  This computes the
whole profile in ONE aggregation job — 4 partial aggregates per column
plus a row count, all map-side combined, one 1-row shuffle — then
explodes the single result row into the long-format
``(col_name, n_nulls, n_distinct, min_str, max_str)`` frame.  At
100 TB that is exactly one scan of the profiled columns, which is the
floor for exact answers (swap ``count_distinct`` for
``approx_count_distinct`` via ``approximate=True`` when ±2% HLL
cardinalities are acceptable — the scan then carries constant-size
sketch state per column instead of distinct-set state).

min/max are cast to string AFTER aggregating (never before — string
min/max of numerics would be lexicographic).  Float columns profile
fine but their string rendering is engine-specific; the oracle-checked
contract entry profiles integer/string/date columns, where renderings
agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """``(col_name, n_nulls, n_distinct, min_str, max_str)`` per
    profiled column, computed in one aggregation job."""
    cols = columns or df.columns
    nd = F.approx_count_distinct if approximate else F.count_distinct
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__c{i}"),
            nd(F.col(c)).alias(f"__d{i}"),
            F.min(F.col(c)).cast("string").alias(f"__lo{i}"),
            F.max(F.col(c)).cast("string").alias(f"__hi{i}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                (F.col("__n") - F.col(f"__c{i}")).alias("n_nulls"),
                F.col(f"__d{i}").alias("n_distinct"),
                F.col(f"__lo{i}").alias("min_str"),
                F.col(f"__hi{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")
