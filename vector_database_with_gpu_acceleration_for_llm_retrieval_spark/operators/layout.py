"""Z-order (Morton-curve) data layout: multi-dimensional clustering so
file/row-group min-max statistics prune scans on EITHER dimension.

Sorting a 100 TB table by one column makes parquet zone maps razor-sharp
on that column and useless on every other; interleaving the bits of two
columns into one z-value and range-partitioning + sorting on it bounds
BOTH columns within every file — a filter on either key skips most of
the table at planning time (the same trick Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``; Databricks' engine and Iceberg's z-ordering are
the public art). The curve math is pure integer bit-mixing, so it runs
JVM-side in whole-stage codegen and mirrors exactly into any engine —
the DuckDB oracle computes bit-identical z-values.

Nothing here shuffles more than once: ``zorder_value`` is a projection;
:func:`zorder_stats` is one groupBy on the bucket prefix;
:func:`write_zorder` is one range exchange + in-partition sort (the
cheapest total order Spark offers) straight into the writer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_stats", "write_zorder", "compaction_plan"]


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Morton code (x in even positions, y in odd):
    ``z = Σ_i x_i·4^i + 2·y_i·4^i`` — a single codegen-friendly integer
    expression, no UDF. Callers normalize to ``[0, 2^bits)`` first
    (``pmod``, rank, or fixed-point scale); ``bits ≤ 31`` keeps
    ``z < 2^62`` in BIGINT."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        terms.append(xb * F.lit(1 << (2 * i)) + yb * F.lit(1 << (2 * i + 1)))
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """The pruning report for a z-order layout: bucket rows by the top
    ``bucket_bits`` of their z-value (= the files a z-sorted write
    would produce) and show that EVERY bucket bounds BOTH dimensions —
    ``x_span``/``y_span`` each ≈ 2^(bits − bucket_bits/2), vs. one
    dimension unbounded under a single-column sort. This is the
    decide-before-you-rewrite probe: run it, read the spans, and only
    pay the :func:`write_zorder` rewrite when the spans (⇒ skip rates)
    justify it.

    Inputs are normalized with ``pmod(·, 2^bits)`` so any integer key
    works. One partial-agged groupBy onto ≤ 2^bucket_bits rows; the
    z-value itself is a pure projection. Returns
    ``(bucket, n_rows, x_min, x_max, y_min, y_max, x_span, y_span)``.
    """
    # bucket_bits > 2*bits would make the shift count negative (the JVM
    # masks shifts & 63 → garbage bucket ids); ≤ 0 is equally meaningless
    if not 1 <= bucket_bits <= 2 * bits:
        raise ValueError(
            f"bucket_bits must be in [1, 2*bits={2 * bits}], got {bucket_bits}"
        )
    m = 1 << bits
    x = F.pmod(F.col(x_col).cast("long"), F.lit(m))
    y = F.pmod(F.col(y_col).cast("long"), F.lit(m))
    z = zorder_value(x, y, bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.select(bucket.alias("bucket"), x.alias("__x"), y.alias("__y"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
        .select(
            "bucket",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
        )
        .orderBy("bucket")
    )


def write_zorder(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Rewrite ``df`` as parquet clustered on the z-curve of
    ``(x_col, y_col)``: one range exchange on the z-value into
    ``num_files`` partitions, an in-partition sort, and a plain write —
    after which parquet row-group min/max stats prune filters on EITHER
    column. The z column is computed, used for placement, and dropped;
    the data is byte-identical, only laid out differently. Size
    ``num_files`` so each file lands near the table's target file size
    (the usual 128 MB–1 GB band at scale)."""
    m = 1 << bits
    x = F.pmod(F.col(x_col).cast("long"), F.lit(m))
    y = F.pmod(F.col(y_col).cast("long"), F.lit(m))
    (
        df.withColumn("__z", zorder_value(x, y, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    id_col: str,
    size_col: str,
    key_cols: list[str],
    target_bytes: int,
    small_threshold: int | None = None,
) -> DataFrame:
    """Small-file compaction planning: the lakehouse maintenance step
    that bins sub-threshold files into ~``target_bytes`` rewrite
    groups, per table partition.

    Streaming sinks and fine-grained partitioning litter object
    storage with files far below the scan-efficient size; compaction
    jobs periodically rewrite them into target-sized files. The PLAN —
    which files rewrite together — is computed declaratively with
    next-fit-by-offset binning: within each partition, files order
    deterministically by id, and a file's group is
    ``floor(start_offset / target)`` where ``start_offset`` is the
    running size cumsum BEFORE the file. Pure window math — no greedy
    driver loop — at the cost of the standard next-fit slack (a group
    may overrun ``target`` by at most one file, so groups average
    ``target + avg_size/2``; first-fit-decreasing packs ~1% tighter
    but is inherently sequential).

    Files at/above ``small_threshold`` (default: ``target_bytes``) are
    already fine and pass through as ``action='keep'`` with a NULL
    group.  Scale shape: one window per partition key (per-partition
    file counts are bounded by retention, not data volume) — no global
    ordering, no collect; the plan frame is file-inventory-sized,
    orders of magnitude smaller than the data it describes.  Returns
    ``(*key_cols, id, size, action, grp, grp_bytes, grp_files)``.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if small_threshold is None:
        small_threshold = target_bytes
    small = F.col(size_col) < small_threshold
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.when(small, F.col(size_col))).over(w), F.lit(0)
    )
    planned = files.select(
        *key_cols,
        F.col(id_col),
        F.col(size_col),
        F.when(small, F.lit("compact")).otherwise(F.lit("keep")).alias("action"),
        F.when(small, F.floor(start / F.lit(target_bytes))).alias("grp"),
    )
    wg = Window.partitionBy(*key_cols, "grp")
    return planned.select(
        *key_cols,
        id_col,
        size_col,
        "action",
        "grp",
        F.when(small, F.sum(size_col).over(wg)).alias("grp_bytes"),
        F.when(small, F.count(F.lit(1)).over(wg)).alias("grp_files"),
    )
