"""Clustered table layout: sort-order as an index (zone-map skipping).

Partition pruning (ann_index.py) and bucketing (bucketed.py) cover
point lookups on low-cardinality keys; the third pruning lever — the
one that works for RANGE predicates on high-cardinality columns — is
physical sort order. Parquet stores per-row-group and per-file min/max
statistics for every column; when the data is written clustered on a
key, those ranges are narrow and near-disjoint, so a pushed-down
filter lets readers skip whole files/row groups by footer alone
(classic zone maps / small materialized aggregates, Moerkotte VLDB'98).
Unclustered, every file spans the whole key domain and nothing skips.

``write_clustered`` is the write-side move:

* ``repartitionByRange(cols)`` — one range shuffle puts disjoint key
  ranges in disjoint partitions (Spark samples the key distribution,
  so skew balances automatically);
* ``sortWithinPartitions(cols)`` — orders rows inside each file so
  row-group stats within a file are tight too;
* ``maxRecordsPerFile`` — bounds file size so the skipping unit stays
  fine-grained as partitions grow.

At 100 TB: cluster the fact table on its dominant filter column
(event time, tenant id) at write/compaction time; every later scan
with a range predicate on that column reads only the overlapping
files. This composes with ``partitionBy`` (coarse pruning) — cluster
WITHIN each partition on the secondary key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_clustered"]


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    n_partitions: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on ``cols``: range-partitioned
    and sorted so per-file/per-row-group min-max stats are tight and a
    pushed-down range filter on ``cols`` skips non-overlapping files.

    ``partition_by`` optionally adds directory-level partitioning on
    top (cluster keys must not overlap partition keys — directory
    pruning already handles those exactly). ``n_partitions`` pins the
    range-shuffle width (→ minimum file count); leave None to let AQE
    size partitions by bytes — note AQE may coalesce a small table into
    few files, so pin it when a specific skipping granularity matters.
    """
    if partition_by and set(partition_by) & set(cols):
        raise ValueError("cluster cols and partition_by must be disjoint")
    if n_partitions is not None:
        out = df.repartitionByRange(n_partitions, *cols)
    else:
        out = df.repartitionByRange(*cols)
    out = out.sortWithinPartitions(*cols)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
