"""Bucketed table layout: shuffle-free co-located joins.

The single biggest shuffle at 100 TB is the fact⋈fact join (e.g.
lineitem ⋈ orders on orderkey): both sides re-hash across the cluster
every query. Bucketing pays that shuffle ONCE at write time —
``bucketBy(n, key)`` hash-splits each side into the same ``n`` bucket
files per partition — and every later equi-join on the key reads
matching buckets directly: the plan has NO Exchange on either side
(asserted in tests/test_bucketed.py via the physical plan), only the
per-bucket sort the merge join needs (also gone if written with
``sortBy``).

Choosing ``n_buckets``: a divisor-friendly count ≥ the cluster's
parallelism target, sized so one bucket of the larger table fits an
executor's memory comfortably (e.g. 100 TB / 4096 buckets ≈ 25 GB per
bucket pre-compression — scan-streamable). Both join sides MUST use
the same bucket count and key for the co-location to hold.

The reference has no storage layer at all (in-memory matrices,
SURVEY.md §1.3), so this is pure extension territory: the Spark-native
answer to "make the big join cheap", alongside the ANN index's
partition pruning (ann_index.py) which answers "make the point read
cheap".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. ``path`` makes it an external table at that location
    (keeps test scratch out of the warehouse dir); bucketed tables must
    go through ``saveAsTable`` — the bucket metadata lives in the
    catalog, which is how later reads know scans are pre-hashed."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    # reading back is just spark.table(table): Catalyst sees the bucket
    # spec satisfy an equi-join's required distribution and plans a
    # zero-Exchange sort-merge join — no repartition call anywhere.
