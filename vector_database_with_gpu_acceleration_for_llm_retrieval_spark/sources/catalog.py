"""Table catalog over the driver's parquet testdata.

The reference has no storage layer at all (in-memory matrices,
SURVEY.md §1.3); our source layer is columnar parquet — Catalyst gets
predicate pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works over
    the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
