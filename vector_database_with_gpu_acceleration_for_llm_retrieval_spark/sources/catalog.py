"""Table catalog over the driver's parquet testdata.

The reference has no storage layer at all (in-memory matrices,
SURVEY.md §1.3); our source layer is columnar parquet — Catalyst gets
predicate pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make any caller-provided SparkSession able to run this catalog's
    queries deterministically — both confs are runtime-settable:

    * ``nanosAsLong``: the events parquet stores TIMESTAMP(NANOS), which
      Spark rejects outright without it (the driver's harness builds its
      OWN session, not ours, so relying on session.py alone would break
      every events query there);
    * UTC session timezone: calendar extractions (year/month, window
      starts) must not shift with the host timezone, or date-part
      results diverge from the oracle for midnight-boundary rows.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf locked down: proceed as-is
        pass


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one table. ``events`` needs special handling: the parquet
    stores TIMESTAMP(NANOS), which Spark 4.x rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py).
    With that flag ``ts`` arrives as a long of nanoseconds; we keep it
    as ``ts_ns`` (exact, for integer-arithmetic oracle queries) and
    derive ``ts`` as a microsecond timestamp via integer division —
    exactly the truncation DuckDB applies when it reads the same file,
    so both engines see identical microsecond values.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) file read under nanosAsLong: keep the
            # exact nanos and derive the microsecond timestamp.
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type and ts_type.startswith("timestamp"):
            # TIMESTAMP(MICROS) file: synthesize the nanos column so
            # integer-arithmetic consumers (ts_ns div ...) keep working;
            # micros*1000 is exactly what DuckDB's epoch_ns(ts) yields
            # for the same file. A file with isAdjustedToUTC=false
            # arrives as TIMESTAMP_NTZ; the session is pinned to UTC
            # (above), so the cast to TIMESTAMP is an exact
            # reinterpretation matching DuckDB's naive-as-UTC epoch.
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
    return df


class LazyCatalog(dict):
    """Mapping table-name → DataFrame that reads each parquet on first
    access, so one unreadable file cannot take down unrelated queries."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        df = load_table(self._spark, name, self._sf_dir)
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Lazy by default: tables are read on first access. Pass ``names``
    to eagerly materialize a specific subset."""
    if names is not None:
        return {n: load_table(spark, n, sf_dir) for n in names}
    return LazyCatalog(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works over
    the same names the DuckDB oracle uses. Skips (but reports) tables
    that fail to read instead of failing the whole catalog."""
    import sys

    for name in names or TABLES:
        try:
            load_table(spark, name, sf_dir).createOrReplaceTempView(name)
        except Exception as exc:  # pragma: no cover - defensive
            print(f"register_views: skipping {name}: {exc}", file=sys.stderr)
