"""Generic format-aware readers/writers: parquet, CSV, JSON, ORC.

The reference has no disk format at all (its store is an ephemeral
in-memory matrix — SURVEY.md §1.3); this engine's tables are durable
files, and a pipeline's edges are rarely parquet-only: raw crawls land
as JSONL, exports leave as CSV. These helpers are deliberately THIN —
Spark's `DataFrameReader`/`DataFrameWriter` already do the work — and
exist to pin the engine-wide defaults every call site should share:

* schema is explicit whenever the format cannot carry one (CSV/JSON
  inference is a full extra pass over the data at 100 TB — callers get
  it only by explicitly passing ``schema=None`` AND ``infer=True``);
* corrupt records quarantine into ``_corrupt_record`` (PERMISSIVE)
  instead of killing the job — the hygiene operators filter them;
* writers default to snappy parquet, the engine's canonical at-rest
  format; CSV/JSON writes are for *exports*, partitioned the same way.

Paths may be any Hadoop-FS URL (hdfs://, s3a://, file:) — nothing here
touches the local filesystem directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["infer_format", "read_any", "write_any"]

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def infer_format(path: str) -> str:
    """Format from the path extension; parquet when ambiguous (the
    engine's canonical at-rest format)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    return _EXT_FORMAT.get(ext, "parquet")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    infer: bool = False,
    **options,
) -> DataFrame:
    """Read ``path`` in ``fmt`` (inferred from the extension when not
    given). Schemaless formats (csv/json) REQUIRE either an explicit
    ``schema`` or ``infer=True`` — silent full-data inference scans are
    a 100 TB footgun, so the choice is forced at the call site.

    CSV defaults: ``header=true``; TSV extension sets ``sep='\\t'``.
    Malformed rows land in ``_corrupt_record`` when the schema declares
    it (PERMISSIVE mode — Spark's default — never FAILFAST here).
    """
    fmt = fmt or infer_format(path)
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        if path.rstrip("/").endswith(".tsv"):
            options.setdefault("sep", "\t")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        if not infer:
            raise ValueError(
                f"{fmt} has no embedded schema: pass schema=... or infer=True "
                "(inference is a full extra pass over the data)"
            )
        options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (inferred from the extension
    when not given). Parquet stays snappy-compressed (the default);
    CSV exports get headers."""
    fmt = fmt or infer_format(path)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
        if path.rstrip("/").endswith(".tsv"):
            options.setdefault("sep", "\t")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).options(**options).save(path)
