"""Partition-shape helpers.

Scan parallelism in Spark is bounded by the source's split count
(parquet row groups × files). The driver's local testdata writes each
table as ONE row group, so a scan is a single task and any per-row
compute-heavy stage (md5 hashing, shingling, embedding) runs on one
core of 32. A real 100 TB table has thousands of row groups and never
hits this; ``fan_out`` repairs the local case only — it is a no-op
whenever the input already has enough partitions, so it is safe to
leave in production operator paths.

Scan-dominated stages (plain filters/aggregates) should NOT fan out:
round-robin shuffling wide rows costs more than the serial scan saves
(measured at sf0.1: pricing_summary 0.38 s → 0.86 s with a blanket
catalog-level repartition). Only stages whose per-row CPU work dwarfs a
row copy qualify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fan_out", "salted_agg", "skew_report"]


def _plan_partitions(df: DataFrame) -> int | None:
    """Partition count of the *planned* (pre-adaptive) physical plan.

    ``df.rdd.getNumPartitions()`` would finalize AQE query stages —
    which can EXECUTE upstream shuffle subtrees at plan-build time
    (measured: ``fan_out`` inside the curation composite re-ran the
    dedup join/window). ``sparkPlan().execute()`` bypasses the AQE
    wrapper and only *builds* the (lazy) RDD — file listing but no
    job, no stage execution. Returns None if the probe fails (exotic
    plan nodes), in which case the caller leaves the frame untouched.
    """
    try:
        return df._jdf.queryExecution().sparkPlan().execute().getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return None


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_parts`` (default: cluster
    default parallelism) — no-op when the plan already has that many
    partitions. Plan-time check only; no job is triggered (the probe
    deliberately bypasses AQE, see :func:`_plan_partitions`)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    n = _plan_partitions(df)
    if n is None or n >= target:
        return df
    return df.repartition(target)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    A hot key (one group holding a large fraction of all rows) makes
    one reducer the straggler of a plain ``groupBy``. Salting splits
    every group into ``n_salts`` subgroups for the first (heavy)
    shuffle, then merges the tiny partials in a second shuffle of at
    most ``n_salts`` rows per group:

        groupBy(keys + salt).agg(partial) → groupBy(keys).agg(merge)

    ``aggs`` maps output column → (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} — the algebraic aggregates whose
    partials merge exactly (count merges by sum). avg = sum/count at
    the call site. ``salt_on`` defaults to a deterministic hash of all
    columns (salt must only spread rows, any value works); pass a
    Column (e.g. ``F.col('event_id')``) to pin determinism explicitly.

    Spark's AQE skew handling covers *join* skew at runtime; aggregate
    skew with a truly hot key still benefits from explicit salting
    because the map-side partial agg for the hot group is bounded by
    partition count, while the shuffled partials per group go from
    #map-partitions to n_salts.
    """
    allowed = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"{out}: fn must be one of {sorted(allowed)} (mergeable)")
    salt = (
        F.pmod(salt_on.cast("long"), F.lit(n_salts))
        if salt_on is not None
        else F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    )
    partial_exprs = []
    merge_exprs = []
    for out, (col, fn) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            merge_exprs.append(F.min(p).alias(out))
        else:
            partial_exprs.append(F.max(col).alias(p))
            merge_exprs.append(F.max(p).alias(out))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostic: the ``top_n`` heaviest key values
    with their row counts, share of the table, and the ratio to a
    perfectly uniform key (the number AQE's skew-join threshold and a
    salting decision actually need — "is the hottest key X× the
    mean?").

    One groupBy on the key (the same shuffle the troubled join/agg
    would do, but carrying only counts) + two scalar aggregates
    broadcast back. Run it BEFORE shipping a new join at 100 TB; gate
    ``salted_agg``/``max_bucket_size`` decisions on its output instead
    of guessing.

    Returns ``top_n`` rows: ``(key..., n_rows, share, skew_ratio)``
    ordered by count desc (ties: key asc, deterministic).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
            (
                F.col("n_rows")
                / (F.col("__total") / F.col("__n_keys").cast("double"))
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(top_n)
    )
