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

The built-in forms (``approx_count_distinct``, ``percentile_approx``)
cannot hash-match a DuckDB oracle (different engines ship different
sketch implementations, approximation values diverge by design), so
their gate is error-bound tests vs the exact operators
(tests/test_sketches.py) rather than an ``oracle_sql`` mirror — the
same reason the driver contract keeps the exact forms as the checked
entries.

Two sketches here ARE oracle-paired, by construction:

- :func:`hll_distinct` re-implements classic HyperLogLog (Flajolet et
  al. 2007) on the repo's portable 60-bit md5 hash with an
  integer-exact register sum, so Spark and the DuckDB mirror compute
  bit-identical registers and (after the repo-standard 6-dp rounding)
  identical estimates.
- :func:`frequent_items` is collide-then-verify: mergeable
  Misra-Gries partition summaries propose a guaranteed-superset
  candidate set, then an exact broadcast-semi-join count keeps only
  true ≥ N/k heavy hitters — the OUTPUT is exact, so the plain
  GROUP-BY/HAVING SQL is a legitimate oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct_counts",
    "approx_quantiles",
    "hll_register_updates",
    "hll_estimate_from_registers",
    "hll_distinct",
    "hll_sliding_distinct",
    "hll_sliding_from_registers",
    "frequent_items",
    "frequent_items_grouped",
    "qsketch_bucket",
    "qsketch_bounds",
    "qsketch_updates",
    "qsketch_sliding_quantiles",
    "qsketch_sliding_from_counts",
    "qsketch",
    "qsketch_quantiles",
    "qsketch_grouped",
    "hll_grouped",
    "cm_updates",
    "cm_sketch",
    "cm_lookup",
    "kmv_sketch",
    "kmv_overlap",
    "cm_join_size",
    "qsketch_weighted",
    "bloom_build",
    "bloom_prune",
]


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


def hll_rho(rest: Column, width: int) -> Column:
    """Position of the first set bit (from the top) of a ``width``-bit
    word + 1 — the HyperLogLog ρ. Exact integer CASE chain (no
    ``log2``: libm rounding differs across engines; a branch compare
    does not). ``rest == 0`` → ``width + 1``."""
    expr = F.when(rest == 0, F.lit(width + 1))
    for b in range(width, 0, -1):  # bit length b → rho = width+1-b
        expr = expr.when(rest >= (1 << (b - 1)), F.lit(width + 1 - b))
    return expr


def hll_register_updates(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Per-row HLL register updates ``(idx, rho)`` from the portable
    60-bit md5 hash of ``col`` — the mergeable half of
    :func:`hll_distinct`. Registers fold by ``max(rho) per idx``, a
    commutative-monoid measure, so this frame feeds
    ``incremental.partial_agg``/``merge_rollup`` and
    ``stream_rollup_maintenance`` directly (``measures={"rho":
    ("max", "rho")}``): a continuously-maintained distinct-count
    sketch at |batch| + 2^p cost per refresh, no history re-scan."""
    from ..functions.text import portable_token_hash

    w = 60 - p
    h = portable_token_hash(F.col(col).cast("string"))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    return df.select(
        F.shiftright(h, w).alias("idx"), hll_rho(rest, w).alias("rho")
    )


def hll_estimate_from_registers(regs: DataFrame, p: int = 8) -> DataFrame:
    """Classic-HLL estimate from a ``(idx, rho)`` register table (at
    most one row per idx — e.g. the output of a max-merge rollup).
    One aggregate over ≤ 2^p rows; integer-exact indicator sum, one
    IEEE division, small-range ``ln`` correction. Returns one row
    ``(p, m, nonzero, z_scaled, raw_estimate, estimate)``, estimates
    unrounded."""
    m, w = 1 << p, 60 - p
    # 2^(w+1-rho) is exact in a double for exponents ≤ 53 (w+1 ≤ 53 ∀ p ≥ 8)
    contrib = F.pow(F.lit(2.0), F.lit(w + 1) - F.col("rho")).cast("long")
    sk = regs.agg(
        F.count(F.lit(1)).alias("nonzero"),
        # coalesce: sum over zero rows is NULL; an empty register table
        # is the empty sketch (all registers 0) whose estimate must be 0,
        # not a NULL that propagates through the small-range CASE
        F.coalesce(F.sum(contrib), F.lit(0)).alias("__z_filled"),
    ).select(
        "nonzero",
        (
            F.col("__z_filled") + (F.lit(m) - F.col("nonzero")) * F.lit(1 << (w + 1))
        ).alias("z_scaled"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) * F.lit(float(1 << (w + 1))) / F.col("z_scaled")
    empty = F.lit(m) - F.col("nonzero")
    est = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return sk.select(
        F.lit(p).alias("p"),
        F.lit(m).alias("m"),
        "nonzero",
        "z_scaled",
        raw.alias("raw_estimate"),
        est.alias("estimate"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Classic HyperLogLog (Flajolet et al. 2007) over the portable
    60-bit md5 hash — a distinct-count sketch whose registers are
    BIT-IDENTICAL across engines, so unlike ``approx_count_distinct``
    it hash-matches a DuckDB mirror exactly.

    Layout: top ``p`` hash bits pick one of ``m = 2^p`` registers, the
    remaining ``w = 60 - p`` bits feed ρ (leading-zero count + 1,
    exact CASE chain — see :func:`hll_rho`); each register keeps
    ``max ρ``. The indicator ``Z = Σ 2^-ρ`` is carried as the INTEGER
    ``z_scaled = Σ 2^(w+1-ρ)`` (empty registers contribute
    ``2^(w+1)``; ≤ m·2^(w+1) = 2^61 < 2^63, no overflow) so the only
    float ops are one IEEE-exact division and the small-range ``ln``
    — both deterministic to well past the repo's 6-dp rounding.
    Small-range correction: ``m·ln(m/V)`` when ``raw ≤ 2.5m`` and
    empty registers exist; the 64-bit large-range correction is
    unreachable below ~10^17 distincts and omitted.

    Scale shape: ONE map-side-combinable groupBy onto ≤ m rows — the
    shuffle carries registers, not keys. Registers merge by per-index
    max, so partition sketches / day sketches union for free; this is
    the mergeable path `distinct_user_counts` points at for 100 TB.
    Returns one row ``(p, m, nonzero, z_scaled, raw_estimate,
    estimate, exact_distinct, rel_err)`` (exact count joined in for
    the error report — drop it in production, it is the expensive
    two-phase distinct the sketch replaces).
    """
    regs = (
        hll_register_updates(df, col, p)
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    sk = hll_estimate_from_registers(regs, p)
    exact = df.agg(F.count_distinct(col).alias("exact_distinct"))
    raw, est = F.col("raw_estimate"), F.col("estimate")
    return (
        sk.crossJoin(F.broadcast(exact))
        .select(
            "p",
            "m",
            F.col("nonzero").cast("long").alias("nonzero"),
            F.col("z_scaled").cast("long").alias("z_scaled"),
            F.round(raw, 6).alias("raw_estimate"),
            F.round(est, 6).alias("estimate"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
    )


def frequent_items(
    df: DataFrame, col: str, k: int = 100, cap: int | None = None
) -> DataFrame:
    """EXACT heavy hitters (frequency ≥ N/k) by collide-then-verify:
    bounded-memory Misra-Gries summaries per partition propose
    candidates, an exact count over the candidate set keeps the true
    hitters — never a full-key-set shuffle.

    Phase 1 (mapInPandas, one pass): each partition folds batch
    ``value_counts`` into a dict, shrinking after each batch; between
    shrinks the dict holds at most cap + the batch's distinct count
    (Arrow-batch-bounded). The shrink subtracts the (cap+1)-th largest
    count from all entries and keeps the positive remainder (the weighted Misra-Gries shrink: every shrink
    removes ≥ (cap+1)·s total mass, so any item's undercount is
    ≤ N_p/(cap+1)). An item with global frequency ≥ N/k has, by
    pigeonhole, local frequency ≥ N_q/k in some partition q, and with
    ``cap = 2k`` (default) ``N_q/k > N_q/(cap+1)`` — it survives q's
    summary. The candidate union is therefore a guaranteed SUPERSET of
    the true hitters, of size ≤ partitions·cap (KBs, broadcastable).

    Phase 2: broadcast-semi-join the corpus on the candidates, exact
    count, keep ``n·k ≥ N`` (integer compare, no float threshold).
    False positives die here, so the OUTPUT equals the plain
    GROUP-BY/HAVING over the full data — which is exactly the oracle —
    while the corpus-sized work is one scan + one candidate-key-only
    aggregate. Returns ``(item, n_rows, share)``, heaviest first.
    """
    capn = int(cap if cap is not None else 2 * k)
    if capn < k:
        raise ValueError(f"cap ({capn}) must be >= k ({k}) for the superset guarantee")
    src = df.select(F.col(col).cast("string").alias("item"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts(dropna=False).items():
                key = None if (item is None or item != item) else item
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > capn:
                vals = sorted(counts.values(), reverse=True)
                s = vals[capn]  # the (cap+1)-th largest
                counts = {i: c - s for i, c in counts.items() if c > s}
        yield pd.DataFrame({"item": pd.array(list(counts.keys()), dtype="object")})

    cand = src.mapInPandas(mg, schema="item string").distinct()
    tot = src.agg(F.count(F.lit(1)).alias("__n"))
    # leftsemi on eqNullSafe: a frequent NULL candidate must still match
    # its NULL source rows (a null-unsafe equi-join would drop the NULL
    # group that plain GROUP BY/HAVING keeps, breaking the oracle claim)
    return (
        src.join(
            F.broadcast(cand), src["item"].eqNullSafe(cand["item"]), "leftsemi"
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_rows") * k >= F.col("__n"))
        .select(
            "item",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("__n"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc_nulls_first("item"))
    )


# ---------------------------------------------------------------------------
# portable mergeable quantile sketch (completes the HLL / Misra-Gries trio)
# ---------------------------------------------------------------------------


def _bitlen_minus1(u: Column) -> Column:
    """floor(log2(u)) for a positive BIGINT column as an exact integer
    CASE chain (the :func:`hll_rho` trick — no float log whose last ulp
    could differ between engines and flip a boundary value's bucket)."""
    expr = F.when(u >= F.lit(1 << 62), F.lit(62))
    for b in range(61, 0, -1):
        expr = expr.when(u >= F.lit(1 << b), F.lit(b))
    return expr.otherwise(F.lit(0))


def qsketch_bucket(v: Column, m: int = 7) -> Column:
    """Map a BIGINT value to its quantile-sketch bucket id: a base-2
    sub-bucketed histogram key (the DDSketch idea — Masson et al.,
    VLDB 2019 — rebuilt on integer-exact arithmetic so the state is
    bit-reproducible across engines, which float ``log_gamma`` bucket
    mappings cannot be).

    For ``u = |v| ≥ 1`` with ``e = floor(log2 u)``: the top ``m`` bits
    after the leading bit pick a sub-bucket
    ``sub = floor(u·2^m / 2^e) − 2^m ∈ [0, 2^m)`` (a pure shift either
    direction), and ``bucket = sign(v)·(e·2^m + sub + 1)``; ``v = 0``
    maps to bucket 0. The id is MONOTONE in ``v``, so rank selection
    over bucket ids is rank selection over values, and every bucket
    spans a relative value range ≤ 2^−m — the sketch's error
    guarantee. Values with ``|v| < 2^m`` get a bucket to themselves
    (exact small-value quantiles). Deterministic for every input: no
    ties to break, no randomness, no merge-order sensitivity — unlike
    KLL/GK, whose compaction schedule depends on arrival order and so
    can never hash-match across engines.

    LONG_MIN is saturated to ``−(2^63−1)`` before bucketing:
    ``abs(−2^63)`` overflows back to −2^63 under JVM two's-complement
    semantics and would mis-bucket. Unreachable from the scaled-double
    entry points (``floor(x·scale + 0.5)`` cannot produce it), but the
    raw BIGINT API is public, so the clamp is explicit — one value at
    the extreme absorbs into its neighbor's bucket."""
    v = F.when(v == F.lit(-(1 << 63)), F.lit(-((1 << 63) - 1))).otherwise(v)
    u = F.abs(v)
    e = _bitlen_minus1(u)
    sub = (
        F.when(
            e >= m, F.call_function("shiftright", u, e - F.lit(m))
        ).otherwise(F.call_function("shiftleft", u, F.lit(m) - e))
        - F.lit(1 << m)
    )
    code = (e * F.lit(1 << m) + sub + F.lit(1)).cast("long")
    return (
        F.when(v == 0, F.lit(0).cast("long"))
        .when(v > 0, code)
        .otherwise(-code)
    )


def qsketch_bounds(bucket: Column, m: int = 7, scale: int = 1) -> tuple[Column, Column]:
    """Inclusive integer value bounds ``[lo, hi]`` covered by a bucket
    id, unscaled to doubles by ``scale`` (both divisions of exact
    integers — deterministic IEEE). The inverse of
    :func:`qsketch_bucket`: ``hi − lo < lo·2^−m``, so the midpoint
    estimates any value in the bucket to relative error ≤ 2^−(m+1)."""
    c = F.abs(bucket) - F.lit(1)
    e = F.shiftright(c, m)
    base = c.bitwiseAND(F.lit((1 << m) - 1)) + F.lit(1 << m)
    lo_pos = F.when(
        e >= m, F.call_function("shiftleft", base, e - F.lit(m))
    ).otherwise(F.call_function("shiftright", base, F.lit(m) - e))
    width = F.when(
        e >= m, F.call_function("shiftleft", F.lit(1).cast("long"), e - F.lit(m))
    ).otherwise(F.lit(1).cast("long"))
    hi_pos = lo_pos + width - F.lit(1)
    lo_i = (
        F.when(bucket == 0, F.lit(0).cast("long"))
        .when(bucket > 0, lo_pos)
        .otherwise(-hi_pos)
    )
    hi_i = (
        F.when(bucket == 0, F.lit(0).cast("long"))
        .when(bucket > 0, hi_pos)
        .otherwise(-lo_pos)
    )
    s = F.lit(float(scale))
    return (lo_i / s).alias("lo"), (hi_i / s).alias("hi")


def qsketch_updates(
    df: DataFrame, col: str, m: int = 7, scale: int = 1
) -> DataFrame:
    """Per-row sketch updates ``(bucket, cnt=1)`` — the mergeable half
    of :func:`qsketch`. ``scale`` fixes the decimal point before
    integer bucketing (100 for 2-decimal prices); the scaled double →
    integer step is ``floor(x·scale + 0.5)`` — round-half-up built
    from two exact IEEE ops, identical in both engines (engine-native
    ``round`` differs: Spark HALF_UP vs banker's variants elsewhere).

    Buckets fold by ``sum(cnt) per bucket`` — a commutative-monoid
    measure, so this frame feeds ``incremental.partial_agg`` /
    ``incremental_agg`` and ``stream_rollup_maintenance`` directly
    (``measures={"cnt": ("sum", "cnt")}``): a continuously-maintained
    quantile sketch at |batch| + |buckets| cost per refresh. NULLs are
    dropped (a quantile over NULL is undefined in both engines)."""
    v = (
        F.col(col).cast("long")
        if scale == 1
        else F.floor(F.col(col).cast("double") * scale + F.lit(0.5)).cast("long")
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(qsketch_bucket(v, m).alias("bucket"))
        .withColumn("cnt", F.lit(1).cast("long"))
    )


def qsketch_weighted(
    df: DataFrame,
    col: str,
    weight_col: str,
    quantiles: list[float],
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """WEIGHTED quantiles from the sketch: each row contributes
    ``weight_col`` units of mass instead of 1, so rank selection runs
    over weight mass — "the document length below which half the
    corpus TOKENS live", the mass-weighted question batch sizing and
    mixture budgeting actually ask. Integer weights keep the whole
    state integer-exact (same portability as :func:`qsketch`);
    null/non-positive weights are excluded. Same plan shape: one
    map-side-combined groupBy onto ≤63·2^m buckets, rank scan on the
    sketch frame. Returns ``(q, rank, bucket, lo, hi, estimate)``
    with ``rank`` in weight units."""
    v = (
        F.col(col).cast("long")
        if scale == 1
        else F.floor(F.col(col).cast("double") * scale + F.lit(0.5)).cast("long")
    )
    w = F.col(weight_col).cast("long")
    buckets = (
        df.filter(F.col(col).isNotNull() & (w > 0))
        .select(qsketch_bucket(v, m).alias("bucket"), w.alias("cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("n_rows"))
    )
    return qsketch_quantiles(buckets, quantiles, m=m, scale=scale)


def qsketch(df: DataFrame, col: str, m: int = 7, scale: int = 1) -> DataFrame:
    """One-shot quantile sketch: the bucket/count state table
    ``(bucket, n_rows, lo, hi)``, heaviest machinery being ONE
    map-side-combined groupBy onto ≤ 63·2^m keys (≤ ~8k rows at m=7;
    like the HLL register fold, the shuffle carries the sketch, never
    the data — the 100 TB shape). State is bit-identical to the DuckDB
    mirror running the same integer CASE-chain mapping, so the whole
    sketch hash-matches, not just its error band."""
    upd = qsketch_updates(df, col, m, scale)
    lo, hi = qsketch_bounds(F.col("bucket"), m, scale)
    return (
        upd.groupBy("bucket")
        .agg(F.sum("cnt").alias("n_rows"))
        .select("bucket", "n_rows", lo, hi)
        .orderBy("bucket")
    )


def qsketch_quantiles(
    buckets: DataFrame,
    quantiles: list[float],
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """Quantile estimates from a ``(bucket, n_rows)`` sketch state
    table. Rank rule: the value at rank ``r = max(1, ceil(q·N))`` (the
    classic lower empirical quantile) lies in the first bucket whose
    cumulative count reaches ``r``; the bucket's ``[lo, hi]`` brackets
    the TRUE quantile and the midpoint estimates it to relative error
    ≤ 2^−(m+1) (m=7 → 0.4%). All arithmetic deterministic: ``q·N`` is
    one IEEE multiply of the same literals in both engines, the
    cumulative window and min-bucket pick are integer. The window runs
    UNPARTITIONED by design — on the ≤8k-row sketch state, never the
    data. Returns ``(q, rank, bucket, lo, hi, estimate)``."""
    from pyspark.sql import Window

    spark = buckets.sparkSession
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    tot = buckets.agg(F.sum("n_rows").alias("__n"))
    cum = buckets.select(
        "bucket",
        F.sum("n_rows")
        .over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )
    ranks = qf.crossJoin(F.broadcast(tot)).select(
        "q", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n"))).alias("rank")
    )
    picked = (
        cum.join(F.broadcast(ranks), F.col("__cum") >= F.col("rank"))
        .groupBy("q", "rank")
        .agg(F.min("bucket").alias("bucket"))
    )
    lo, hi = qsketch_bounds(F.col("bucket"), m, scale)
    return (
        picked.select("q", "rank", "bucket", lo, hi)
        .select(
            "q", "rank", "bucket", "lo", "hi",
            ((F.col("lo") + F.col("hi")) / F.lit(2.0)).alias("estimate"),
        )
        .orderBy("q")
    )


def qsketch_grouped(
    df: DataFrame,
    keys: list[str],
    col: str,
    quantiles: list[float],
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """Per-group quantiles from per-group sketch states — the scale
    path for "p50/p95/p99 per tenant/day/segment" where exact
    per-group sorts die. One map-side-combined groupBy onto
    ``groups × ≤63·2^m`` bucket rows, then the rank scan runs per
    group on sketch-sized frames (the window partitions by the group
    keys, so no single-partition stage regardless of group count —
    the opposite failure mode of the ungrouped sketch's deliberate
    unpartitioned ≤8k-row window). Same integer-exact portable bucket
    mapping as :func:`qsketch`; same ≤ 2^−(m+1) relative-error
    midpoint. Returns ``(*keys, q, rank, bucket, lo, hi, estimate)``.
    """
    upd = (
        df.filter(F.col(col).isNotNull())
        .select(
            *keys,
            qsketch_bucket(
                F.col(col).cast("long")
                if scale == 1
                else F.floor(F.col(col).cast("double") * scale + F.lit(0.5)).cast(
                    "long"
                ),
                m,
            ).alias("bucket"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return _quantiles_from_keyed_state(upd, keys, quantiles, m, scale)


def _quantiles_from_keyed_state(
    state: DataFrame,
    keys: list[str],
    quantiles: list[float],
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """Per-key rank scan over keyed sketch state ``(*keys, bucket,
    n_rows)`` — the selection half shared by :func:`qsketch_grouped`
    and :func:`qsketch_sliding_from_counts`: per-key totals, per-key
    ordered bucket cumsum (partitioned by the keys, so every window
    frame is sketch-sized), the classic lower-empirical-quantile rank
    rule, midpoint estimates. Returns ``(*keys, q, rank, bucket, lo,
    hi, estimate)``."""
    from pyspark.sql import Window

    spark = state.sparkSession
    tot = state.groupBy(*keys).agg(F.sum("n_rows").alias("__n"))
    cum = state.select(
        *keys,
        "bucket",
        F.sum("n_rows")
        .over(
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("__cum"),
    )
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = tot.crossJoin(F.broadcast(qf)).select(
        *keys, "q",
        F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n"))).alias("rank"),
    )
    picked = (
        cum.join(
            ranks.withColumnRenamed("q", "__q").withColumnRenamed("rank", "__r"),
            [*keys],
        )
        .filter(F.col("__cum") >= F.col("__r"))
        .groupBy(*keys, "__q", "__r")
        .agg(F.min("bucket").alias("bucket"))
        .select(*keys, F.col("__q").alias("q"), F.col("__r").alias("rank"), "bucket")
    )
    lo, hi = qsketch_bounds(F.col("bucket"), m, scale)
    return (
        picked.select(*keys, "q", "rank", "bucket", lo, hi)
        .select(
            *keys, "q", "rank", "bucket", "lo", "hi",
            ((F.col("lo") + F.col("hi")) / F.lit(2.0)).alias("estimate"),
        )
        .orderBy(*keys, "q")
    )


def qsketch_sliding_quantiles(
    df: DataFrame,
    bucket_col: str,
    col: str,
    quantiles: list[float],
    trailing: int = 6,
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """Sliding-window quantiles from sketch states: for every time
    bucket, the estimated quantiles of ``col`` over the TRAILING
    ``trailing`` buckets — "p95 latency over the last 6 hours, hourly"
    — the :func:`hll_sliding_distinct` idea applied to the quantile
    trio (mergeability exploited in a WINDOW; an exact sliding
    quantile re-sorts every row ``trailing`` times).

    Per (time-bucket × sketch-bucket) counts from one map-side-combined
    groupBy, then :func:`qsketch_sliding_from_counts`. ``bucket_col``
    must be an integer bucket index (e.g. epoch-hours). Returns
    ``(bucket_ts, q, rank, bucket, lo, hi, estimate)``.
    """
    v = (
        F.col(col).cast("long")
        if scale == 1
        else F.floor(F.col(col).cast("double") * scale + F.lit(0.5)).cast("long")
    )
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(bucket_col).alias("bucket_ts"),
            qsketch_bucket(v, m).alias("bucket"),
        )
        .groupBy("bucket_ts", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return qsketch_sliding_from_counts(
        counts, quantiles, trailing=trailing, m=m, scale=scale
    )


def qsketch_sliding_from_counts(
    counts: DataFrame,
    quantiles: list[float],
    trailing: int = 6,
    m: int = 7,
    scale: int = 1,
) -> DataFrame:
    """The window+select half of :func:`qsketch_sliding_quantiles`,
    split out so a CONTINUOUSLY MAINTAINED count table — the generic
    ``stream_rollup_maintenance`` keyed on (bucket_ts, bucket) with the
    sum measure — serves live sliding percentiles with zero
    sliding-specific streaming code (the
    :func:`hll_sliding_from_registers` pattern; stream == batch
    pytest). ``counts`` is ``(bucket_ts, bucket, cnt)``, ≤ one row per
    pair.

    A dense (time-bucket × observed-sketch-bucket) spine keeps a
    bucket updated only in an EARLIER hour visible to the current
    window (the outer-join semantics a bare window over present rows
    would drop); the trailing merge is a per-sketch-bucket sum over a
    RANGE frame on the integer time bucket (range, not rows, so
    calendar gaps don't stretch the window). Every frame after the
    input is (times × ≤63·2^m) — sketch-sized, row-count independent.
    """
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    spine = counts.select("bucket_ts").distinct().crossJoin(
        counts.select("bucket").distinct()
    )
    dense = spine.join(counts, ["bucket_ts", "bucket"], "left")
    wnd = (
        Window.partitionBy("bucket")
        .orderBy("bucket_ts")
        .rangeBetween(-(trailing - 1), 0)
    )
    merged = dense.select(
        "bucket_ts",
        "bucket",
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(wnd).alias("n_rows"),
    ).filter(F.col("n_rows") > 0)
    return _quantiles_from_keyed_state(
        merged, ["bucket_ts"], quantiles, m, scale
    )


def hll_grouped(df: DataFrame, keys: list[str], col: str, p: int = 8) -> DataFrame:
    """Per-group portable HLL distinct counts — the bit-reproducible
    sibling of :func:`approx_distinct_counts` for "distinct users per
    segment/day" at scale: one map-side-combined groupBy onto
    ``groups × ≤2^p`` register rows, then one per-group aggregate over
    register-sized frames; the shuffle carries registers, never key
    sets. Same md5 layout, integer-exact indicator sum, and
    small-range correction as :func:`hll_distinct`, applied per group
    (empty groups can't occur — a group exists only via rows). Returns
    ``(*keys, nonzero, z_scaled, raw_estimate, estimate)``."""
    from ..functions.text import portable_token_hash

    m, w = 1 << p, 60 - p
    h = portable_token_hash(F.col(col).cast("string"))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    regs = (
        df.select(*keys, F.shiftright(h, w).alias("idx"), hll_rho(rest, w).alias("rho"))
        .groupBy(*keys, "idx")
        .agg(F.max("rho").alias("rho"))
    )
    contrib = F.pow(F.lit(2.0), F.lit(w + 1) - F.col("rho")).cast("long")
    sk = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(contrib).alias("__zf"),
    ).select(
        *keys,
        "nonzero",
        (F.col("__zf") + (F.lit(m) - F.col("nonzero")) * F.lit(1 << (w + 1))).alias(
            "z_scaled"
        ),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) * F.lit(float(1 << (w + 1))) / F.col("z_scaled")
    empty = F.lit(m) - F.col("nonzero")
    est = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return sk.select(
        *keys, "nonzero", "z_scaled", raw.alias("raw_estimate"), est.alias("estimate")
    ).orderBy(*keys)


def cm_updates(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Per-row Count-Min updates ``(r, cell, cnt=1)`` (Cormode &
    Muthukrishnan 2005): row ``r``'s cell is the portable md5 hash of
    ``"cm<r>:" || value`` mod ``width`` — salted per row, so the
    ``depth`` hash functions are independent-enough and BIT-IDENTICAL
    across engines. Cells fold by ``sum(cnt)`` per (r, cell) — the
    rollup-algebra/streaming measure, same as the quantile sketch."""
    c = F.col(col).cast("string")
    cells = F.array(
        *[
            F.pmod(
                _cm_hash(r, c),
                F.lit(width),
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.posexplode(cells).alias("r", "cell"))
        .withColumn("cnt", F.lit(1).cast("long"))
    )


def _cm_hash(r: int, c: Column) -> Column:
    from ..functions.text import portable_token_hash

    return portable_token_hash(F.concat(F.lit(f"cm{r}:"), c))


def cm_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-Min sketch state ``(r, cell, n)``: one map-side-combined
    groupBy onto ≤ depth·width rows — the shuffle carries the sketch,
    never the keys. Any point frequency reads back as
    ``min_r n[r][h_r(x)]`` (:func:`cm_lookup`): never an
    underestimate, over by ≤ e·N/width with prob ≥ 1 − e^−depth.
    The classic streaming-frequency structure, here as the portable
    fourth of the sketch family (HLL distinct / Misra-Gries heavy
    hitters / quantile histogram / CM point frequency)."""
    return (
        cm_updates(df, col, depth, width)
        .groupBy("r", "cell")
        .agg(F.sum("cnt").alias("n"))
    )


def cm_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for a key frame against a CM sketch
    state: compute each key's ``depth`` cells, join the (tiny,
    broadcast) sketch, take the per-key min — absent cells count 0.
    Returns ``(key_col, cm_estimate)``."""
    c = F.col(key_col).cast("string")
    cells = F.array(*[F.pmod(_cm_hash(r, c), F.lit(width)) for r in range(depth)])
    kc = keys.select(key_col, F.posexplode(cells).alias("r", "cell"))
    return (
        kc.join(F.broadcast(sketch), ["r", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_estimate"))
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV (k-minimum-values) sketch: the k SMALLEST distinct portable
    md5 hashes of ``col`` — a min-monoid set summary, so sketches of
    any two partitions/tables union into the sketch of their union
    (just re-take the bottom k), giving distinct counts AND set
    overlaps (:func:`kmv_overlap`) from k-row frames.

    Scale shape: a bounded mapInPandas pass keeps each partition's
    bottom-k distinct hashes (state ≤ k + one Arrow batch — the
    Misra-Gries discipline; a naive global ``distinct()`` would
    shuffle every distinct key, defeating the sketch), then the global
    bottom-k re-ranks the ≤ partitions·k survivors. The result is a
    pure function of the key SET — partitioning-independent and
    bit-identical to the mirror's ``SELECT DISTINCT … ORDER BY h
    LIMIT k``."""
    from ..functions.text import portable_token_hash

    h = df.filter(F.col(col).isNotNull()).select(
        portable_token_hash(F.col(col).cast("string")).alias("h")
    )

    def bottomk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s: set = set()
        for pdf in batches:
            s.update(int(x) for x in pdf["h"])
            if len(s) > k:
                s = set(sorted(s)[:k])
        yield pd.DataFrame({"h": pd.array(sorted(s)[:k], dtype="int64")})

    return h.mapInPandas(bottomk, schema="h long").distinct().orderBy("h").limit(k)


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col_a: str,
    col_b: str | None = None,
    k: int = 256,
) -> DataFrame:
    """Distinct-set overlap from two KMV sketches (Beyer et al.,
    SIGMOD 2007): with ``K`` = the bottom-k of the sketch union,
    ``ρ = |{h ∈ K : h ∈ sk_A ∧ h ∈ sk_B}|`` and the union estimate
    ``(k−1)·2^60 / h_(k)``, the intersection estimate is
    ``ρ/k · |A∪B|̂`` — audience overlap without ever joining the key
    sets. When the union has fewer than k distinct keys everything is
    EXACT (the sketches hold the whole sets). Deterministic: hashes
    are integers, estimates one IEEE division each. Returns one row
    ``(n_a, n_b, est_a, est_b, n_union, est_union, rho,
    est_intersection)``."""
    ska = kmv_sketch(df_a, col_a, k)
    skb = kmv_sketch(df_b, col_b or col_a, k)
    uni = ska.unionByName(skb).distinct().orderBy("h").limit(k)

    def est(sk: DataFrame, n_name: str, e_name: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).alias(n_name), F.max("h").alias("__kth")
        ).select(
            n_name,
            F.when(F.col(n_name) < k, F.col(n_name).cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("__kth")
            )
            .alias(e_name),
        )
    both = uni.join(ska, "h", "leftsemi").join(skb, "h", "leftsemi")
    rho = both.agg(F.count(F.lit(1)).alias("rho"))
    out = (
        est(ska, "n_a", "est_a")
        .crossJoin(F.broadcast(est(skb, "n_b", "est_b")))
        .crossJoin(F.broadcast(est(uni, "n_union", "est_union")))
        .crossJoin(F.broadcast(rho))
    )
    inter = F.when(
        F.col("n_union") < k, F.col("rho").cast("double")
    ).otherwise(F.col("rho") / F.lit(float(k)) * F.col("est_union"))
    return out.select(
        "n_a", "n_b", "est_a", "est_b", "n_union", "est_union", "rho",
        inter.alias("est_intersection"),
    )


def cm_join_size(sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimate from two CM sketches built with
    the same (depth, width): |A ⋈ B| = Σ_key n_A(key)·n_B(key) is
    estimated by ``min_r Σ_cell A[r][c]·B[r][c]`` (Cormode &
    Muthukrishnan §4.2 — the inner product never underestimates, each
    row overestimates by ≤ N_A·N_B/width in expectation, min over
    rows tightens). The planner-style "how big would this join be"
    answer from two ≤depth·width-row frames — no key-set contact.
    Returns one row ``(estimate,)`` (a BIGINT)."""
    prod = (
        sketch_a.select("r", "cell", F.col("n").alias("__na"))
        .join(sketch_b.select("r", "cell", F.col("n").alias("__nb")), ["r", "cell"])
        .groupBy("r")
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__dot"))
    )
    return prod.agg(F.min("__dot").cast("long").alias("estimate"))


def _bloom_positions(c: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The ``n_hashes`` salted portable-md5 bit positions of a value —
    shared by build and probe so both sides (and both engines) set and
    test identical bits."""
    from ..functions.text import portable_token_hash

    return [
        F.pmod(portable_token_hash(F.concat(F.lit(f"bf{i}:"), c)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str, n_bits: int = 1 << 17, n_hashes: int = 5
) -> DataFrame:
    """Portable Bloom filter as a ``(word, bits)`` table: each value
    sets ``n_hashes`` salted md5 bit positions, words are 32-bit
    segments folded with ``bit_or`` — one map-side-combined groupBy
    onto ≤ n_bits/32 rows. Spark 4.1 ships ``bloom_filter_agg`` only
    as an internal expression (not SQL-registered) and its bits are
    engine-private; this one is integer-exact and identical in any
    engine with ``bit_or`` — so the filter itself can ship across
    systems (build in the warehouse, probe in Spark, or vice versa).
    Filters are union-mergeable (``bit_or`` per word), so partition /
    day filters compose like every other sketch here. False-positive
    rate ≈ (1 − e^(−k·n/m))^k — size n_bits ≈ 10–15 bits per key for
    ~1%."""
    c = F.col(col).cast("string")
    pos = F.array(*_bloom_positions(c, n_bits, n_hashes))
    # 32-bit words (shift ≤ 31): a 64-bit word would need 1 << 63,
    # which portable SQL engines reject as a signed-BIGINT overflow
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(pos).alias("__p"))
        .select(
            F.shiftright(F.col("__p"), 5).alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("__p").bitwiseAND(F.lit(31))
            ).alias("__bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def bloom_prune(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep only rows whose ``col`` MIGHT be in the Bloom filter (all
    ``n_hashes`` bits set) — the semi-join pre-filter that drops the
    bulk of a fact table BEFORE its shuffle when the dim-key set is
    selective. The ≤ n_bits/32-row filter broadcasts; each row
    explodes to its k (word, mask) probes, joins the filter, and
    survives iff every probe found its bit: no false negatives ever,
    false positives at the designed rate (they are caught by the real
    join afterwards — this is a pruner, not a membership oracle)."""
    cols = df.columns
    c = F.col(col).cast("string")
    pos = F.array(*_bloom_positions(c, n_bits, n_hashes))
    # per-row id so duplicate rows survive independently (a groupBy on
    # the data columns would merge them and break the ==k hit count);
    # assigned BEFORE the explode, inside one linear plan
    src = df.select(
        F.struct(*cols).alias("__row"), pos.alias("__ps")
    ).withColumn("__id", F.monotonically_increasing_id())
    probes = src.select("__id", "__row", F.explode("__ps").alias("__p")).select(
        "__id",
        "__row",
        F.shiftright(F.col("__p"), 5).alias("__w"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.col("__p").bitwiseAND(F.lit(31))
        ).alias("__m"),
    )
    hits = (
        probes.join(
            F.broadcast(bloom.select(F.col("word").alias("__w"), "bits")), "__w"
        )
        .filter(F.col("bits").bitwiseAND(F.col("__m")) == F.col("__m"))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__k"), F.first("__row").alias("__row"))
    )
    return hits.filter(F.col("__k") == n_hashes).select("__row.*")


def hll_sliding_distinct(
    df: DataFrame,
    bucket_col: str,
    col: str,
    trailing: int = 6,
    p: int = 8,
) -> DataFrame:
    """Sliding-window distinct counts from HLL registers: for every
    time bucket, the estimated distinct ``col`` over the TRAILING
    ``trailing`` buckets — "unique users in the last 6 hours, hourly" —
    the query exact distinct cannot answer at scale because sliding
    windows re-count every row ``trailing`` times and
    ``count(DISTINCT)`` doesn't window.

    This is mergeability exploited in a WINDOW: per-bucket registers
    (one map-side-combined groupBy onto buckets × ≤2^p rows), a dense
    (bucket × register-index) spine so a register updated only in an
    EARLIER bucket still reaches the current window (outer-join
    semantics a bare rows-window over present rows would silently
    drop), then per-index ``max(rho)`` over a RANGE frame on the
    integer bucket — range, not rows, so calendar gaps don't stretch
    the window. The estimate per bucket is the standard classic-HLL
    fold over its ≤2^p merged registers.

    Every frame after the first groupBy is sketch-sized
    (buckets × 2^p), independent of row count; ``bucket_col`` must be
    an integer bucket index (e.g. epoch-hours). Returns
    ``(bucket, nonzero, z_scaled, raw_estimate, estimate)``.
    """
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    m, w = 1 << p, 60 - p
    from ..functions.text import portable_token_hash

    h = portable_token_hash(F.col(col).cast("string"))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    regs = (
        df.select(
            F.col(bucket_col).alias("bucket"),
            F.shiftright(h, w).alias("idx"),
            hll_rho(rest, w).alias("rho"),
        )
        .groupBy("bucket", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_sliding_from_registers(regs, trailing=trailing, p=p)


def hll_sliding_from_registers(
    regs: DataFrame, trailing: int = 6, p: int = 8
) -> DataFrame:
    """The window+estimate half of :func:`hll_sliding_distinct`, split
    out so a CONTINUOUSLY MAINTAINED register table — the generic
    ``stream_rollup_maintenance`` keyed on (bucket, idx) with the
    max-rho measure — serves live sliding distinct counts with zero
    sliding-specific streaming code (stream == batch pytest).
    ``regs`` is ``(bucket, idx, rho)``, ≤ one row per pair."""
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    m, w = 1 << p, 60 - p
    spine = (
        regs.select("bucket")
        .distinct()
        .select(
            "bucket",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("idx"),
        )
    )
    dense = spine.join(regs, ["bucket", "idx"], "left")
    wnd = (
        Window.partitionBy("idx")
        .orderBy("bucket")
        .rangeBetween(-(trailing - 1), 0)
    )
    merged = dense.select(
        "bucket", "idx", F.max("rho").over(wnd).alias("rho")
    )
    contrib = F.pow(F.lit(2.0), F.lit(w + 1) - F.col("rho")).cast("long")
    sk = (
        merged.groupBy("bucket")
        .agg(
            F.count("rho").alias("nonzero"),
            F.coalesce(F.sum(contrib), F.lit(0)).alias("__zf"),
        )
        .select(
            "bucket",
            "nonzero",
            (
                F.col("__zf")
                + (F.lit(m) - F.col("nonzero")) * F.lit(1 << (w + 1))
            ).alias("z_scaled"),
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) * F.lit(float(1 << (w + 1))) / F.col("z_scaled")
    empty = F.lit(m) - F.col("nonzero")
    est = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return sk.select(
        "bucket",
        "nonzero",
        "z_scaled",
        raw.alias("raw_estimate"),
        est.alias("estimate"),
    )


def frequent_items_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 20,
    cap: int | None = None,
) -> DataFrame:
    """Per-group EXACT heavy hitters (frequency ≥ N_g/k within each
    group) — the "top items per tenant/segment" sibling of
    :func:`frequent_items`, same collide-then-verify discipline with
    the Misra-Gries summary and the pigeonhole superset guarantee
    applied PER GROUP: each partition keeps one bounded dict per group
    it sees (≤ groups·cap entries), candidates are (group, item)
    pairs, and the exact verify compares against the GROUP's own total
    — so the output equals a per-group GROUP BY/HAVING, which is the
    oracle.  NULL groups and NULL items are both real keys (null-safe
    join, the frequent_items NULL rule).  Returns
    ``(group, item, n_rows, share)``, heaviest first within group.
    """
    capn = int(cap if cap is not None else 2 * k)
    if capn < k:
        raise ValueError(f"cap ({capn}) must be >= k ({k}) for the superset guarantee")
    src = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(col).cast("string").alias("item"),
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups: dict = {}
        for pdf in batches:
            for (g, item), c in (
                pdf[["g", "item"]].value_counts(dropna=False).items()
            ):
                gk = None if (g is None or g != g) else g
                ik = None if (item is None or item != item) else item
                d = groups.setdefault(gk, {})
                d[ik] = d.get(ik, 0) + int(c)
            for gk, d in groups.items():
                if len(d) > capn:
                    vals = sorted(d.values(), reverse=True)
                    s = vals[capn]
                    groups[gk] = {i: c - s for i, c in d.items() if c > s}
        rows_g, rows_i = [], []
        for gk, d in groups.items():
            for ik in d:
                rows_g.append(gk)
                rows_i.append(ik)
        yield pd.DataFrame(
            {
                "g": pd.array(rows_g, dtype="object"),
                "item": pd.array(rows_i, dtype="object"),
            }
        )

    cand = src.mapInPandas(mg, schema="g string, item string").distinct()
    tot = src.groupBy(F.col("g").alias("__tg")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    cond = src["g"].eqNullSafe(cand["g"]) & src["item"].eqNullSafe(cand["item"])
    counted = (
        src.join(F.broadcast(cand), cond, "leftsemi")
        .groupBy("g", "item")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(tot, F.col("g").eqNullSafe(F.col("__tg")))
        .filter(F.col("n_rows") * k >= F.col("__n"))
    )
    return counted.select(
        F.col("g").alias("group"),
        "item",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("n_rows") / F.col("__n"), 6).alias("share"),
    ).orderBy("group", F.desc("n_rows"), F.asc_nulls_first("item"))
