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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct_counts",
    "approx_quantiles",
    "hll_register_updates",
    "hll_estimate_from_registers",
    "hll_distinct",
    "frequent_items",
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
