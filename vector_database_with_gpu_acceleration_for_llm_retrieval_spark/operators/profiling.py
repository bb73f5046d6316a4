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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile_table", "audit_constraints", "numeric_histogram", "winsorized_stats", "equi_depth_bins", "column_correlations", "table_diff", "gini_coefficient", "market_concentration", "population_stability", "hot_keys", "robust_scale", "centroid_drift", "vocab_divergence", "fd_check"]


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


def audit_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    fks: dict[str, tuple[DataFrame, str]] | None = None,
    checks: dict[str, Column] | None = None,
) -> DataFrame:
    """Constraint audit — the pre-publish data-quality gate: one row
    per declared constraint with its violation count.

    * ``not_null``: columns that must never be NULL — counted in ONE
      scan-wide aggregate shared by all such columns (and by
      ``checks``), no per-constraint pass;
    * ``unique``: key lists that must be unique — one groupBy per key
      (count>1 groups summed), the same shuffle a dedup would pay;
    * ``fks``: ``child_col → (parent_df, parent_col)`` referential
      checks — anti-join counts; the parent key set is usually a
      dimension, so AQE broadcasts it;
    * ``checks``: named boolean Columns that must hold per row (range
      checks, regex shapes) — violations counted in the shared scan.

    Returns ``(constraint, kind, n_violations)`` via a union of the
    tiny per-constraint scalar frames — a 100 TB audit costs one wide
    scan plus one shuffle per uniqueness key plus one pruned anti-join
    per FK, all independent jobs Catalyst can share scans across.
    """
    spark = df.sparkSession
    results: list[DataFrame] = []
    aggs, names = [], []
    for c in not_null or []:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        names.append((f"not_null({c})", "not_null", f"__nn_{c}"))
    for name, cond in (checks or {}).items():
        # a NULL check result is a VIOLATION: "must hold per row" means
        # rows where the predicate is unknown don't get to pass silently
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(f"__ck_{name}")
        )
        names.append((f"check({name})", "check", f"__ck_{name}"))
    if aggs:
        row = df.agg(*aggs)
        structs = F.array(
            *[
                F.struct(
                    F.lit(label).alias("constraint"),
                    F.lit(kind).alias("kind"),
                    F.coalesce(F.col(alias), F.lit(0)).alias("n_violations"),
                )
                for label, kind, alias in names
            ]
        )
        results.append(row.select(F.explode(structs).alias("r")).select("r.*"))
    for key in unique or []:
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_violations"))
            .select(
                F.lit(f"unique({','.join(key)})").alias("constraint"),
                F.lit("unique").alias("kind"),
                F.col("n_violations"),
            )
        )
        results.append(dup)
    for child_col, (parent, parent_col) in (fks or {}).items():
        orphans = (
            df.filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(f"fk({child_col})").alias("constraint"),
                F.lit("fk").alias("kind"),
                F.col("n_violations"),
            )
        )
        results.append(orphans)
    if not results:
        return spark.createDataFrame(
            [], "constraint string, kind string, n_violations long"
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def numeric_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: ``(bin, bin_lo,
    bin_hi, n_rows)``, the distribution profile a selection threshold
    or skew diagnosis reads.

    Bounds default to the observed min/max via ONE scalar aggregate
    broadcast back into the binning projection — the whole thing stays
    a single lazy plan (no collect), one scan for bounds + one scan for
    counts. Values at ``hi`` fold into the last bin; empty bins are
    absent from the output (join a ``sequence`` frame if you need
    zeros). NULLs are excluded.
    """
    base = df.select(F.col(col).alias("__x")).filter(F.col("__x").isNotNull())
    if lo is None or hi is None:
        # compute only the MISSING side(s) from data — an explicit bound
        # is honored even when the other side is observed
        bounds = base.agg(
            F.min("__x").cast("double").alias("__olo"),
            F.max("__x").cast("double").alias("__ohi"),
        )
        b = (
            base.crossJoin(F.broadcast(bounds))
            .withColumn("__lo", F.lit(lo).cast("double") if lo is not None else F.col("__olo"))
            .withColumn("__hi", F.lit(hi).cast("double") if hi is not None else F.col("__ohi"))
        )
    else:
        b = base.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    raw = F.floor((F.col("__x").cast("double") - F.col("__lo")) / width)
    # clamp BOTH edges (a value below an explicit lo would go negative)
    # and collapse the degenerate lo==hi (zero width) case into bin 0
    bin_ = F.when(
        F.col("__hi") > F.col("__lo"),
        F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0)),
    ).otherwise(F.lit(0)).cast("int")
    return (
        b.select(bin_.alias("bin"), "__lo", "__hi")
        .groupBy("bin", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / n_bins).alias("bin_lo"),
            (F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / n_bins).alias("bin_hi"),
            "n_rows",
        )
        .orderBy("bin")
    )


def winsorized_stats(
    df: DataFrame,
    col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
) -> DataFrame:
    """Outlier-robust summary: exact percentile cutoffs at ``lo_p`` /
    ``hi_p`` and the winsorized (clipped) mean/sum — what a fair
    average looks like when a handful of rows are garbage.

    EXACT quantiles without the classic scale-killer: the global order
    comes from :func:`~.sampling.global_rank`'s distributed prefix-rank
    (range partition + P-row offsets), never a single-task
    ``Window.orderBy``. Cutoffs are then two conditional aggregates
    over the ranked frame (``lo_cut`` = min value with pct ≥ lo_p,
    ``hi_cut`` = max value with pct ≤ hi_p — order statistics, so
    engine-exact), broadcast back into the clipping projection. One
    lazy plan, no collect.

    Returns one row: ``(n_rows, lo_cut, hi_cut, winsorized_avg,
    winsorized_sum)``. NULLs are excluded.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    base = df.select(F.col(col).alias("__x")).filter(F.col("__x").isNotNull())
    ranked = global_rank(base, "__x", id_col="__x")
    cuts = ranked.agg(
        F.min(F.when(F.col("pct") >= lo_p, F.col("__x"))).alias("__lo"),
        F.max(F.when(F.col("pct") <= hi_p, F.col("__x"))).alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    clipped = F.least(F.greatest(F.col("__x"), F.col("__lo")), F.col("__hi"))
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .agg(
            F.first("__n").alias("n_rows"),
            F.first("__lo").alias("lo_cut"),
            F.first("__hi").alias("hi_cut"),
            F.avg(clipped).alias("winsorized_avg"),
            F.sum(clipped).alias("winsorized_sum"),
        )
    )


def equi_depth_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equal-population (equi-depth) binning: every bin holds ~N/n rows
    — the histogram that stays readable under skew, and the bucketing a
    stratified sampler or monotonic feature transform wants.

    ``bin = floor(pct · n)`` over :func:`~.sampling.global_rank`'s
    distributed percentile (clamped to n−1), so no single-task global
    window; one range shuffle + one group-by.

    Returns ``(bin, n_rows, lo, hi)`` — observed value bounds per bin.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    base = df.select(F.col(col).alias("__x")).filter(F.col("__x").isNotNull())
    ranked = global_rank(base, "__x", id_col="__x")
    bin_ = F.least(F.floor(F.col("pct") * n_bins), F.lit(n_bins - 1)).cast("int")
    return (
        ranked.select(bin_.alias("bin"), "__x")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("lo"),
            F.max("__x").alias("hi"),
        )
        .orderBy("bin")
    )


def column_correlations(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns, all from ONE
    aggregation pass: the single scan accumulates n, Σx, Σx² per column
    and Σxy per pair (map-side partials), and the correlations are pure
    arithmetic on that one row — ``C(k,2)`` pairs never rescan.

    Rows where EITHER column of a pair is NULL are excluded from that
    pair's sums (pairwise deletion, the standard choice). Returns
    ``(col_a, col_b, n, corr)`` for a < b; ``corr`` is NULL when a
    side is constant.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        xa = F.when(both, F.col(a).cast("double"))
        xb = F.when(both, F.col(b).cast("double"))
        aggs += [
            F.count(xa).alias(f"__n{i}"),
            F.sum(xa).alias(f"__sa{i}"),
            F.sum(xb).alias(f"__sb{i}"),
            F.sum(xa * xa).alias(f"__saa{i}"),
            F.sum(xb * xb).alias(f"__sbb{i}"),
            F.sum(xa * xb).alias(f"__sab{i}"),
        ]
    row = df.agg(*aggs)
    structs = []
    for i, (a, b) in enumerate(pairs):
        n = F.col(f"__n{i}").cast("double")
        cov = F.col(f"__sab{i}") - F.col(f"__sa{i}") * F.col(f"__sb{i}") / n
        va = F.col(f"__saa{i}") - F.col(f"__sa{i}") * F.col(f"__sa{i}") / n
        vb = F.col(f"__sbb{i}") - F.col(f"__sb{i}") * F.col(f"__sb{i}") / n
        corr = F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))
        structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__n{i}").alias("n"),
                corr.alias("corr"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two table snapshots by key: every key
    classified ``added`` / ``removed`` / ``changed`` / ``unchanged``,
    with the list of columns whose values differ — the review artifact
    a pipeline publishes next to a rewrite (did the new code change
    what it shouldn't have?).

    ONE full-outer join on the key; the per-column comparison is a
    null-safe equality projection (``eqNullSafe`` — NULL==NULL is
    unchanged, NULL→value is a change). Emit-side cost is the join
    only; at 100 TB pre-bucket both snapshots on the key and the join
    is shuffle-free.

    Returns ``(key, status, changed_cols)``; filter
    ``status != 'unchanged'`` before collecting anything.
    """
    compare_cols = compare_cols or [c for c in old.columns if c != key and c in new.columns]
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    j = o.join(n, on=F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), how="full_outer")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        status.alias("status"),
        F.when(in_old & in_new, diffs).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )


def gini_coefficient(df: DataFrame, col: str) -> DataFrame:
    """Gini concentration index of a non-negative measure (0 = evenly
    spread, →1 = one row holds everything) — "how concentrated is
    revenue/activity", the inequality summary a mixture or capacity
    plan reads.

    Uses the rank formulation ``G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n`` with
    ranks from the shared distributed prefix machinery
    (:func:`~.sampling.global_rank`) — no single-task global sort.
    Ties are rank-split deterministically (value, then input order via
    a synthetic id is NOT needed: equal values contribute equally to
    Σ(rank·x) regardless of tie permutation... up to rank assignment;
    unique ranks over equal values sum to the same total, so the
    result is tie-order invariant). NULLs excluded. Returns one row
    ``(n_rows, total, gini)``.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    base = df.select(F.col(col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    ranked = global_rank(base, "__x", id_col="__x")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__x").alias("total"),
        (
            F.lit(2.0) * F.sum(F.col("rank") * F.col("__x"))
            / (F.count(F.lit(1)) * F.sum("__x"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1))
        ).alias("gini"),
    )


def market_concentration(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl–Hirschman concentration per market: per ``group``,
    ``HHI = Σ_entities share²`` where share is the entity's fraction of
    the group total (1/n_entities = perfectly even, 1.0 = monopoly).

    Two partial-agg shuffles — (group, entity) totals, then the group
    rollup; shares normalize via a window over the per-group entity
    frame (bounded by entities-per-group, never the fact table).
    Returns ``(group, n_entities, hhi)``.
    """
    per_entity = df.groupBy(group_col, entity_col).agg(
        F.sum(value_col).alias("__v")
    )
    w = Window.partitionBy(group_col)
    share = F.col("__v") / F.sum("__v").over(w)
    return (
        per_entity.select(group_col, share.alias("__s"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum(F.col("__s") * F.col("__s")).alias("hhi"),
        )
    )


def hot_keys(df: DataFrame, key_col: str, top: int = 20) -> DataFrame:
    """Shuffle-skew report: the ``top`` heaviest keys with their row
    share, cumulative share, and skew factor vs a uniform spread
    (``share · n_keys`` — how many × its fair share the key owns).
    This is the pre-flight check before any groupBy/join on the key:
    a skew factor in the hundreds means salting or AQE skew-join.

    One partial-agged count per key, a 1-row (total, n_keys) aggregate
    broadcast back, top-``top`` via TakeOrderedAndProject (no full
    sort), and the cumulative window runs on the ``top``-row frame
    only — nothing global ever sorts. NULL keys count as a key (they
    are a classic skew source). Returns
    ``(key, n_rows, share, cum_share, skew)``, heaviest first,
    key-asc tie-break."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").alias("__t"), F.count(F.lit(1)).alias("__k")
    )
    topn = (
        counts.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
        .limit(top)
        .crossJoin(F.broadcast(tot))
    )
    w = (
        Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    share = F.col("n_rows") / F.col("__t")
    return topn.select(
        "key",
        "n_rows",
        share.alias("share"),
        (F.sum("n_rows").over(w) / F.col("__t")).alias("cum_share"),
        (share * F.col("__k")).alias("skew"),
    )


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column — the standard train/serve drift
    monitor: ``PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)``
    (rule of thumb: <0.1 stable, >0.25 shifted).

    Bin edges are equi-width from the REFERENCE's min/max (one scalar
    agg broadcast into both binning projections — drift must be
    measured on the reference's grid, not a moving one); out-of-range
    current values clamp into the edge bins, and both sides get add-ε
    smoothing so an empty bin can't produce ±inf. Two scans + two tiny
    bin aggregations. Returns per-bin rows plus the total under
    ``bin = -1``.
    """
    eps = 1e-6
    bounds = (
        ref.select(F.col(col).alias("__x"))
        .filter(F.col("__x").isNotNull())
        .agg(
            F.min("__x").cast("double").alias("__lo"),
            F.max("__x").cast("double").alias("__hi"),
        )
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        b = (
            df.select(F.col(col).alias("__x"))
            .filter(F.col("__x").isNotNull())
            .crossJoin(F.broadcast(bounds))
        )
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        raw = F.floor((F.col("__x").cast("double") - F.col("__lo")) / width)
        bin_ = (
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0)),
            )
            .otherwise(F.lit(0))
            .cast("int")
        )
        counts = b.select(bin_.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(f"__n_{name}")
        )
        tot = counts.agg(F.sum(f"__n_{name}").alias(f"__t_{name}"))
        return counts.crossJoin(F.broadcast(tot))

    r = binned(ref, "ref")
    c = binned(cur, "cur")
    allb = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    rtot = r.agg(F.max("__t_ref").alias("__tr"))
    ctot = c.agg(F.max("__t_cur").alias("__tc"))
    j = (
        allb.join(r.select("bin", "__n_ref"), "bin", "left")
        .join(c.select("bin", "__n_cur"), "bin", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ctot))
        .select(
            "bin",
            (F.coalesce(F.col("__n_ref"), F.lit(0)) / F.col("__tr") + eps).alias("p_ref"),
            (F.coalesce(F.col("__n_cur"), F.lit(0)) / F.col("__tc") + eps).alias("p_cur"),
        )
        .select(
            "bin",
            "p_ref",
            "p_cur",
            ((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))).alias("psi_term"),
        )
    )
    total = j.agg(
        F.lit(-1).cast("int").alias("bin"),
        F.lit(None).cast("double").alias("p_ref"),
        F.lit(None).cast("double").alias("p_cur"),
        F.sum("psi_term").alias("psi_term"),
    )
    return j.unionByName(total)


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    out_col: str = "scaled",
) -> DataFrame:
    """Median/IQR feature scaling — ``(x − median) / (Q3 − Q1)`` — the
    outlier-robust standardization (sklearn's RobustScaler semantics):
    unlike z-scoring, a handful of extreme values cannot poison the
    location/scale estimates. Grouped when ``group_col`` is given.

    One exact-percentile aggregate per group (the same
    ``percentile``/``quantile_cont`` parity as price_percentiles —
    swap for ``percentile_approx`` at 100 TB) broadcast back onto the
    rows; the scan itself is untouched. Zero-IQR groups (constant
    values) scale to NULL rather than ±inf — filter or coalesce
    downstream. Adds ``out_col`` to the input frame.
    """
    pct = F.expr(f"percentile({value_col}, array(0.25, 0.5, 0.75))")
    if group_col is not None:
        st = df.groupBy(group_col).agg(pct.alias("__p"))
        joined = df.join(F.broadcast(st), group_col)
    else:
        st = df.agg(pct.alias("__p"))
        joined = df.crossJoin(F.broadcast(st))
    iqr = F.col("__p")[2] - F.col("__p")[0]
    scaled = F.when(
        iqr != 0, (F.col(value_col) - F.col("__p")[1]) / iqr
    )
    return joined.withColumn(out_col, scaled).drop("__p")


def centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift monitor: per-group centroid of a
    reference snapshot vs the current one, compared by cosine — the
    "did the upstream embedding model / corpus mix shift" check run
    before retraining on a refreshed corpus (the embedding sibling of
    :func:`population_stability`).

    Per-group per-dimension means come from ONE posexplode +
    partial-agged groupBy per side ((group, dim) keys — never a
    collect of vectors); centroids reassemble with an ordered
    struct-sort transform, and the comparison is the repo's
    sequential-fold cosine on G-row frames. Returns
    ``(group, n_ref, n_cur, cos_sim, drift)`` with ``drift = 1 −
    cos`` (0 = unchanged direction). Groups present in only one
    snapshot are dropped (inner join) — they are mix changes, visible
    in the row counts, not drift."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        vector as V,
    )

    def cents(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        per_dim = (
            df.select(F.col(group_col).alias("g"), F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("g", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"), F.count(F.lit(1)).alias("n"))
        )
        return per_dim.groupBy("g").agg(
            F.max("n").alias(n_name),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias(c_name),
        )
    a = cents(ref, "n_ref", "__ca")
    b = cents(cur, "n_cur", "__cb")
    return (
        a.join(b, "g")
        .select(
            F.col("g").alias(group_col),
            "n_ref",
            "n_cur",
            V.cosine_sim("__ca", "__cb").alias("cos_sim"),
            (F.lit(1.0) - V.cosine_sim("__ca", "__cb")).alias("drift"),
        )
        .orderBy(group_col)
    )


def vocab_divergence(
    ref: DataFrame,
    cur: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots:
    Jensen-Shannon divergence over HASHED token buckets — the
    text-domain companion to :func:`centroid_drift` and the
    vocabulary form of :func:`population_stability`. Hashing tokens
    into ``n_buckets`` portable-md5 buckets bounds the state at
    ``n_buckets`` rows regardless of vocabulary size (the CM-sketch
    discipline: a raw token groupBy shuffles the whole vocabulary),
    while JS keeps its [0, ln 2] range and symmetry on the bucketed
    distributions. Each side is ONE explode + partial-agged groupBy
    onto bucket ids; the divergence is a single aggregate over the
    joined ≤n_buckets-row frame. Zero-count buckets contribute 0 to
    their side's KL term (the 0·ln0 = 0 convention via a guard).
    Returns one row ``(n_ref_tokens, n_cur_tokens, js_divergence)``.
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import (
        text as TX,
    )

    def buckets(df: DataFrame, cnt: str) -> DataFrame:
        toks = df.select(TX.tokens(F.col(text_col)).alias("__t")).select(
            F.explode("__t").alias("tok")
        )
        return (
            toks.select(
                F.pmod(TX.portable_token_hash(F.col("tok")), F.lit(n_buckets)).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    a, b = buckets(ref, "na"), buckets(cur, "nb")
    j = (
        a.join(b, "bucket", "full")
        .select(
            F.coalesce(F.col("na"), F.lit(0)).alias("na"),
            F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
        )
        .crossJoin(
            F.broadcast(
                a.agg(F.sum("na").alias("ta")).crossJoin(b.agg(F.sum("nb").alias("tb")))
            )
        )
    )
    p = F.col("na") / F.col("ta")
    q = F.col("nb") / F.col("tb")
    m = (p + q) / F.lit(2.0)
    kl_p = F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    return j.agg(
        F.max("ta").cast("long").alias("n_ref_tokens"),
        F.max("tb").cast("long").alias("n_cur_tokens"),
        ((F.sum(kl_p) + F.sum(kl_q)) / F.lit(2.0)).alias("js_divergence"),
    )


def fd_check(df: DataFrame, deps: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency profiling: for each candidate ``A → B``,
    does every A-value map to exactly one B-value — the schema-
    discovery / data-quality question behind key inference,
    normalization advice, and "is this column derivable" pruning.

    Reports, per dependency: the number of A-groups, the groups
    violating (more than one distinct B), and the **g3 error** — the
    minimum number of rows whose removal makes the FD hold (Kivinen/
    Mannila), computed as ``n − Σ_A max_B count(A,B)``; ``holds`` is
    ``g3 = 0``.  g3 is THE standard approximate-FD measure: a single
    mistyped row in a million gives g3 = 1 rather than flipping a
    boolean.

    Per dependency: one (A,B) groupBy, one per-A struct-max argmax
    (no window), one 1-row rollup — all map-side-combined equi-key
    aggregations; candidates evaluated independently and unioned (the
    list is config-sized). NULLs: rows with NULL A are one group;
    NULL B counts as a value (SQL distinctness semantics).  Returns
    ``(lhs, rhs, n_rows, n_groups, violating_groups, g3_rows,
    holds)``.
    """
    if not deps:
        raise ValueError("deps must name at least one candidate A -> B")
    outs = []
    for a, b in deps:
        cells = df.groupBy(
            F.col(a).alias("__a"), F.col(b).alias("__b")
        ).agg(F.count(F.lit(1)).alias("__n"))
        per_a = cells.groupBy("__a").agg(
            F.sum("__n").alias("__rows"),
            F.max("__n").alias("__keep"),
            F.count(F.lit(1)).alias("__nb"),
        )
        outs.append(
            per_a.agg(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                F.sum("__rows").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("__nb") > 1).cast("long")).alias(
                    "violating_groups"
                ),
                (F.sum("__rows") - F.sum("__keep")).cast("long").alias(
                    "g3_rows"
                ),
            ).select(
                "lhs",
                "rhs",
                "n_rows",
                "n_groups",
                "violating_groups",
                "g3_rows",
                (F.col("g3_rows") == 0).alias("holds"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
