"""ML feature transforms over categorical columns: target encoding
(with the leakage-safe leave-one-out variant), frequency encoding.

These are the tabular-feature counterparts of the text/vector pipeline
— the encodings a downstream model consumes. All pure DataFrame
compositions:

* **target encoding** — replace a category with the smoothed mean of a
  numeric label over that category: ``(Σy + α·μ) / (n + α)`` where μ is
  the global label mean. One (category) aggregation, category-sized
  frame broadcast back; the fact table never shuffles.

* **leave-one-out** — the leakage-safe training-time variant: each
  row's OWN label is excluded from its encoding
  (``(Σy − y_i + α·μ) / (n − 1 + α)``), otherwise the encoding of a
  rare category memorizes the row's label and the model overfits the
  encoding itself. Same per-category sums; the subtraction is a
  projection, so LOO costs nothing extra.

* **frequency encoding** — category → share of rows; the cheap ordinal
  signal when labels aren't available.

Cite: target/LOO encoding as in the public CatBoost/Micci-Barreca
(2001) formulations (smoothed category means); implemented
Spark-first, no reference-code derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["target_encode", "frequency_encode", "lift_table", "woe_iv"]


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    alpha: float = 10.0,
    loo: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Attach the smoothed target encoding of ``cat_col`` as
    ``out_col`` (default ``{cat}_te``). ``loo=True`` excludes each
    row's own label (training-time, leakage-safe); rows with a NULL
    label get the inclusive encoding in LOO mode (they contributed
    nothing to the sums).

    Scale shape: one partial-agg groupBy on the category plus a 1-row
    global mean, both broadcast back onto the fact — the fact table
    never shuffles. A singleton category under LOO falls back to the
    pure prior μ (n−1 = 0).
    """
    out_col = out_col or f"{cat_col}_te"
    y = F.col(label_col).cast("double")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(y).alias("__sy"),
        F.count(y).alias("__ny"),
    )
    glob = df.agg((F.sum(y) / F.count(y)).alias("__mu"))
    # NULL is a real category in dirty data: a plain equi-join would
    # never match the NULL group, silently encoding those rows as NULL.
    # Join null-safely so NULL-category rows get THEIR group's stats.
    per_cat = F.broadcast(per_cat.withColumnRenamed(cat_col, "__cat"))
    j = df.join(
        per_cat, F.col(cat_col).eqNullSafe(F.col("__cat")), "left"
    ).crossJoin(F.broadcast(glob))
    if loo:
        sy = F.col("__sy") - F.coalesce(y, F.lit(0.0))
        ny = F.col("__ny") - F.when(y.isNotNull(), 1).otherwise(0)
    else:
        sy, ny = F.col("__sy"), F.col("__ny")
    enc = (sy + F.lit(float(alpha)) * F.col("__mu")) / (ny + F.lit(float(alpha)))
    # belt and braces: any row that still failed to match (impossible
    # when per_cat came from the same frame) falls back to the prior μ
    enc = F.coalesce(enc, F.col("__mu"))
    return j.select(*df.columns, enc.alias(out_col))


def frequency_encode(
    df: DataFrame,
    cat_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Attach each category's share of rows as ``out_col`` (default
    ``{cat}_freq``) — the label-free ordinal signal. Same one-groupBy
    broadcast shape as :func:`target_encode`."""
    out_col = out_col or f"{cat_col}_freq"
    per_cat = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = df.agg(F.count(F.lit(1)).alias("__t"))
    # null-safe join for the same reason as target_encode: the NULL
    # category's share must reach its rows, not become a NULL feature
    per_cat = F.broadcast(per_cat.withColumnRenamed(cat_col, "__cat"))
    return (
        df.join(per_cat, F.col(cat_col).eqNullSafe(F.col("__cat")), "left")
        .crossJoin(F.broadcast(tot))
        .select(*df.columns, (F.col("__n") / F.col("__t")).alias(out_col))
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Decile lift table — the model-evaluation staple: rank rows by
    ``score_col`` (best first), cut into ``n_bins`` equal-population
    bins, and report each bin's label mean, lift over the global mean,
    and the cumulative share of all positives captured down to that
    bin ("top 20% of scores capture X% of conversions").

    Binning rides the distributed prefix rank
    (:func:`~.sampling.global_rank` — no single-task ntile); the
    cumulative sums then run on the ``n_bins``-row frame where an
    ordered window is free. Ties break on ``id_col``; without one, the
    tiebreak is a hash of (score, label), which pins every bin's
    statistics deterministically (rows identical in BOTH score and
    label may swap bins across runs, but swapping interchangeable rows
    cannot change any bin's n/avg/lift). Pass a unique ``id_col`` when
    the exact row→bin assignment itself must be reproducible.

    Returns ``(bin, n_rows, avg_label, lift, cum_capture)`` with bin 0
    = best scores.
    """
    from pyspark.sql import Window as W

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sampling import (
        global_rank,
    )

    cols = [F.col(score_col).alias("__s"), F.col(label_col).cast("double").alias("__y")]
    if id_col:
        cols.append(F.col(id_col).alias("__id"))
    base = df.select(*cols).filter(F.col("__y").isNotNull())
    if not id_col:
        # no caller id: tiebreak on hash(score, label) — bin STATS stay
        # deterministic because any rows still tied are identical in
        # both grouping-relevant values (see docstring)
        base = base.withColumn("__id", F.xxhash64(F.col("__s"), F.col("__y")))
    ranked = global_rank(base, "__s", id_col="__id", ascending=False)
    bin_ = F.least(F.floor(F.col("pct") * n_bins), F.lit(n_bins - 1)).cast("int")
    per_bin = (
        ranked.select(bin_.alias("bin"), "__y")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__y").alias("__sy"))
    )
    tot = per_bin.agg(
        F.sum("n_rows").alias("__n"), F.sum("__sy").alias("__ty")
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_rows",
            (F.col("__sy") / F.col("n_rows")).alias("avg_label"),
            ((F.col("__sy") / F.col("n_rows")) / (F.col("__ty") / F.col("__n"))).alias("lift"),
            (F.sum("__sy").over(w) / F.col("__ty")).alias("cum_capture"),
        )
        .orderBy("bin")
    )


def woe_iv(
    df: DataFrame,
    bin_col: str,
    label_col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per bin — the
    credit-scoring feature diagnostic: ``woe = ln(dist_good/dist_bad)``
    per bin (how strongly the bin separates the classes, signed) and
    ``iv_term = (dist_good − dist_bad)·woe`` whose sum over bins is the
    feature's IV (<0.02 useless, >0.3 strong, by the usual rule of
    thumb).

    One (bin, label) groupBy (map-side combined, frame = bins), window
    totals over that tiny frame, Laplace ``smooth`` added to both
    class counts per bin so empty-class bins stay finite (the standard
    adjusted-WOE; smooth=0 reproduces raw WOE with ±inf possible).
    ``label_col`` must be 0/1-castable.  Returns
    ``(bin, n, n_good, n_bad, woe, iv_term)`` — sum ``iv_term`` for
    the feature IV.
    """
    lbl = F.col(label_col).cast("double")
    cells = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lbl).alias("__g"),
        F.sum(F.lit(1.0) - lbl).alias("__b"),
    )
    wall = Window.partitionBy()
    g = F.col("__g") + F.lit(smooth)
    b = F.col("__b") + F.lit(smooth)
    tg = F.sum(g).over(wall)
    tb = F.sum(b).over(wall)
    dg = g / tg
    db = b / tb
    woe = F.log(dg / db)
    return cells.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.col("__g").cast("long").alias("n_good"),
        F.col("__b").cast("long").alias("n_bad"),
        woe.alias("woe"),
        ((dg - db) * woe).alias("iv_term"),
    )
