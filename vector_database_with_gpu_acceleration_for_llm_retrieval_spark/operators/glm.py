"""Distributed generalized linear model training: logistic regression
by iteratively reweighted least squares (IRLS / Newton-Raphson), plus
Cox proportional hazards (:func:`cox_fit` — the same fixed-iteration
Newton discipline over the Breslow partial likelihood, with the
gradient/Hessian pass as pure column algebra instead of mapInPandas).

The "train a classifier head on features the engine computed" loop:
curation produces per-row feature vectors and labels; this fits
``p = sigmoid(X beta)`` by full-batch Newton steps

    beta' = beta + (X'WX + reg*I)^-1  X'(y - p),   W = diag(p(1-p))

— the textbook IRLS update, exact (no learning-rate tuning), converging
quadratically for the few-features regime this targets (d small: the
d x d Hessian is driver-sized, the data is not).

Spark shape per iteration: ONE ``mapInPandas`` pass over the feature
frame computes the partition-local ``X'WX`` and ``X'(y-p)`` partials
(numpy, Arrow batches), (d^2 + d)-double rows collect to the driver,
the solve happens there, and the new beta ships back inside the next
pass's closure — the ALS/Gram discipline: per-iteration driver state is
O(d^2), per-iteration cluster work is one scan, nothing data-sized ever
leaves the executors.  Fixed iteration count keeps the result a
deterministic function of the input (partial sums re-associate across
partition layouts — parity is asserted to 1e-9, the ALS tolerance).

No SQL mirror (matrix solves); verification is a numpy replica of the
identical schedule plus recoverable-separation checks
(tests/test_glm.py) — the OPQ/ALS discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "logistic_fit",
    "logistic_predict",
    "ols_two_features",
    "isotonic_calibrate",
    "calibration_error",
    "cox_fit",
    "cox_predict",
    "cox_baseline",
    "poisson_fit",
    "poisson_predict",
]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # the numerically-stable split form (naive exp overflows at |z|>709)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 6,
    reg: float = 1e-6,
    intercept: bool = True,
) -> dict:
    """Fit logistic regression; returns ``{"beta": [...], "cols":
    [...], "iters": n}`` with the intercept (when requested) LAST.

    ``reg`` is a small ridge on the Hessian — it keeps the solve
    defined under perfect separation / collinear features (where the
    MLE diverges), the standard safeguard.  Features are used as-is:
    scale them upstream (robust_scale) if their magnitudes differ
    wildly, exactly as any Newton solver expects.
    """
    d = len(feature_cols) + (1 if intercept else 0)
    src = df.select(
        *[F.col(c).cast("double") for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    beta = np.zeros(d, dtype=np.float64)
    schema = "g array<double>"
    for _ in range(iters):
        b = beta.copy()

        def part(batches, b=b):
            H = np.zeros((d, d))
            gvec = np.zeros(d)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                X = pdf[feature_cols].to_numpy(dtype=np.float64)
                if intercept:
                    X = np.hstack([X, np.ones((len(X), 1))])
                y = pdf["__y"].to_numpy(dtype=np.float64)
                p = _sigmoid(X @ b)
                w = p * (1.0 - p)
                H += (X.T * w) @ X
                gvec += X.T @ (y - p)
                seen = True
            if seen:
                yield pd.DataFrame(
                    {"g": [np.concatenate([H.reshape(-1), gvec]).tolist()]}
                )

        parts = src.mapInPandas(part, schema).collect()
        H = np.zeros((d, d))
        gvec = np.zeros(d)
        for r in parts:
            a = np.array(r.g, dtype=np.float64)
            H += a[: d * d].reshape(d, d)
            gvec += a[d * d :]
        beta = b + np.linalg.solve(H + reg * np.eye(d), gvec)
    cols = list(feature_cols) + (["__intercept"] if intercept else [])
    return {"beta": beta.tolist(), "cols": cols, "iters": iters}


def logistic_predict(
    df: DataFrame, model: dict, feature_cols: list[str] | None = None
) -> DataFrame:
    """Score rows with a fitted model — pure JVM-side expression
    (linear term as a column sum + the stable sigmoid split), no
    Python in the serving path; appends ``p`` to ``df``."""
    beta = model["beta"]
    cols = model["cols"]
    feature_cols = feature_cols or [c for c in cols if c != "__intercept"]
    z = F.lit(0.0)
    for c, w in zip(cols, beta):
        if c == "__intercept":
            z = z + F.lit(float(w))
        else:
            z = z + F.col(c).cast("double") * F.lit(float(w))
    p = F.when(
        z >= 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ).otherwise(F.exp(z) / (F.lit(1.0) + F.exp(z)))
    return df.withColumn("p", p)


def ols_two_features(
    df: DataFrame,
    u_col: str,
    v_col: str,
    t_col: str,
) -> DataFrame:
    """Two-feature + intercept ordinary least squares SOLVED IN CLOSED
    FORM: the 3x3 normal equations by Cramer's rule over one pass of
    raw sums — unlike the IRLS path this needs no driver solve at all,
    so it IS expressible as plain (oracle-checkable) column algebra.

    One aggregate collects the 9 moments (n, Su, Sv, St, Suu, Svv,
    Suv, Sut, Svt, Stt); determinants expand textbook-style; R^2 comes
    from the same sums via ``SSE = Stt - beta.(X'y)`` — no second data
    pass.  A singular system (collinear features, constant columns)
    has det 0 and yields NULL coefficients rather than a divide error.
    Returns one row ``(n, beta_u, beta_v, beta0, r2)``.
    """
    u, v, t = (F.col(c).cast("double") for c in (u_col, v_col, t_col))
    m = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(u).alias("su"),
        F.sum(v).alias("sv"),
        F.sum(t).alias("st"),
        F.sum(u * u).alias("suu"),
        F.sum(v * v).alias("svv"),
        F.sum(u * v).alias("suv"),
        F.sum(u * t).alias("sut"),
        F.sum(v * t).alias("svt"),
        F.sum(t * t).alias("stt"),
    )

    def det3(a11, a12, a13, a21, a22, a23, a31, a32, a33):
        return (
            a11 * (a22 * a33 - a23 * a32)
            - a12 * (a21 * a33 - a23 * a31)
            + a13 * (a21 * a32 - a22 * a31)
        )

    n = F.col("n")
    su, sv, st = F.col("su"), F.col("sv"), F.col("st")
    suu, svv, suv = F.col("suu"), F.col("svv"), F.col("suv")
    sut, svt, stt = F.col("sut"), F.col("svt"), F.col("stt")
    d = det3(suu, suv, su, suv, svv, sv, su, sv, n)
    du = det3(sut, suv, su, svt, svv, sv, st, sv, n)
    dv = det3(suu, sut, su, suv, svt, sv, su, st, n)
    d0 = det3(suu, suv, sut, suv, svv, svt, su, sv, st)
    dd = F.when(d != 0, d)
    bu, bv, b0 = du / dd, dv / dd, d0 / dd
    sse = stt - (bu * sut + bv * svt + b0 * st)
    sst = stt - st * st / n
    r2 = F.lit(1.0) - sse / F.when(sst != 0, sst)
    return m.select(
        n.cast("long").alias("n"),
        bu.alias("beta_u"),
        bv.alias("beta_v"),
        b0.alias("beta0"),
        r2.alias("r2"),
    )


def ols_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    intercept: bool = True,
    reg: float = 0.0,
) -> dict:
    """General d-feature linear regression (+ optional ridge) — the
    gaussian member completing the GLM family next to
    :func:`logistic_fit` / :func:`poisson_fit` / :func:`cox_fit`, and
    the general-d extension of :func:`ols_two_features`'s closed form.

    ONE scan computes the normal-equation sufficient statistics as
    pure JVM column aggregates — the Gram matrix ``XᵀX`` (d(d+1)/2
    sums), ``Xᵀy`` (d sums), plus n and Σy² — followed by a single
    (d²+d+3)-double driver solve ``(XᵀX + reg·P) β = Xᵀy`` (``P`` the
    identity with a ZERO at the intercept position — standard ridge
    does not penalize the intercept).  No mapInPandas needed: unlike
    logistic's per-row stable sigmoid, every moment here is plain
    column algebra, so the whole data path stays inside whole-stage
    codegen (the poisson_fit/cox_fit discipline) and the result is
    independent of partitioning up to float re-association (the ALS
    tolerance, pytest-asserted).

    Rows with a NULL label or NULL in ANY feature are excluded up
    front (the cox_fit rule).  A singular system (collinear features
    with ``reg=0``) raises ValueError rather than returning garbage —
    pass ``reg > 0`` to shrink through the collinearity.

    ``r2`` comes from the same sums (``SSE = Σy² − 2βᵀXᵀy + βᵀXᵀXβ``,
    no second pass; for ``reg > 0`` it is the R² of the *ridge*
    coefficients, reported against the centered total sum of squares).
    No SQL mirror (matrix solve — the ALS/IRLS precedent); verification
    is a numpy ``lstsq`` replica to 1e-8 and exact agreement with the
    oracle-checked :func:`ols_two_features` at d=2
    (tests/test_glm.py).  Returns ``{"beta", "cols", "n", "r2",
    "reg"}`` (intercept LAST as ``__intercept``); score with
    :func:`ols_predict`.
    """
    d = len(feature_cols) + (1 if intercept else 0)
    if not feature_cols:
        raise ValueError("ols_fit: need at least one feature column")
    ok = F.col(label_col).isNotNull()
    for c in feature_cols:
        ok = ok & F.col(c).isNotNull()
    xs = [F.col(c).cast("double") for c in feature_cols]
    if intercept:
        xs = xs + [F.lit(1.0)]
    y = F.col(label_col).cast("double")
    src = df.filter(ok).select(
        *[x.alias(f"__x{k}") for k, x in enumerate(xs)], y.alias("__y")
    )
    xs = [F.col(f"__x{k}") for k in range(d)]
    yy = F.col("__y")
    pairs = [(k, l) for k in range(d) for l in range(k, d)]
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(yy * yy).alias("syy"),
            F.sum(yy).alias("sy")]
    for k in range(d):
        aggs.append(F.sum(xs[k] * yy).alias(f"xy_{k}"))
    for k, l in pairs:
        aggs.append(F.sum(xs[k] * xs[l]).alias(f"g_{k}_{l}"))
    row = src.agg(*aggs).collect()[0]
    n = int(row["n"] or 0)
    if n == 0:
        raise ValueError("ols_fit: no complete rows (empty or all-NULL)")
    G = np.zeros((d, d), dtype=np.float64)
    for k, l in pairs:
        G[k, l] = G[l, k] = row[f"g_{k}_{l}"]
    xy = np.array([row[f"xy_{k}"] for k in range(d)], dtype=np.float64)
    P = np.eye(d)
    if intercept:
        P[d - 1, d - 1] = 0.0
    try:
        beta = np.linalg.solve(G + reg * P, xy)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "ols_fit: singular normal equations (collinear features) -"
            " pass reg > 0"
        ) from exc
    cond = np.linalg.cond(G + reg * P)
    if not np.isfinite(cond) or cond > 1e14:
        raise ValueError(
            "ols_fit: singular normal equations (collinear features) -"
            " pass reg > 0"
        )
    syy = float(row["syy"])
    sy = float(row["sy"])
    sse = syy - 2.0 * float(beta @ xy) + float(beta @ G @ beta)
    sst = syy - sy * sy / n
    r2 = 1.0 - sse / sst if sst != 0 else None
    cols = list(feature_cols) + (["__intercept"] if intercept else [])
    return {
        "beta": beta.tolist(),
        "cols": cols,
        "n": n,
        "r2": r2,
        "reg": float(reg),
    }


def ols_predict(df: DataFrame, model: dict, out_col: str = "yhat") -> DataFrame:
    """Linear score ``x·β`` per row — pure JVM expression (the
    cox_predict/poisson_predict serving rule); appends ``out_col``."""
    z = F.lit(0.0)
    for c, w in zip(model["cols"], model["beta"]):
        if c == "__intercept":
            z = z + F.lit(float(w))
        else:
            z = z + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, z)


def _pava(rates: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators over ordered bins: the unique
    non-decreasing weighted-least-squares fit. Stack of
    (value, weight, n_bins_pooled) blocks, deterministic, O(bins)."""
    stack: list[list[float]] = []  # [value, weight, n_bins]
    for r, w in zip(rates, weights):
        stack.append([float(r), float(w), 1])
        while len(stack) > 1 and stack[-2][0] > stack[-1][0]:
            v1, w1, c1 = stack[-2]
            v2, w2, c2 = stack[-1]
            stack = stack[:-2] + [
                [(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2, c1 + c2]
            ]
    res = np.empty(len(rates), dtype=np.float64)
    i = 0
    for v, _w, c in stack:
        res[i : i + int(c)] = v
        i += int(c)
    return res


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 50,
) -> DataFrame:
    """Monotone (isotonic) probability calibration of a model score:
    bin scores, fit the unique non-decreasing rate curve by
    pool-adjacent-violators, return the per-bin calibration table —
    the standard post-hoc fix when a ranker's raw scores are good at
    ORDERING but lie as probabilities.

    Distributed shape: one pass bins the scores (fixed-width on the
    observed [min, max] — two tiny jobs) and aggregates per-bin
    ``(n, positives)``; the ≤``n_bins``-row summary collects to the
    driver where PAVA runs (the bounded-collect discipline — the
    sequential pooling is inherently ordered, and at ≤1000 bins it is
    microseconds; the DATA never leaves the executors).  Calibrated
    scoring is then a broadcast join/range lookup against the
    returned table.  Returns ``(bin, lo, hi, n, rate, calibrated)``
    with ``calibrated`` non-decreasing in ``bin``.
    """
    stats = df.agg(
        F.min(F.col(score_col).cast("double")).alias("lo"),
        F.max(F.col(score_col).cast("double")).alias("hi"),
    ).collect()[0]
    if stats.lo is None:
        raise ValueError(
            f"isotonic_calibrate: no non-null values in {score_col!r} "
            "to calibrate (empty input or all-NULL score column)"
        )
    lo, hi = float(stats.lo), float(stats.hi)
    width = (hi - lo) / n_bins if hi > lo else 1.0
    b = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col(score_col).cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
    )
    per = (
        df.select(b.alias("bin"), F.col(label_col).cast("double").alias("y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .orderBy("bin")
    )
    rows = per.collect()
    bins = [int(r.bin) for r in rows]
    n = np.array([float(r.n) for r in rows])
    rate = np.array([float(r.pos) / float(r.n) for r in rows])
    cal = _pava(rate, n)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (bins[i], lo + bins[i] * width, lo + (bins[i] + 1) * width,
             int(n[i]), float(rate[i]), float(cal[i]))
            for i in range(len(bins))
        ],
        "bin int, lo double, hi double, n long, rate double, calibrated double",
    )
    return out


def calibration_error(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error + Brier score: is a probability
    column honest — the metric side of :func:`isotonic_calibrate`.

    Scores bin by fixed width on [0, 1] (probabilities have a known
    domain — no min/max job needed); per bin the mean predicted
    ``conf`` vs realized ``rate``; ``ECE = Σ (n_b/N)·|rate − conf|``
    and the Brier score ``mean((p − y)²)`` come from the same single
    scan.  Returns one row ``(n, ece, brier)`` plus the per-bin
    breakdown as an array of structs (bin, n, conf, rate) for the
    reliability diagram.
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    b = F.least(F.lit(n_bins - 1), F.floor(p * n_bins).cast("int"))
    per = (
        df.select(b.alias("bin"), p.alias("p"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.avg("p").alias("conf"),
            F.avg("y").alias("rate"),
            F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias("sq"),
        )
    )
    return per.agg(
        F.sum("nb").cast("long").alias("n"),
        (
            F.sum(F.col("nb") * F.abs(F.col("rate") - F.col("conf")))
            / F.sum("nb")
        ).alias("ece"),
        (F.sum("sq") / F.sum("nb")).alias("brier"),
        F.array_sort(
            F.collect_list(
                F.struct("bin", F.col("nb").alias("n"), "conf", "rate")
            )
        ).alias("bins"),
    )


def cox_fit(
    df: DataFrame,
    time_col: str,
    event_col: str,
    feature_cols: list[str],
    iters: int = 8,
    reg: float = 1e-9,
    high_cardinality: bool | str = "auto",
    n_parts: int | None = None,
    strata_col: str | None = None,
    ties: str = "breslow",
) -> dict:
    """Cox proportional-hazards regression (partial likelihood, Breslow
    or Efron ties) — the covariate-ADJUSTED survival answer: ``kaplan_meier`` /
    ``logrank_test`` (operators/stats.py) say whether arm B converted
    faster; this says by how much per covariate, holding the others
    fixed, under right censoring.  ``hazard_i(t) = h0(t)·exp(x_i·β)``.

    Newton on the Breslow partial log-likelihood
    ``ℓ(β) = Σ_t [ sx_t·β − d_t·ln S0(t) ]`` over distinct event times
    t, with risk-set sums ``S0 = Σ_{t_j ≥ t} w_j``,
    ``S1 = Σ w_j x_j``, ``S2 = Σ w_j x_j x_jᵀ`` (``w = exp(x·β)``),
    gradient ``Σ_t [sx_t − d_t·S1/S0]`` and information matrix
    ``Σ_t d_t·(S2/S0 − (S1/S0)(S1/S0)ᵀ)``.

    Spark shape per Newton iteration — ENTIRELY JVM-side expressions,
    no Python on the data path (one step further than logistic_fit's
    mapInPandas partials): ``w`` and its moments are plain column
    algebra with β inlined as literals; ONE groupBy onto the
    distinct-time frame computes per-time partials (1 + d + d(d+1)/2
    moment columns + event sums); the risk-set sums are SUFFIX
    cumulative sums over that frame — ``suffix = total − (inclusive
    cumsum − own)`` via ``stats._cdf_prefix``, so
    ``high_cardinality=True`` survives subject-sized distinct-time
    frames (exact-microsecond durations) with no single-task window;
    one closing aggregate collects (d² + d + 1) doubles to the driver
    for the d×d solve.  Per-iteration driver state is O(d²), cluster
    work one scan — the ALS/IRLS discipline.  ``reg`` ridges the
    information matrix (monotone-separation safeguard, the
    logistic_fit rule).

    ``strata_col`` fits STRATIFIED Cox: one shared β, but risk sets
    (and so the partial likelihood) form WITHIN each stratum — the
    standard multi-site/cohort form when baselines differ but effects
    are assumed common.  The per-time groupBy gains the stratum key
    and every cumulative window partitions by it, so each stratum's
    frame is bounded by ITS distinct times (the kaplan_meier_grouped
    design) — which is also why ``high_cardinality`` is not combined
    with strata (the partitioned window IS the scale shape there;
    a single giant stratum should be fit unstratified with
    ``high_cardinality=True``).

    ``ties="efron"`` applies Efron's tie correction (Efron 1977, the
    survival-package default): at a time with ``d_t`` tied events the
    j-th event's denominator is ``S0 − (j/d_t)·E0`` (``E0/E1/E2`` the
    event-only weight moments AT that time, j = 0..d_t−1), removing
    the toward-zero β bias Breslow shows under heavy ties.  The
    inner Σ_j is a JVM higher-order ``aggregate`` over
    ``sequence(0, d_t−1)`` — Σd_t = n_events total terms, distributed,
    still zero Python on the data path; with no ties (every d_t = 1)
    the two estimators coincide exactly (pytest-asserted).

    Rows with a NULL duration, NULL event flag, or NULL in ANY feature
    column are excluded up front (the kaplan_meier / spearman
    pairwise-complete rule — without the feature filter a NULL
    feature would drop the subject from the risk-set sums while
    ``dt`` still counted its event, silently biasing the score).
    Fixed ``iters`` keeps the result a deterministic function of the
    input up to float partial-sum re-association (parity asserted to
    1e-9 in tests — the ALS tolerance).  No SQL mirror (matrix
    solves); verification is a numpy replica of the identical
    schedule (tests/test_glm.py) — the OPQ/ALS discipline.

    Returns ``{"beta": [...], "cols": feature_cols, "iters": n,
    "loglik": float, "n_events": int}`` where ``loglik`` is the
    partial log-likelihood evaluated AT the returned β (one extra
    ll-only pass after the last Newton step — not the stale
    penultimate iterate).
    """
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.stats import (
        _cdf_prefix,
        _resolve_high_cardinality,
    )

    d = len(feature_cols)
    if d == 0:
        raise ValueError("cox_fit: need at least one feature column")
    if ties not in ("breslow", "efron"):
        raise ValueError(f"cox_fit: unknown ties rule {ties!r}")
    if strata_col is not None:
        if high_cardinality is True:
            raise ValueError(
                "cox_fit: strata_col and high_cardinality are mutually"
                " exclusive (per-stratum windows are the scale shape)"
            )
        high_cardinality = False
    else:
        high_cardinality = _resolve_high_cardinality(
            df.filter(F.col(time_col).isNotNull()),
            [time_col],
            high_cardinality,
        )
    strat = [F.col(strata_col).alias("__s")] if strata_col else []
    feat_ok = F.lit(True)
    for c in feature_cols:
        feat_ok = feat_ok & F.col(c).isNotNull()
    src = (
        df.filter(
            F.col(time_col).isNotNull()
            & F.col(event_col).isNotNull()
            & feat_ok
        )
        .select(
            *strat,
            F.col(time_col).cast("double").alias("__t"),
            F.col(event_col).cast("double").alias("__e"),
            *[
                F.col(c).cast("double").alias(f"__x{k}")
                for k, c in enumerate(feature_cols)
            ],
        )
    )
    pairs = [(k, l) for k in range(d) for l in range(k, d)]
    efron = ties == "efron"

    def _esum(term):
        # Efron's inner Σ_{j=0}^{d_t−1} term(j/d_t) as a JVM
        # higher-order aggregate over sequence(0, d_t−1): Σd_t =
        # n_events terms total across the frame, distributed, no
        # Python.  Only evaluated on event times (dt ≥ 1 after the
        # filter below), so the sequence is never empty/negative.
        seq = F.sequence(
            F.lit(0).cast("long"), F.col("dt").cast("long") - F.lit(1)
        )
        return F.aggregate(
            seq,
            F.lit(0.0),
            lambda acc, j: acc + term(j.cast("double") / F.col("dt")),
        )

    def _event_frame(beta_vec):
        """Per-distinct-time moment frame at β (risk-set suffix sums
        attached), filtered to event times; returns ``(frame, sfx)``."""
        z = F.lit(0.0)
        for k in range(d):
            z = z + F.col(f"__x{k}") * F.lit(float(beta_vec[k]))
        w = F.exp(z)
        e = F.col("__e")
        aggs = [F.sum(w).alias("a0"), F.sum(e).alias("dt")]
        for k in range(d):
            aggs.append(F.sum(w * F.col(f"__x{k}")).alias(f"a1_{k}"))
            aggs.append(F.sum(e * F.col(f"__x{k}")).alias(f"sx_{k}"))
        for k, l in pairs:
            aggs.append(
                F.sum(w * F.col(f"__x{k}") * F.col(f"__x{l}")).alias(
                    f"a2_{k}_{l}"
                )
            )
        if efron:
            # event-only weight moments AT each time — Efron's E0/E1/E2
            aggs.append(F.sum(e * w).alias("e0"))
            for k in range(d):
                aggs.append(F.sum(e * w * F.col(f"__x{k}")).alias(f"e1_{k}"))
            for k, l in pairs:
                aggs.append(
                    F.sum(e * w * F.col(f"__x{k}") * F.col(f"__x{l}")).alias(
                        f"e2_{k}_{l}"
                    )
                )
        weights = ["a0"] + [f"a1_{k}" for k in range(d)] + [
            f"a2_{k}_{l}" for k, l in pairs
        ]
        if strata_col is None:
            per = src.groupBy(F.col("__t").alias("t")).agg(*aggs)
            cum = _cdf_prefix(per, "t", weights, high_cardinality, n_parts)
        else:
            # per-stratum risk sets: cumulative + total windows keyed
            # on the stratum, frames bounded by each stratum's times
            from pyspark.sql import Window

            per = src.groupBy(F.col("__s"), F.col("__t").alias("t")).agg(*aggs)
            w_cum = (
                Window.partitionBy("__s")
                .orderBy("t")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            w_all = Window.partitionBy("__s")
            cum = per
            for c in weights:
                cum = cum.withColumn(f"__cum_{c}", F.sum(c).over(w_cum)).withColumn(
                    f"__tot_{c}", F.sum(c).over(w_all)
                )

        def sfx(c):
            # suffix-inclusive sum over {t_j >= t} (within the stratum
            # when stratified — the windows above are stratum-keyed)
            return F.col(f"__tot_{c}") - (F.col(f"__cum_{c}") - F.col(c))

        return cum.filter(F.col("dt") > 0), sfx

    def _ll_col(beta_vec, sfx):
        s0 = sfx("a0")
        bx = sum(
            (F.col(f"sx_{k}") * F.lit(float(beta_vec[k])) for k in range(d)),
            F.lit(0.0),
        )
        if not efron:
            return F.sum(bx - F.col("dt") * F.log(s0)).alias("__ll")
        return F.sum(
            bx - _esum(lambda f: F.log(s0 - f * F.col("e0")))
        ).alias("__ll")

    def _score_cols(sfx):
        s0 = sfx("a0")
        out = []
        for k in range(d):
            if not efron:
                t = F.col("dt") * sfx(f"a1_{k}") / s0
            else:
                t = _esum(
                    lambda f, k=k: (sfx(f"a1_{k}") - f * F.col(f"e1_{k}"))
                    / (s0 - f * F.col("e0"))
                )
            out.append(F.sum(F.col(f"sx_{k}") - t).alias(f"g_{k}"))
        for k, l in pairs:
            if not efron:
                t = F.col("dt") * (
                    sfx(f"a2_{k}_{l}") / s0
                    - (sfx(f"a1_{k}") / s0) * (sfx(f"a1_{l}") / s0)
                )
            else:

                def term(f, k=k, l=l):
                    phi = s0 - f * F.col("e0")
                    u = sfx(f"a1_{k}") - f * F.col(f"e1_{k}")
                    v = sfx(f"a1_{l}") - f * F.col(f"e1_{l}")
                    return (
                        (sfx(f"a2_{k}_{l}") - f * F.col(f"e2_{k}_{l}")) / phi
                        - u * v / (phi * phi)
                    )

                t = _esum(term)
            out.append(F.sum(t).alias(f"h_{k}_{l}"))
        return out

    beta = np.zeros(d, dtype=np.float64)
    for _ in range(iters):
        ev, sfx = _event_frame(beta)
        out_cols = [F.sum("dt").alias("__nev")] + _score_cols(sfx)
        row = ev.agg(*out_cols).collect()[0]
        # all-censored input: the event-time filter leaves an empty
        # frame and every sum is NULL — a clear error, not a crash
        if row["__nev"] is None or int(row["__nev"]) == 0:
            raise ValueError("cox_fit: no events observed (all censored)")
        g = np.array([row[f"g_{k}"] for k in range(d)], dtype=np.float64)
        H = np.zeros((d, d), dtype=np.float64)
        for k, l in pairs:
            H[k, l] = H[l, k] = row[f"h_{k}_{l}"]
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    # loglik AT the returned β — one ll-only closing pass, so the
    # reported likelihood is not one Newton step stale (round-10
    # ADVICE); also sets n_events for the iters=0 degenerate call
    ev, sfx = _event_frame(beta)
    row = ev.agg(F.sum("dt").alias("__nev"), _ll_col(beta, sfx)).collect()[0]
    if row["__nev"] is None or int(row["__nev"]) == 0:
        raise ValueError("cox_fit: no events observed (all censored)")
    n_events = int(row["__nev"])
    loglik = float(row["__ll"])
    return {
        "beta": beta.tolist(),
        "cols": list(feature_cols),
        "iters": iters,
        "loglik": loglik,
        "n_events": n_events,
    }


def cox_predict(
    df: DataFrame, model: dict, out_col: str = "hazard_ratio"
) -> DataFrame:
    """Relative risk ``exp(x·β)`` for every row — the Cox serving
    path, a pure JVM-side expression (the logistic_predict rule: no
    Python anywhere near serving); appends ``out_col`` to ``df``."""
    z = F.lit(0.0)
    for c, w in zip(model["cols"], model["beta"]):
        z = z + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, F.exp(z))


def cox_baseline(
    df: DataFrame,
    time_col: str,
    event_col: str,
    model: dict,
    high_cardinality: bool | str = "auto",
    n_parts: int | None = None,
) -> DataFrame:
    """Breslow baseline cumulative hazard for a fitted :func:`cox_fit`
    model — the piece that turns coefficients into TIME predictions:
    ``H0(t) = Σ_{t_i ≤ t} d_i / S0(t_i)`` with ``S0`` the fitted-weight
    risk-set sum, and ``S(t|x) = exp(−H0(t))^{exp(x·β)}`` the subject
    survival curve (serve it by joining this frame and applying
    :func:`cox_predict`'s hazard ratio — both pure expressions).

    Same machinery as the fit: ``w = exp(x·β)`` with the FITTED β
    inlined as literals, one groupBy onto the distinct-time frame,
    ``S0`` as a suffix cumulative via ``stats._cdf_prefix``, and
    ``H0`` as the PREFIX cumulative of ``d/S0`` over event times —
    two prefix passes, both high-cardinality-safe.  With all-zero β
    this reduces exactly to the Nelson-Aalen estimator ``Σ d_i/n_i``
    (cross-checked against the Kaplan-Meier risk sets in tests).
    Returns ``(t, d, s0, h0, baseline_survival)`` for event times,
    ordered by t.
    """
    cols = model["cols"]
    beta = model["beta"]
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.stats import (
        _cdf_prefix,
        _resolve_high_cardinality,
    )

    high_cardinality = _resolve_high_cardinality(
        df.filter(F.col(time_col).isNotNull()), [time_col], high_cardinality
    )
    z = F.lit(0.0)
    for c, b in zip(cols, beta):
        z = z + F.col(c).cast("double") * F.lit(float(b))
    src = df.filter(F.col(time_col).isNotNull()).select(
        F.col(time_col).cast("double").alias("t"),
        F.col(event_col).cast("double").alias("__e"),
        F.exp(z).alias("__w"),
    )
    per = src.groupBy("t").agg(
        F.sum("__w").alias("a0"), F.sum("__e").alias("dt")
    )
    cum = _cdf_prefix(per, "t", ["a0"], high_cardinality, n_parts)
    s0 = F.col("__tot_a0") - (F.col("__cum_a0") - F.col("a0"))
    ev = cum.select("t", "dt", s0.alias("s0")).filter(F.col("dt") > 0)
    step = ev.withColumn("__h", F.col("dt") / F.col("s0"))
    h0 = _cdf_prefix(step, "t", ["__h"], high_cardinality, n_parts)
    return (
        h0.select(
            "t",
            F.col("dt").cast("long").alias("d"),
            "s0",
            F.col("__cum___h").alias("h0"),
            F.exp(-F.col("__cum___h")).alias("baseline_survival"),
        )
        .orderBy("t")
    )


def poisson_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    reg: float = 1e-9,
    intercept: bool = True,
) -> dict:
    """Poisson regression (log link) by Newton/IRLS — the count-data
    GLM (events per user-day, purchases per session, tokens per doc):
    ``E[y] = exp(x·β)``, update ``β += (XᵀWX + reg·I)⁻¹ Xᵀ(y−μ)`` with
    ``W = diag(μ)``.

    Unlike :func:`logistic_fit`'s mapInPandas partials, the Poisson
    moments are PURE column aggregates with β inlined as literals —
    ``H_kl = Σ μ·x_k·x_l`` and ``g_k = Σ (y−μ)·x_k`` are one groupless
    aggregate of d(d+3)/2 doubles per iteration, zero Python on the
    data path (the :func:`cox_fit` discipline; logistic keeps the
    Arrow seam because its stable sigmoid needs a branch per row).
    Fixed iterations; ``reg`` ridges the solve.  Returns ``{"beta",
    "cols", "iters", "loglik"}`` (intercept LAST), ``loglik`` the
    Poisson log-likelihood up to the ``−Σln(y!)`` constant evaluated
    AT the returned β (one ll-only closing aggregate after the last
    Newton step — not the stale penultimate iterate; round-10 ADVICE).
    Score with :func:`poisson_predict`.
    """
    d = len(feature_cols) + (1 if intercept else 0)
    ok = F.col(label_col).isNotNull()
    for c in feature_cols:
        ok = ok & F.col(c).isNotNull()
    xs = [F.col(c).cast("double") for c in feature_cols]
    if intercept:
        xs = xs + [F.lit(1.0)]
    y = F.col(label_col).cast("double")
    src = df.filter(ok).select(
        *[x.alias(f"__x{k}") for k, x in enumerate(xs)], y.alias("__y")
    )
    xs = [F.col(f"__x{k}") for k in range(d)]
    beta = np.zeros(d, dtype=np.float64)
    if intercept:
        # standard GLM warm start: intercept = ln(mean y) — Newton from
        # an all-zero β overshoots badly when counts are large (μ jumps
        # by e^step); starting at the null model keeps every step tame
        mean_y = src.agg(F.avg("__y")).collect()[0][0]
        if mean_y is None:
            raise ValueError("poisson_fit: empty input")
        beta[d - 1] = float(np.log(max(float(mean_y), 1e-12)))
    pairs = [(k, l) for k in range(d) for l in range(k, d)]

    def _linear(beta_vec):
        z = F.lit(0.0)
        for k in range(d):
            z = z + xs[k] * F.lit(float(beta_vec[k]))
        return z

    for _ in range(iters):
        z = _linear(beta)
        mu = F.exp(z)
        aggs = []
        for k in range(d):
            aggs.append(F.sum((F.col("__y") - mu) * xs[k]).alias(f"g_{k}"))
        for k, l in pairs:
            aggs.append(F.sum(mu * xs[k] * xs[l]).alias(f"h_{k}_{l}"))
        row = src.agg(*aggs).collect()[0]
        if row[f"g_0"] is None:
            raise ValueError("poisson_fit: empty input")
        g = np.array([row[f"g_{k}"] for k in range(d)], dtype=np.float64)
        H = np.zeros((d, d), dtype=np.float64)
        for k, l in pairs:
            H[k, l] = H[l, k] = row[f"h_{k}_{l}"]
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    # loglik AT the returned β — one ll-only closing aggregate so the
    # reported likelihood matches the returned coefficients
    z = _linear(beta)
    ll = src.agg(F.sum(F.col("__y") * z - F.exp(z)).alias("__ll")).collect()[0]
    if ll["__ll"] is None:
        raise ValueError("poisson_fit: empty input")
    loglik = float(ll["__ll"])
    cols = list(feature_cols) + (["__intercept"] if intercept else [])
    return {"beta": beta.tolist(), "cols": cols, "iters": iters, "loglik": loglik}


def negbin_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    alpha: float = 1.0,
    iters: int = 8,
    reg: float = 1e-9,
    intercept: bool = True,
) -> dict:
    """Negative-binomial (NB2) regression with log link and FIXED
    dispersion ``alpha`` — the overdispersed-count completion of
    :func:`poisson_fit` (count data where Var = μ + αμ² ≫ μ: events
    per user, tokens per doc with heavy tails; Poisson's Var = μ
    assumption understates the noise and overstates significance).

    Fisher-scoring update with the same pure-column-aggregate
    discipline as Poisson — score ``g_k = Σ (y−μ)/(1+αμ)·x_k`` and
    expected information ``H_kl = Σ μ/(1+αμ)·x_k·x_l`` are one
    groupless aggregate of d(d+3)/2 doubles per iteration, β inlined
    as literals, zero Python on the data path.  ``alpha → 0``
    recovers Poisson exactly (pytest-asserted).  ``loglik`` is the
    β-dependent part ``Σ[y·ln μ − (y + 1/α)·ln(1 + αμ)]`` evaluated
    AT the returned β (the Γ terms are β-free constants — no lgamma
    needed, which Spark SQL lacks); same warm start (intercept =
    ln ȳ) and ridge as Poisson.  Rows where any feature or the label
    is NULL are filtered up front (the ols_fit/cox_fit rule): the
    information term ``μ/(1+αμ)·x_k·x_l`` involves no y, so a
    NULL-label row would inflate H while dropping out of g, biasing
    every Newton step toward the warm start (round-11 ADVICE).  Returns ``{"beta", "cols", "iters",
    "alpha", "loglik"}`` (intercept LAST); score with
    :func:`poisson_predict` (the mean function is the same exp(x·β)).
    """
    if alpha < 0:
        raise ValueError(f"negbin_fit: alpha must be >= 0, got {alpha}")
    d = len(feature_cols) + (1 if intercept else 0)
    ok = F.col(label_col).isNotNull()
    for c in feature_cols:
        ok = ok & F.col(c).isNotNull()
    xs = [F.col(c).cast("double") for c in feature_cols]
    if intercept:
        xs = xs + [F.lit(1.0)]
    y = F.col(label_col).cast("double")
    src = df.filter(ok).select(
        *[x.alias(f"__x{k}") for k, x in enumerate(xs)], y.alias("__y")
    )
    xs = [F.col(f"__x{k}") for k in range(d)]
    beta = np.zeros(d, dtype=np.float64)
    if intercept:
        mean_y = src.agg(F.avg("__y")).collect()[0][0]
        if mean_y is None:
            raise ValueError("negbin_fit: empty input")
        beta[d - 1] = float(np.log(max(float(mean_y), 1e-12)))
    pairs = [(k, l) for k in range(d) for l in range(k, d)]
    a = float(alpha)

    def _linear(beta_vec):
        z = F.lit(0.0)
        for k in range(d):
            z = z + xs[k] * F.lit(float(beta_vec[k]))
        return z

    for _ in range(iters):
        z = _linear(beta)
        mu = F.exp(z)
        wdenom = F.lit(1.0) + F.lit(a) * mu
        aggs = []
        for k in range(d):
            aggs.append(
                F.sum((F.col("__y") - mu) / wdenom * xs[k]).alias(f"g_{k}")
            )
        for k, l in pairs:
            aggs.append(
                F.sum(mu / wdenom * xs[k] * xs[l]).alias(f"h_{k}_{l}")
            )
        row = src.agg(*aggs).collect()[0]
        if row["g_0"] is None:
            raise ValueError("negbin_fit: empty input")
        g = np.array([row[f"g_{k}"] for k in range(d)], dtype=np.float64)
        H = np.zeros((d, d), dtype=np.float64)
        for k, l in pairs:
            H[k, l] = H[l, k] = row[f"h_{k}_{l}"]
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    z = _linear(beta)
    mu = F.exp(z)
    if a > 0:
        ll_term = F.col("__y") * z - (F.col("__y") + F.lit(1.0 / a)) * F.log(
            F.lit(1.0) + F.lit(a) * mu
        )
    else:
        ll_term = F.col("__y") * z - mu  # Poisson limit
    ll = src.agg(F.sum(ll_term).alias("__ll")).collect()[0]
    if ll["__ll"] is None:
        raise ValueError("negbin_fit: empty input")
    cols = list(feature_cols) + (["__intercept"] if intercept else [])
    return {
        "beta": beta.tolist(),
        "cols": cols,
        "iters": iters,
        "alpha": a,
        "loglik": float(ll["__ll"]),
    }


def poisson_predict(
    df: DataFrame, model: dict, out_col: str = "mu"
) -> DataFrame:
    """Expected count ``exp(x·β)`` per row — pure JVM expression (the
    cox_predict/logistic_predict serving rule); appends ``out_col``."""
    z = F.lit(0.0)
    for c, w in zip(model["cols"], model["beta"]):
        if c == "__intercept":
            z = z + F.lit(float(w))
        else:
            z = z + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, F.exp(z))
