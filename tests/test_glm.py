"""Logistic IRLS (operators/glm.py): numpy-replica parity,
partitioning independence, and recoverability — the ALS/OPQ
no-SQL-mirror verification discipline."""

from __future__ import annotations

import math
import random

import numpy as np

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import glm


def _data(n=600, seed=11):
    rnd = random.Random(seed)
    rows = []
    true_b = np.array([1.5, -2.0, 0.5])  # x1, x2, intercept
    for _ in range(n):
        x1, x2 = rnd.gauss(0, 1), rnd.gauss(0, 1)
        z = true_b[0] * x1 + true_b[1] * x2 + true_b[2]
        p = 1.0 / (1.0 + math.exp(-z))
        rows.append((x1, x2, 1 if rnd.random() < p else 0))
    return rows, true_b


def _replica(rows, iters=6, reg=1e-6):
    X = np.array([[r[0], r[1], 1.0] for r in rows])
    y = np.array([float(r[2]) for r in rows])
    beta = np.zeros(3)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        H = (X.T * w) @ X
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(H + reg * np.eye(3), g)
    return beta


def test_logistic_matches_replica_and_truth(spark):
    rows, true_b = _data()
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    m = glm.logistic_fit(df, ["x1", "x2"], "y", iters=6)
    want = _replica(rows)
    assert np.allclose(np.array(m["beta"]), want, atol=1e-9)
    # recovered coefficients near the generating ones (n=600 noise)
    assert np.allclose(np.array(m["beta"]), true_b, atol=0.5)


def test_logistic_partitioning_independent(spark):
    rows, _ = _data(n=300, seed=5)
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    m1 = glm.logistic_fit(df, ["x1", "x2"], "y", iters=4)
    m2 = glm.logistic_fit(df.repartition(11), ["x1", "x2"], "y", iters=4)
    assert np.allclose(m1["beta"], m2["beta"], atol=1e-9)


def test_logistic_predict_serving_path(spark):
    rows, _ = _data(n=400, seed=9)
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    m = glm.logistic_fit(df, ["x1", "x2"], "y", iters=6)
    scored = glm.logistic_predict(df, m).collect()
    # JVM expression equals the numpy sigmoid of the same linear term
    b = np.array(m["beta"])
    for r in scored[:50]:
        z = b[0] * r.x1 + b[1] * r.x2 + b[2]
        p = 1.0 / (1.0 + math.exp(-z)) if z >= 0 else math.exp(z) / (1 + math.exp(z))
        assert abs(r.p - p) < 1e-12
    # sanity: model separates (AUC proxy — mean p for 1s > mean p for 0s)
    p1 = np.mean([r.p for r in scored if r.y == 1])
    p0 = np.mean([r.p for r in scored if r.y == 0])
    assert p1 > p0 + 0.2


def test_logistic_separation_guarded(spark):
    # perfectly separable data: unregularized MLE diverges; the ridge
    # keeps the solve finite and the decision direction right
    rows = [(float(i), 1 if i > 0 else 0) for i in range(-20, 21) if i != 0]
    df = spark.createDataFrame(rows, "x double, y int")
    m = glm.logistic_fit(df, ["x"], "y", iters=8, reg=1e-3)
    assert all(math.isfinite(v) for v in m["beta"])
    assert m["beta"][0] > 0


def test_ols_closed_form_recovers_plane(spark):
    import random

    rnd = random.Random(2)
    rows = []
    for _ in range(300):
        u, v = rnd.uniform(0, 10), rnd.uniform(0, 1)
        t = 4.0 * u - 7.0 * v + 3.0 + rnd.gauss(0, 0.01)
        rows.append((u, v, t))
    df = spark.createDataFrame(rows, "u double, v double, t double")
    r = glm.ols_two_features(df, "u", "v", "t").collect()[0]
    assert abs(r.beta_u - 4.0) < 0.01
    assert abs(r.beta_v + 7.0) < 0.05
    assert abs(r.beta0 - 3.0) < 0.05
    assert r.r2 > 0.999
    # numpy lstsq parity on the exact same data
    X = np.array([[a, b, 1.0] for a, b, _ in rows])
    y = np.array([t for _, _, t in rows])
    want, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose([r.beta_u, r.beta_v, r.beta0], want, atol=1e-6)
    # collinear features: singular -> NULL, not a divide error
    bad = spark.createDataFrame([(1.0, 2.0, 3.0), (2.0, 4.0, 5.0), (3.0, 6.0, 9.0)], "u double, v double, t double")
    rb = glm.ols_two_features(bad, "u", "v", "t").collect()[0]
    assert rb.beta_u is None and rb.r2 is None


def _brute_isotonic(rates, weights):
    """Quadratic reference: minimize sum w (r - f)^2 over non-decreasing
    f via repeated full pooling passes (provably converges to PAVA's
    unique solution)."""
    vals = [float(r) for r in rates]
    wts = [float(w) for w in weights]
    blocks = [[v, w] for v, w in zip(vals, wts)]
    changed = True
    while changed:
        changed = False
        out = []
        for b in blocks:
            out.append(list(b))
            while len(out) > 1 and out[-2][0] > out[-1][0]:
                v = (out[-2][0] * out[-2][1] + out[-1][0] * out[-1][1]) / (
                    out[-2][1] + out[-1][1]
                )
                merged = [v, out[-2][1] + out[-1][1]]
                out = out[:-2] + [merged]
                changed = True
        blocks = out
    res = []
    i = 0
    for v, w in blocks:
        k = 0
        acc = 0.0
        while i + k < len(wts) and acc + 1e-9 < w:
            acc += wts[i + k]
            k += 1
        res.extend([v] * k)
        i += k
    return res


def test_pava_properties():
    import random

    rnd = random.Random(17)
    rates = np.array([rnd.random() for _ in range(40)])
    weights = np.array([rnd.randint(1, 9) for _ in range(40)], dtype=float)
    fit = glm._pava(rates, weights)
    # non-decreasing
    assert all(fit[i] <= fit[i + 1] + 1e-12 for i in range(len(fit) - 1))
    # weighted mean preserved (projection property)
    assert abs(np.dot(fit, weights) - np.dot(rates, weights)) < 1e-9
    # matches the brute-force reference
    want = _brute_isotonic(rates, weights)
    assert np.allclose(fit, want, atol=1e-12)
    # already-monotone input unchanged
    mono = np.sort(rates)
    assert np.allclose(glm._pava(mono, weights), mono)


def test_isotonic_calibrate_end_to_end(spark):
    import random

    rnd = random.Random(23)
    rows = []
    for _ in range(4000):
        s = rnd.random()
        # true prob rises with score but with a noisy dip region
        p = min(1.0, max(0.0, s * 0.8 + (0.15 if 0.4 < s < 0.5 else 0.0)))
        rows.append((s, 1 if rnd.random() < p else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    out = glm.isotonic_calibrate(df, "score", "y", n_bins=25).orderBy("bin").collect()
    cal = [r.calibrated for r in out]
    assert all(cal[i] <= cal[i + 1] + 1e-12 for i in range(len(cal) - 1))
    # total positives preserved: sum n*calibrated == sum n*rate
    a = sum(r.n * r.calibrated for r in out)
    b = sum(r.n * r.rate for r in out)
    assert abs(a - b) < 1e-6
    # calibrated curve tracks the true trend: top bin >> bottom bin
    assert cal[-1] > cal[0] + 0.4


def test_isotonic_calibrate_empty_input_raises(spark):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    empty = spark.createDataFrame([], "score double, y int")
    with pytest.raises(ValueError, match="no non-null"):
        GLM.isotonic_calibrate(empty, "score", "y")
    allnull = spark.createDataFrame([(None, 1), (None, 0)], "score double, y int")
    with pytest.raises(ValueError, match="no non-null"):
        GLM.isotonic_calibrate(allnull, "score", "y")


def _cox_numpy(t, e, X, iters=8, reg=1e-9):
    """Breslow-ties Cox Newton replica of glm.cox_fit's exact schedule:
    per-distinct-time moment sums, suffix risk-set sums, d x d solve."""
    import numpy as np

    t = np.asarray(t, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    d = X.shape[1]
    beta = np.zeros(d)
    times = np.unique(t)
    for _ in range(iters):
        w = np.exp(X @ beta)
        a0 = np.zeros(len(times))
        a1 = np.zeros((len(times), d))
        a2 = np.zeros((len(times), d, d))
        dt = np.zeros(len(times))
        sx = np.zeros((len(times), d))
        idx = np.searchsorted(times, t)
        for i in range(len(t)):
            j = idx[i]
            a0[j] += w[i]
            a1[j] += w[i] * X[i]
            a2[j] += w[i] * np.outer(X[i], X[i])
            dt[j] += e[i]
            sx[j] += e[i] * X[i]
        # suffix sums over times ascending = risk sets {t_j >= t}
        s0 = np.cumsum(a0[::-1])[::-1]
        s1 = np.cumsum(a1[::-1], axis=0)[::-1]
        s2 = np.cumsum(a2[::-1], axis=0)[::-1]
        ev = dt > 0
        g = (sx[ev] - dt[ev, None] * s1[ev] / s0[ev, None]).sum(axis=0)
        m1 = s1[ev] / s0[ev, None]
        H = (
            dt[ev, None, None]
            * (s2[ev] / s0[ev, None, None] - m1[:, :, None] * m1[:, None, :])
        ).sum(axis=0)
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    return beta


def test_cox_fit_matches_numpy_replica(spark):
    import random

    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = random.Random(17)
    rows = []
    for _ in range(400):
        x1 = rng.gauss(0, 1)
        x2 = 1.0 if rng.random() < 0.4 else 0.0
        # exponential survival with rate exp(0.7*x1 - 0.5*x2)
        u = rng.random()
        tt = float(-1.0 * (1.0 / pow(2.718281828, 0.7 * x1 - 0.5 * x2)) * np.log(u))
        cens = rng.uniform(0, 2.0)
        ev = 1 if tt <= cens else 0
        rows.append((round(min(tt, cens), 4) + 0.0001, ev, x1, x2))
    df = spark.createDataFrame(
        rows, "t double, event int, x1 double, x2 double"
    ).repartition(8)
    model = GLM.cox_fit(df, "t", "event", ["x1", "x2"], iters=8)
    ref = _cox_numpy(
        [r[0] for r in rows],
        [r[1] for r in rows],
        [[r[2], r[3]] for r in rows],
        iters=8,
    )
    got = np.array(model["beta"])
    assert np.allclose(got, ref, atol=1e-8), (got, ref)
    # recovered effects carry the planted signs and rough magnitude
    assert 0.3 < got[0] < 1.2 and -1.1 < got[1] < -0.1
    # partitioning independence (the ALS discipline)
    model2 = GLM.cox_fit(df.repartition(3), "t", "event", ["x1", "x2"], iters=8)
    assert np.allclose(np.array(model2["beta"]), got, atol=1e-9)
    # high-cardinality path agrees (distinct times are row-sized here)
    model3 = GLM.cox_fit(
        df, "t", "event", ["x1", "x2"], iters=8, high_cardinality=True
    )
    assert np.allclose(np.array(model3["beta"]), got, atol=1e-9)


def test_cox_identical_arms_beta_zero(spark):
    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    # the same survival pattern in both arms: the arm indicator must
    # carry no effect
    rows = []
    for arm in (0.0, 1.0):
        for i in range(50):
            rows.append((float(i + 1), 1 if i % 3 else 0, arm))
    df = spark.createDataFrame(rows, "t double, event int, arm double")
    model = GLM.cox_fit(df, "t", "event", ["arm"], iters=8)
    assert abs(model["beta"][0]) < 1e-10
    assert model["n_events"] == 66


def test_cox_predict_serving_and_guards(spark):
    import math

    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    from pyspark.sql import functions as SF

    model = {"beta": [0.5, -1.0], "cols": ["x1", "x2"], "iters": 8}
    df = spark.createDataFrame([(2.0, 1.0)], "x1 double, x2 double")
    r = GLM.cox_predict(df, model).collect()[0]
    assert abs(r.hazard_ratio - math.exp(0.5 * 2.0 - 1.0)) < 1e-12
    with pytest.raises(ValueError, match="at least one feature"):
        GLM.cox_fit(df.withColumn("t", SF.lit(1.0)).withColumn("e", SF.lit(1)), "t", "e", [])
    allcens = spark.createDataFrame(
        [(1.0, 0, 0.5), (2.0, 0, 1.5)], "t double, event int, x double"
    )
    with pytest.raises(ValueError, match="no events"):
        GLM.cox_fit(allcens, "t", "event", ["x"], iters=1)


def test_cox_worked_example_conversion_cohort(spark, tables):
    """The km_by_arm cohort, covariate-adjusted (the question
    kaplan_meier/logrank can't answer): time-to-high-value-purchase
    with the user-parity arm AND the user's event volume as
    covariates. The fit must run end-to-end on real table-derived
    durations, agree in direction with the unadjusted log-rank
    comparison, and serve hazard ratios as a pure expression."""
    from pyspark.sql import functions as SF

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
        stats as ST,
    )

    ev = tables["events"]
    hit = (SF.col("event_type") == "purchase") & (SF.col("value") > 90)
    per = ev.groupBy("user_id").agg(
        SF.min("ts").alias("t0"),
        SF.max("ts").alias("t_last"),
        SF.min(SF.when(hit, SF.col("ts"))).alias("t_evt"),
        SF.count(SF.lit(1)).alias("n_events"),
    )
    dur = per.select(
        (
            SF.unix_micros(SF.coalesce("t_evt", "t_last"))
            - SF.unix_micros("t0")
        ).cast("double").alias("t"),
        SF.col("t_evt").isNotNull().cast("int").alias("event"),
        (SF.col("user_id") % 2 == 0).cast("double").alias("arm_a"),
        (SF.col("n_events").cast("double") / 100.0).alias("volume"),
    ).filter(SF.col("t") > 0)
    model = GLM.cox_fit(
        dur, "t", "event", ["arm_a", "volume"], iters=6, high_cardinality=True
    )
    assert model["n_events"] > 0
    beta_arm = model["beta"][0]
    # direction agrees with the unadjusted log-rank O-E sign: if arm a
    # observed more events than expected, its adjusted hazard is higher
    lr = ST.logrank_test(
        dur.withColumn("g", SF.when(SF.col("arm_a") > 0, "a").otherwise("b")),
        "t", "event", "g", "a", "b",
    ).collect()[0]
    if abs(lr.observed_a - lr.expected_a) > 1.0:
        assert (beta_arm > 0) == (lr.observed_a > lr.expected_a)
    scored = GLM.cox_predict(dur, model)
    rows = scored.limit(5).collect()
    import math

    for r in rows:
        want = math.exp(model["beta"][0] * r.arm_a + model["beta"][1] * r.volume)
        assert abs(r.hazard_ratio - want) < 1e-9


def test_cox_baseline_nelson_aalen_and_replica(spark):
    """With all-zero beta the Breslow baseline reduces EXACTLY to
    Nelson-Aalen (sum d_i/n_i over the KM risk sets); with a fitted
    beta it matches the numpy Breslow replica."""
    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
        stats as ST,
    )

    rows = [
        (1.0, 1, 0.2), (2.0, 0, -0.4), (2.0, 1, 1.0), (3.0, 1, 0.0),
        (4.0, 0, 0.5), (5.0, 1, -1.2), (6.0, 1, 0.3), (7.0, 0, 0.9),
    ]
    df = spark.createDataFrame(rows, "t double, event int, x double")
    # zero-beta: Nelson-Aalen from the KM frame
    zero = {"beta": [0.0], "cols": ["x"], "iters": 0}
    base = {r.t: (r.d, r.s0, r.h0) for r in GLM.cox_baseline(df, "t", "event", zero).collect()}
    km = ST.kaplan_meier(df.select("t", "event")).collect()
    h = 0.0
    for r in km:
        if r.d > 0:
            h += r.d / r.n_risk
            d, s0, h0 = base[r.t]
            assert d == r.d and abs(s0 - r.n_risk) < 1e-9
            assert abs(h0 - h) < 1e-12, r.t
    # fitted beta: numpy Breslow replica
    model = GLM.cox_fit(df, "t", "event", ["x"], iters=6)
    got = {r.t: r.h0 for r in GLM.cox_baseline(df, "t", "event", model).collect()}
    b = model["beta"][0]
    w = {i: np.exp(b * r[2]) for i, r in enumerate(rows)}
    times = sorted({r[0] for r in rows if r[1] == 1})
    h = 0.0
    for t in times:
        d = sum(1 for r in rows if r[0] == t and r[1] == 1)
        s0 = sum(w[i] for i, r in enumerate(rows) if r[0] >= t)
        h += d / s0
        assert abs(got[t] - h) < 1e-9, t
    # survival curve is exp(-h0) and monotone non-increasing
    surv = [r.baseline_survival for r in GLM.cox_baseline(df, "t", "event", model).collect()]
    assert all(surv[i] >= surv[i + 1] - 1e-12 for i in range(len(surv) - 1))
    # the high-cardinality path agrees exactly on integer risk sets
    hc = {r.t: r.h0 for r in GLM.cox_baseline(df, "t", "event", model, high_cardinality=True).collect()}
    for t, v in got.items():
        assert abs(hc[t] - v) < 1e-12


def test_poisson_fit_matches_numpy_and_recovers(spark):
    import random

    import numpy as np

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = random.Random(29)
    true_b = [0.8, -0.5, 1.2]  # x1, x2, intercept
    rows = []
    for _ in range(800):
        x1, x2 = rng.gauss(0, 1), rng.gauss(0, 1)
        mu = math.exp(true_b[0] * x1 + true_b[1] * x2 + true_b[2])
        # Knuth Poisson sampler (deterministic via rng)
        L, k, p = math.exp(-mu), 0, 1.0
        while True:
            p *= rng.random()
            if p <= L:
                break
            k += 1
        rows.append((x1, x2, k))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y long").repartition(7)
    m = GLM.poisson_fit(df, ["x1", "x2"], "y", iters=8)

    # numpy replica of the identical schedule (ln-mean warm start)
    X = np.array([[r[0], r[1], 1.0] for r in rows])
    yv = np.array([float(r[2]) for r in rows])
    beta = np.zeros(3)
    beta[2] = math.log(yv.mean())
    for _ in range(8):
        mu = np.exp(X @ beta)
        H = (X.T * mu) @ X
        g = X.T @ (yv - mu)
        beta = beta + np.linalg.solve(H + 1e-9 * np.eye(3), g)
    assert np.allclose(np.array(m["beta"]), beta, atol=1e-8)
    assert np.allclose(np.array(m["beta"]), true_b, atol=0.2)
    # partitioning independence (the ALS tolerance)
    m2 = GLM.poisson_fit(df.repartition(3), ["x1", "x2"], "y", iters=8)
    assert np.allclose(m["beta"], m2["beta"], atol=1e-9)
    # serving path is the exact expression
    scored = GLM.poisson_predict(df, m).limit(10).collect()
    b = m["beta"]
    for r in scored:
        assert abs(r.mu - math.exp(b[0] * r.x1 + b[1] * r.x2 + b[2])) < 1e-9
    # empty input is a clear error
    import pytest

    empty = spark.createDataFrame([], "x1 double, x2 double, y long")
    with pytest.raises(ValueError, match="empty"):
        GLM.poisson_fit(empty, ["x1", "x2"], "y", iters=1)


def _cox_numpy_stratified(strata, t, e, X, iters=8, reg=1e-9):
    """Per-stratum risk sets, shared beta: sum each stratum's
    gradient/Hessian contributions per Newton step."""
    import numpy as np

    strata = np.asarray(strata)
    t = np.asarray(t, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    d = X.shape[1]
    beta = np.zeros(d)
    for _ in range(iters):
        g = np.zeros(d)
        H = np.zeros((d, d))
        for s in np.unique(strata):
            m = strata == s
            ts, es, Xs = t[m], e[m], X[m]
            w = np.exp(Xs @ beta)
            for tt in np.unique(ts[es > 0]):
                ev = (ts == tt) & (es > 0)
                risk = ts >= tt
                dt = ev.sum()
                s0 = w[risk].sum()
                s1 = (w[risk, None] * Xs[risk]).sum(axis=0)
                s2 = (w[risk, None, None] * Xs[risk, :, None] * Xs[risk, None, :]).sum(axis=0)
                g += Xs[ev].sum(axis=0) - dt * s1 / s0
                H += dt * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    return beta


def test_cox_stratified_matches_numpy_and_guards(spark):
    import random

    import numpy as np
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = random.Random(41)
    rows = []
    for site, base in (("a", 1.0), ("b", 4.0)):  # very different baselines
        for _ in range(150):
            x = rng.gauss(0, 1)
            u = rng.random()
            tt = float(-base / pow(2.718281828, 0.6 * x) * np.log(u))
            cens = rng.uniform(0, 3.0 * base)
            rows.append((site, round(min(tt, cens), 4) + 0.0001,
                         1 if tt <= cens else 0, x))
    df = spark.createDataFrame(rows, "site string, t double, event int, x double")
    m = GLM.cox_fit(df, "t", "event", ["x"], iters=8, strata_col="site")
    ref = _cox_numpy_stratified(
        [r[0] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], [[r[3]] for r in rows], iters=8,
    )
    assert np.allclose(np.array(m["beta"]), ref, atol=1e-8), (m["beta"], ref)
    assert 0.3 < m["beta"][0] < 1.0  # recovers the planted 0.6 effect
    # stratified vs pooled differ when baselines differ (the point)
    pooled = GLM.cox_fit(df, "t", "event", ["x"], iters=8)
    assert abs(pooled["beta"][0] - m["beta"][0]) > 1e-6
    with pytest.raises(ValueError, match="mutually"):
        GLM.cox_fit(df, "t", "event", ["x"], strata_col="site", high_cardinality=True)


def _cox_numpy_efron(t, e, X, iters=8, reg=1e-9):
    """Efron-ties Cox Newton replica of glm.cox_fit(ties='efron')'s
    exact schedule: per-time at-risk moments (S) + event-only moments
    (E), inner sum over j = 0..d_t−1 with fraction j/d_t."""
    import numpy as np

    t = np.asarray(t, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    d = X.shape[1]
    beta = np.zeros(d)
    times = np.unique(t)
    idx = np.searchsorted(times, t)

    def pass_at(beta):
        w = np.exp(X @ beta)
        nt = len(times)
        a0 = np.zeros(nt); a1 = np.zeros((nt, d)); a2 = np.zeros((nt, d, d))
        e0 = np.zeros(nt); e1 = np.zeros((nt, d)); e2 = np.zeros((nt, d, d))
        dt = np.zeros(nt); sx = np.zeros((nt, d))
        for i in range(len(t)):
            j = idx[i]
            a0[j] += w[i]; a1[j] += w[i] * X[i]
            a2[j] += w[i] * np.outer(X[i], X[i])
            dt[j] += e[i]; sx[j] += e[i] * X[i]
            if e[i] > 0:
                e0[j] += w[i]; e1[j] += w[i] * X[i]
                e2[j] += w[i] * np.outer(X[i], X[i])
        s0 = np.cumsum(a0[::-1])[::-1]
        s1 = np.cumsum(a1[::-1], axis=0)[::-1]
        s2 = np.cumsum(a2[::-1], axis=0)[::-1]
        g = np.zeros(d); H = np.zeros((d, d)); ll = 0.0
        for j in np.nonzero(dt > 0)[0]:
            m = int(round(dt[j]))
            ll += sx[j] @ beta
            g += sx[j]
            for k in range(m):
                f = k / dt[j]
                phi = s0[j] - f * e0[j]
                mu = (s1[j] - f * e1[j]) / phi
                ll -= np.log(phi)
                g -= mu
                H += (s2[j] - f * e2[j]) / phi - np.outer(mu, mu)
        return g, H, ll

    for _ in range(iters):
        g, H, _ = pass_at(beta)
        beta = beta + np.linalg.solve(H + reg * np.eye(d), g)
    _, _, ll = pass_at(beta)
    return beta, ll


def _tied_cohort(n_per=60, seed=23):
    """Discrete (integer-day) durations — heavy event-time ties."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n_per):
        for arm in (0.0, 1.0):
            x = rng.gauss(0, 1)
            u = rng.random()
            tt = -2.0 / math.exp(0.8 * x - 0.4 * arm) * math.log(u)
            cens = rng.uniform(0, 6.0)
            # round UP to whole days: many subjects share event times
            day = float(int(min(tt, cens)) + 1)
            rows.append((day, 1 if tt <= cens else 0, x, arm))
    return rows


def test_cox_efron_matches_numpy_replica_and_diverges_from_breslow(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rows = _tied_cohort()
    df = spark.createDataFrame(
        rows, "t double, event int, x double, arm double"
    ).repartition(7)
    m_e = GLM.cox_fit(df, "t", "event", ["x", "arm"], iters=8, ties="efron")
    ref, ll_ref = _cox_numpy_efron(
        [r[0] for r in rows],
        [r[1] for r in rows],
        [[r[2], r[3]] for r in rows],
        iters=8,
    )
    got = np.array(m_e["beta"])
    assert np.allclose(got, ref, atol=1e-8), (got, ref)
    assert abs(m_e["loglik"] - ll_ref) < 1e-7
    # Breslow on the same tied cohort lands measurably elsewhere —
    # the documented toward-zero bias under heavy ties
    m_b = GLM.cox_fit(df, "t", "event", ["x", "arm"], iters=8, ties="breslow")
    diff = np.abs(np.array(m_b["beta"]) - got)
    assert diff.max() > 1e-3, (m_b["beta"], got)
    assert abs(m_b["beta"][0]) < abs(got[0])  # shrunk toward zero
    # partitioning independence holds for the HOF path too
    m_e2 = GLM.cox_fit(
        df.repartition(3), "t", "event", ["x", "arm"], iters=8, ties="efron"
    )
    assert np.allclose(np.array(m_e2["beta"]), got, atol=1e-9)
    import pytest

    with pytest.raises(ValueError, match="ties"):
        GLM.cox_fit(df, "t", "event", ["x"], ties="exact")


def test_cox_efron_equals_breslow_without_ties(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = random.Random(5)
    rows = []
    for i in range(200):
        x = rng.gauss(0, 1)
        u = rng.random()
        tt = -1.0 / math.exp(0.5 * x) * math.log(u)
        cens = rng.uniform(0, 2.5)
        # unique continuous times: d_t = 1 everywhere
        rows.append((round(min(tt, cens), 10) + i * 1e-9,
                     1 if tt <= cens else 0, x))
    df = spark.createDataFrame(rows, "t double, event int, x double")
    m_b = GLM.cox_fit(df, "t", "event", ["x"], iters=6, ties="breslow")
    m_e = GLM.cox_fit(df, "t", "event", ["x"], iters=6, ties="efron")
    assert np.allclose(m_b["beta"], m_e["beta"], atol=1e-9)
    assert abs(m_b["loglik"] - m_e["loglik"]) < 1e-8


def test_cox_null_rows_excluded_like_explicit_filter(spark):
    """Round-10 ADVICE: a NULL feature/event/duration row must be
    excluded entirely (not half-counted in dt but missing from the
    risk sets) — the fit over data WITH nulls equals the fit over the
    explicitly pre-filtered frame."""
    from pyspark.sql import functions as SF

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rows = _tied_cohort(n_per=40, seed=9)
    df = spark.createDataFrame(
        rows, "t double, event int, x double, arm double"
    )
    polluted = df.unionByName(
        spark.createDataFrame(
            [
                (1.0, 1, None, 0.0),     # NULL feature, observed event
                (2.0, None, 0.3, 1.0),   # NULL event flag
                (None, 1, 0.7, 0.0),     # NULL duration
                (3.0, 1, 0.1, None),     # NULL in the second feature
            ],
            "t double, event int, x double, arm double",
        )
    )
    clean = polluted.filter(
        SF.col("t").isNotNull()
        & SF.col("event").isNotNull()
        & SF.col("x").isNotNull()
        & SF.col("arm").isNotNull()
    )
    for ties in ("breslow", "efron"):
        m_p = GLM.cox_fit(polluted, "t", "event", ["x", "arm"], iters=5, ties=ties)
        m_c = GLM.cox_fit(clean, "t", "event", ["x", "arm"], iters=5, ties=ties)
        assert np.allclose(m_p["beta"], m_c["beta"], atol=1e-12)
        assert m_p["n_events"] == m_c["n_events"]


def test_loglik_reported_at_returned_beta(spark):
    """Round-10 ADVICE: loglik must be evaluated AT the returned β,
    not the penultimate iterate — fitting with iters=k then asking
    for a 0-iteration 'fit' seeded nowhere can't replicate that, so
    check against direct numpy evaluation at the returned β."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rows = _tied_cohort(n_per=30, seed=3)
    df = spark.createDataFrame(rows, "t double, event int, x double, arm double")
    m = GLM.cox_fit(df, "t", "event", ["x"], iters=4)
    # numpy Breslow partial loglik at the RETURNED beta
    t = np.array([r[0] for r in rows]); e = np.array([float(r[1]) for r in rows])
    X = np.array([[r[2]] for r in rows]); b = np.array(m["beta"])
    w = np.exp(X @ b)
    ll = 0.0
    for tt in np.unique(t):
        ev = (t == tt) & (e > 0)
        if ev.sum() == 0:
            continue
        ll += (X[ev] @ b).sum() - ev.sum() * np.log(w[t >= tt].sum())
    assert abs(m["loglik"] - ll) < 1e-8, (m["loglik"], ll)
    # poisson: loglik at returned beta too
    prows = [(float(i % 7), float(np.random.RandomState(i).poisson(2.0))) for i in range(300)]
    pdf = spark.createDataFrame(prows, "x double, y double")
    pm = GLM.poisson_fit(pdf, ["x"], "y", iters=4)
    Xp = np.array([[r[0], 1.0] for r in prows]); yp = np.array([r[1] for r in prows])
    bp = np.array(pm["beta"])
    z = Xp @ bp
    ll_p = float((yp * z - np.exp(z)).sum())
    assert abs(pm["loglik"] - ll_p) < 1e-6 * max(1.0, abs(ll_p))


def test_ols_fit_matches_numpy_lstsq_and_two_feature_closed_form(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(500):
        x1, x2, x3 = rng.gauss(0, 1), rng.gauss(2, 3), rng.uniform(-1, 1)
        y = 1.2 * x1 - 0.7 * x2 + 3.0 * x3 + 5.0 + rng.gauss(0, 0.5)
        rows.append((x1, x2, x3, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, y double").repartition(9)
    m = GLM.ols_fit(df, ["x1", "x2", "x3"], "y")
    X = np.array([[r[0], r[1], r[2], 1.0] for r in rows])
    yv = np.array([r[3] for r in rows])
    want, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert np.allclose(m["beta"], want, atol=1e-8), (m["beta"], want)
    assert m["n"] == 500 and 0.9 < m["r2"] <= 1.0
    # partitioning independence (the ALS tolerance)
    m2 = GLM.ols_fit(df.repartition(3), ["x1", "x2", "x3"], "y")
    assert np.allclose(m2["beta"], m["beta"], atol=1e-9)
    # exact agreement with the oracle-checked closed form at d=2
    two = GLM.ols_two_features(df, "x1", "x2", "y").collect()[0]
    m22 = GLM.ols_fit(df, ["x1", "x2"], "y")
    assert abs(m22["beta"][0] - two.beta_u) < 1e-8
    assert abs(m22["beta"][1] - two.beta_v) < 1e-8
    assert abs(m22["beta"][2] - two.beta0) < 1e-8
    assert abs(m22["r2"] - two.r2) < 1e-10
    # ridge replica: (G + reg*P)^-1 X'y with unpenalized intercept
    reg = 2.5
    mr = GLM.ols_fit(df, ["x1", "x2", "x3"], "y", reg=reg)
    P = np.eye(4); P[3, 3] = 0.0
    want_r = np.linalg.solve(X.T @ X + reg * P, X.T @ yv)
    assert np.allclose(mr["beta"], want_r, atol=1e-8)
    # serving is a pure expression
    scored = GLM.ols_predict(df, m).collect()
    for r in scored[:20]:
        want_y = m["beta"][0] * r.x1 + m["beta"][1] * r.x2 + m["beta"][2] * r.x3 + m["beta"][3]
        assert abs(r.yhat - want_y) < 1e-10


def test_ols_fit_null_rows_singularity_and_no_intercept(spark):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rows = [(float(i), float(2 * i % 7), 3.0 * i + 1.0) for i in range(60)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    polluted = df.unionByName(
        spark.createDataFrame(
            [(None, 1.0, 5.0), (1.0, None, 5.0), (1.0, 1.0, None)],
            "x1 double, x2 double, y double",
        )
    )
    m = GLM.ols_fit(df, ["x1", "x2"], "y")
    mp = GLM.ols_fit(polluted, ["x1", "x2"], "y")
    assert np.allclose(m["beta"], mp["beta"], atol=1e-12) and mp["n"] == 60
    # collinear features: raises unless ridged
    colin = df.withColumn("x3", 2 * df.x1)
    with pytest.raises(ValueError, match="singular"):
        GLM.ols_fit(colin, ["x1", "x3"], "y")
    mr = GLM.ols_fit(colin, ["x1", "x3"], "y", reg=1.0)
    assert all(np.isfinite(mr["beta"]))
    # no intercept: replica without the ones column
    mni = GLM.ols_fit(df, ["x1", "x2"], "y", intercept=False)
    X = np.array([[r[0], r[1]] for r in rows]); yv = np.array([r[2] for r in rows])
    want, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert np.allclose(mni["beta"], want, atol=1e-8)
    with pytest.raises(ValueError, match="no complete rows"):
        GLM.ols_fit(df.filter("x1 < 0"), ["x1"], "y")


def test_glm_scoring_streams_by_composition(spark, tmp_path):
    """r10 verdict #9: cox_predict / poisson_predict / ols_predict are
    pure expressions, so they apply UNCHANGED to a streaming
    DataFrame — frozen model, live data, zero new scoring code.
    Stream scores must equal batch scores row-for-row."""
    from pyspark.sql import functions as SF

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rows = [(i, float(i % 13) / 3.0, float((i * 7) % 11)) for i in range(300)]
    batch = spark.createDataFrame(rows, "id long, x1 double, x2 double")
    cox = {"beta": [0.4, -0.2], "cols": ["x1", "x2"], "iters": 8}
    pois = {"beta": [0.1, 0.05, 1.0], "cols": ["x1", "x2", "__intercept"], "iters": 8}
    ols = {"beta": [2.0, -1.0, 0.5], "cols": ["x1", "x2", "__intercept"], "n": 300, "r2": 1.0, "reg": 0.0}
    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    batch.write.mode("append").parquet(src)
    stream = spark.readStream.schema("id long, x1 double, x2 double").parquet(src)
    scored = GLM.ols_predict(
        GLM.poisson_predict(GLM.cox_predict(stream, cox), pois), ols
    )
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    want = {
        r.id: (r.hazard_ratio, r.mu, r.yhat)
        for r in GLM.ols_predict(
            GLM.poisson_predict(GLM.cox_predict(batch, cox), pois), ols
        ).collect()
    }
    got = {r.id: (r.hazard_ratio, r.mu, r.yhat) for r in spark.read.parquet(out).collect()}
    assert got.keys() == want.keys()
    for i in got:
        for a, b in zip(got[i], want[i]):
            assert abs(a - b) < 1e-12


def test_negbin_fit_matches_numpy_and_reduces_to_poisson(spark):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = np.random.RandomState(29)
    rows = []
    true_b = np.array([0.5, -0.3, 1.2])  # x1, x2, intercept
    alpha = 0.6
    for _ in range(800):
        x1, x2 = rng.normal(0, 1), rng.normal(0, 1)
        mu = np.exp(true_b[0] * x1 + true_b[1] * x2 + true_b[2])
        # NB2 via gamma-poisson mixture
        lam = rng.gamma(shape=1 / alpha, scale=alpha * mu)
        yv = rng.poisson(lam)
        rows.append((float(x1), float(x2), float(yv)))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double").repartition(7)
    m = GLM.negbin_fit(df, ["x1", "x2"], "y", alpha=alpha, iters=8)

    # numpy Fisher-scoring replica of the exact schedule
    X = np.array([[r[0], r[1], 1.0] for r in rows])
    yv = np.array([r[2] for r in rows])
    beta = np.zeros(3); beta[2] = np.log(yv.mean())
    for _ in range(8):
        mu = np.exp(X @ beta)
        w = mu / (1 + alpha * mu)
        g = X.T @ ((yv - mu) / (1 + alpha * mu))
        H = (X.T * w) @ X
        beta = beta + np.linalg.solve(H + 1e-9 * np.eye(3), g)
    assert np.allclose(m["beta"], beta, atol=1e-8), (m["beta"], beta)
    # recovers the planted effects roughly
    assert 0.3 < m["beta"][0] < 0.7 and -0.5 < m["beta"][1] < -0.1
    # loglik at returned beta (beta-dependent part)
    mu = np.exp(X @ np.array(m["beta"]))
    ll = float((yv * (X @ np.array(m["beta"])) - (yv + 1 / alpha) * np.log(1 + alpha * mu)).sum())
    assert abs(m["loglik"] - ll) < 1e-6 * max(1.0, abs(ll))
    # alpha=0 recovers poisson_fit exactly
    m0 = GLM.negbin_fit(df, ["x1", "x2"], "y", alpha=0.0, iters=6)
    mp = GLM.poisson_fit(df, ["x1", "x2"], "y", iters=6)
    assert np.allclose(m0["beta"], mp["beta"], atol=1e-10)
    assert abs(m0["loglik"] - mp["loglik"]) < 1e-8
    # partitioning independence
    m2 = GLM.negbin_fit(df.repartition(3), ["x1", "x2"], "y", alpha=alpha, iters=8)
    assert np.allclose(m2["beta"], m["beta"], atol=1e-9)
    with pytest.raises(ValueError, match="alpha"):
        GLM.negbin_fit(df, ["x1"], "y", alpha=-1.0)
    # overdispersion shrinks the information: NB chi-like weights < poisson
    # (sanity: betas differ from poisson on overdispersed data)
    assert not np.allclose(m["beta"], mp["beta"], atol=1e-3)


def test_count_glm_null_label_rows_filtered(spark):
    """NULL-label rows must be filtered UP FRONT in poisson/negbin: the
    information term involves no y, so a NULL-label row would inflate H
    while dropping out of g, shrinking every Newton step (r11 ADVICE).
    Fit on clean data must equal fit on data + NULL-label noise rows."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        glm as GLM,
    )

    rng = np.random.RandomState(31)
    rows = []
    for _ in range(300):
        x1 = float(rng.normal(0, 1))
        mu = np.exp(0.4 * x1 + 0.8)
        rows.append((x1, float(rng.poisson(mu))))
    clean = spark.createDataFrame(rows, "x1 double, y double")
    # the same rows PLUS junk: NULL labels (huge x to magnify any H
    # contamination) and a NULL feature row
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(50.0, None), (-40.0, None), (None, 3.0)],
            "x1 double, y double",
        )
    )
    for fit in (
        lambda d: GLM.poisson_fit(d, ["x1"], "y", iters=6),
        lambda d: GLM.negbin_fit(d, ["x1"], "y", alpha=0.5, iters=6),
    ):
        a, b = fit(clean), fit(noisy)
        assert np.allclose(a["beta"], b["beta"], atol=1e-12), (a["beta"], b["beta"])
        assert abs(a["loglik"] - b["loglik"]) < 1e-9
