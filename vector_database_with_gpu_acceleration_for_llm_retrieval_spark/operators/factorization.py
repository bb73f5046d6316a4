"""Distributed implicit-feedback matrix factorization (ALS).

Hu/Koren/Volinsky 2008 ("Collaborative Filtering for Implicit Feedback
Datasets"): factor the user x item interaction-strength matrix into
rank-f embeddings minimizing

    sum_ui  c_ui * (p_ui - x_u . y_i)^2  +  reg * (sum|x|^2 + sum|y|^2)

with confidence ``c = 1 + alpha*r`` and preference ``p = 1`` on
observed pairs (0 elsewhere).  The alternating solve is exact per side:
with Y fixed, each user's factor is the ridge solution

    x_u = (Y'Y + Y'(C_u - I)Y + reg*I)^-1  Y' C_u p(u)

where the Y'Y Gram is GLOBAL (f x f — tiny) and only the user's OWN
interactions contribute the (C_u - I) correction — the observation that
makes implicit ALS tractable at scale, since the sum over "all items"
collapses into one shared Gram.

Spark shape per half-iteration:

* the f x f Gram of the fixed side: one ``mapInPandas`` partial
  outer-product per partition, summed on the driver (f^2 doubles — a
  metadata-sized collect), broadcast back inside the solver closure;
* one equi-join of the interaction table against the fixed-side factor
  frame on the item (resp. user) key;
* one ``applyInPandas`` grouped by the side being solved: each group
  sorts its rows by the fixed-side id (deterministic float
  accumulation), builds the f x f normal equations with two numpy
  matmuls, and solves.  Per-group state is that entity's interaction
  count x f — bound heavy entities upstream (interaction caps, the
  co-purchase discipline) exactly as every production ALS does.

Determinism: factor init is a pure integer hash of (id, component)
mapped to [-0.5, 0.5) (no RNG state), iteration count is fixed, and
group rows are sorted before accumulation — the whole factorization is
a deterministic function of the input, reproducible across partition
layouts (partitioning-independence is pytest-asserted to 1e-9; the
only float-order freedom left is the partial-Gram summation).  There
is no SQL mirror — linear solves are beyond SQL — so oracle-style
verification is a numpy replica of the same schedule checked to 1e-8
(tests/test_factorization.py), the OPQ discipline.

The reference engine stores and searches embeddings but cannot LEARN
them; this module closes that loop — factors feed straight into the
ANN/kNN family as an ``(id, embedding)`` frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["als_implicit", "als_fold_in", "init_factors", "predict_scores"]

_HASH_MULT = 2654435761  # Knuth multiplicative hash
_HASH_MOD = 2147483647


def _hash01(keys: np.ndarray) -> np.ndarray:
    """Pure-integer hash of int64 keys to [0, 1): the shared init both
    the distributed path and the numpy replica compute bit-identically."""
    h = (keys.astype(np.int64) * _HASH_MULT) % _HASH_MOD
    return (h.astype(np.float64)) / float(_HASH_MOD)


def init_factors(ids: np.ndarray, rank: int) -> np.ndarray:
    """Deterministic (n, rank) init in [-0.5, 0.5)/rank from the id
    hash — no RNG state, so any worker (or the test replica) derives
    the same matrix from the same ids."""
    cols = [
        _hash01(ids.astype(np.int64) * np.int64(rank) + np.int64(j)) - 0.5
        for j in range(rank)
    ]
    return np.stack(cols, axis=1) / float(rank)


def _gram(factors: DataFrame, vec_col: str, rank: int) -> np.ndarray:
    """f x f Gram of a factor frame: per-partition partial outer
    products (mapInPandas), f^2-double rows to the driver, summed
    there. One scan, constant-size shuffle."""
    schema = "g array<double>"

    def part(batches):
        acc = np.zeros((rank, rank), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf):
                Y = np.stack(pdf[vec_col].to_numpy())
                acc += Y.T @ Y
                seen = True
        if seen:
            yield pd.DataFrame({"g": [acc.reshape(-1).tolist()]})

    parts = factors.select(vec_col).mapInPandas(part, schema).collect()
    out = np.zeros((rank, rank), dtype=np.float64)
    for r in parts:
        out += np.array(r.g, dtype=np.float64).reshape(rank, rank)
    return out


def _solve_side(
    inter: DataFrame,
    fixed: DataFrame,
    solve_col: str,
    fixed_col: str,
    strength_col: str,
    rank: int,
    alpha: float,
    reg: float,
) -> DataFrame:
    """One half-iteration: re-solve ``solve_col``'s factors against the
    ``fixed`` frame ``(fixed_col, vec)``."""
    G = _gram(fixed, "vec", rank)
    joined = inter.select(solve_col, fixed_col, strength_col).join(
        fixed, fixed_col
    )
    schema = f"{solve_col} long, vec array<double>"
    A_base = G + reg * np.eye(rank)

    def solve(key, pdf):
        pdf = pdf.sort_values(fixed_col, kind="mergesort")
        Y = np.stack(pdf["vec"].to_numpy())
        c = 1.0 + alpha * pdf[strength_col].to_numpy(dtype=np.float64)
        A = A_base + (Y.T * (c - 1.0)) @ Y
        b = Y.T @ c
        x = np.linalg.solve(A, b)
        return pd.DataFrame({solve_col: [key[0]], "vec": [x.tolist()]})

    return joined.groupBy(solve_col).applyInPandas(solve, schema)


def als_implicit(
    interactions: DataFrame,
    rank: int = 8,
    iters: int = 3,
    alpha: float = 10.0,
    reg: float = 0.1,
    user_col: str = "user_id",
    item_col: str = "item_id",
    strength_col: str = "strength",
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` alternating rounds (items solved first each round,
    users second — so after round 1 user factors already reflect
    learned item structure) and return ``(user_factors, item_factors)``
    as ``(id, vec array<double>)`` frames.

    Inputs are deduplicated per (user, item) by summing strength
    (repeat interactions add confidence, the implicit-ALS convention).
    Each round's factor frames are localCheckpoint-pinned: the solve
    is a Python stage whose lineage would otherwise re-run every prior
    round on each downstream action (the iterative-operator rule).
    """
    inter = (
        interactions.groupBy(
            F.col(user_col).cast("long").alias("u"),
            F.col(item_col).cast("long").alias("i"),
        )
        .agg(F.sum(F.col(strength_col).cast("double")).alias("r"))
        .localCheckpoint(eager=True)
    )

    def init_frame(col):
        ids = inter.select(F.col(col).alias("id")).distinct()
        schema = "id long, vec array<double>"

        def make(batches):
            for pdf in batches:
                if len(pdf):
                    V = init_factors(pdf["id"].to_numpy(), rank)
                    yield pd.DataFrame(
                        {"id": pdf["id"], "vec": [v.tolist() for v in V]}
                    )

        return ids.mapInPandas(make, schema)

    users = init_frame("u").localCheckpoint(eager=True)
    items = init_frame("i").localCheckpoint(eager=True)
    for _ in range(iters):
        items = _solve_side(
            inter,
            users.select(F.col("id").alias("u"), "vec"),
            "i",
            "u",
            "r",
            rank,
            alpha,
            reg,
        ).withColumnRenamed("i", "id").localCheckpoint(eager=True)
        users = _solve_side(
            inter,
            items.select(F.col("id").alias("i"), "vec"),
            "u",
            "i",
            "r",
            rank,
            alpha,
            reg,
        ).withColumnRenamed("u", "id").localCheckpoint(eager=True)
    return users, items


def predict_scores(
    user_factors: DataFrame,
    item_factors: DataFrame,
    pairs: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
) -> DataFrame:
    """Preference scores x_u . y_i for requested (user, item) pairs:
    two equi-joins + one zip_with dot — entirely JVM-side."""
    j = (
        pairs.select(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .join(user_factors.select(F.col("id").alias("u"), F.col("vec").alias("xu")), "u")
        .join(item_factors.select(F.col("id").alias("i"), F.col("vec").alias("yi")), "i")
    )
    dot = F.aggregate(
        F.zip_with("xu", "yi", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return j.select("u", "i", dot.alias("score"))


def als_fold_in(
    interactions: DataFrame,
    item_factors: DataFrame,
    rank: int = 8,
    alpha: float = 10.0,
    reg: float = 0.1,
    user_col: str = "user_id",
    item_col: str = "item_id",
    strength_col: str = "strength",
) -> DataFrame:
    """Fold NEW users into a trained model without retraining: one
    ridge solve per user against the FROZEN item factors — exactly the
    user half-iteration of :func:`als_implicit`, so a fold-in of the
    same interactions the model trained on reproduces the trained user
    factors bit-for-bit (pytest-asserted).

    This is the serving-time path: item factors update on the training
    cadence (hours/days), while a just-arrived user gets an embedding
    from their first session's interactions in one equi-join + one
    grouped solve — the frozen-model/live-data split the streaming
    index maintenance family uses, applied to factorization.  Returns
    ``(id, vec)`` for the users present in ``interactions``.
    """
    inter = interactions.groupBy(
        F.col(user_col).cast("long").alias("u"),
        F.col(item_col).cast("long").alias("i"),
    ).agg(F.sum(F.col(strength_col).cast("double")).alias("r"))
    return _solve_side(
        inter,
        item_factors.select(F.col("id").alias("i"), "vec"),
        "u",
        "i",
        "r",
        rank,
        alpha,
        reg,
    ).withColumnRenamed("u", "id")
