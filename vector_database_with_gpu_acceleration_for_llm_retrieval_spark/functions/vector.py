"""Vector math as Catalyst Column expressions (no Python UDFs).

The reference computes these in three hand-written backends — numpy
(shard/fallback_numpy_index.py:11-28), scalar C++
(shard/include/flat_index.hpp:21-71) and CUDA kernels
(shard/src/cuda/flat_kernels.cu:4-45). Here each is a *single reusable
Column builder* over Spark's higher-order functions (``transform`` /
``aggregate`` / ``zip_with``), so:

* the whole expression stays JVM-side inside whole-stage codegen — no
  Python round-trip in the hot scoring path;
* Catalyst can prune/push down around it;
* a DuckDB oracle can mirror it exactly (same double-precision
  sequential fold).

Semantics are the *fixed* version of the reference (SURVEY.md §2.1
defects): rows are L2-normalized at ingest (reference
fallback_numpy_index.py:11-13); ``cosine`` normalizes both sides;
``l2`` is explicit negative squared distance — consistent across all
call sites instead of differing per backend.

All arithmetic is in float64 regardless of the stored element type
(testdata stores float32): products/accumulations cast to double first,
which both matches DuckDB oracle math and avoids float32 accumulation
error at dim ≫ 64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_sim",
    "l2sq",
    "neg_l2sq",
    "score",
    "vec_lit",
]

#: guard against division by zero for zero vectors — same epsilon the
#: reference uses (fallback_numpy_index.py:12 `norms[norms==0]=1e-12`).
_EPS = 1e-12


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def vec_lit(vec) -> Column:
    """A literal dense vector as an ``array<double>`` Column."""
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold double-precision dot product.

    Mirrors the reference inner loop (flat_index.hpp:48-50, one
    multiply-add per dimension) but as a codegen'd expression.
    """
    a, b = _as_col(a), _as_col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm ``sqrt(Σ x²)`` (reference flat_index.hpp:21-23)."""
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def l2_normalize(a: Column | str) -> Column:
    """Scale to unit norm; zero vectors stay zero (ε substituted for
    the zero norm only, never clamping a tiny-but-nonzero norm).

    This is the reference's exact rule (`norms[norms==0]=1e-12`,
    fallback_numpy_index.py:11-13): a vector with norm 1e-38 still
    normalizes to a unit vector. A ``greatest(norm, ε)`` clamp instead
    silently under-scales sub-ε vectors and breaks idempotence —
    caught by the hypothesis property test with v=[0,0,0,1.18e-38].
    """
    a = _as_col(a)
    n = l2_norm(a)
    denom = F.when(n == 0.0, F.lit(_EPS)).otherwise(n)
    return F.transform(a, lambda x: x.cast("double") / denom)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity — dot over the product of per-side guarded
    norms (ε substituted only for an exactly-zero norm, same rule as
    :func:`l2_normalize`).

    On pre-normalized corpora this reduces to ``dot`` (what the
    reference exploits: normalize-on-insert makes cosine a plain matmul,
    fallback_numpy_index.py:22-24); this form is correct for raw inputs
    too. Guarding per side (not the product) keeps it consistent with
    normalize-then-dot — a sub-ε-norm vector still gets its true
    cosine; only genuine zero vectors score ~0.
    """
    a, b = _as_col(a), _as_col(b)
    na, nb = l2_norm(a), l2_norm(b)
    denom = (
        F.when(na == 0.0, F.lit(_EPS)).otherwise(na)
        * F.when(nb == 0.0, F.lit(_EPS)).otherwise(nb)
    )
    return dot(a, b) / denom


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance Σ (x−y)²."""
    a, b = _as_col(a), _as_col(b)
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def neg_l2sq(a: Column | str, b: Column | str) -> Column:
    """Negative squared L2 — the reference's "l2" *score* orientation:
    higher is better (fallback_numpy_index.py:27-28, flat_kernels.cu:44,
    coordinator/main.py:75 comment)."""
    return -l2sq(a, b)


def score(a: Column | str, b: Column | str, metric: str = "cosine") -> Column:
    """Metric dispatch (reference coordinator/main.py:31 +
    fallback_numpy_index.py:22-28): ``cosine`` → cosine similarity,
    anything else → negative squared L2, score always
    higher-is-better."""
    if metric == "cosine":
        return cosine_sim(a, b)
    return neg_l2sq(a, b)
