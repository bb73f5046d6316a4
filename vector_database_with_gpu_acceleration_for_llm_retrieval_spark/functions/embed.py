"""Deterministic text embeddings (O16 stand-in).

The reference embeds with SentenceTransformer ``all-MiniLM-L6-v2``
(rag_demo/ingest.py:27,33; ask.py:15-16) — a heavy, non-deterministic
model dependency this container doesn't ship. The engine-level concern
is the *dataflow*: text column → fixed-dim unit vector column, same
function applied to corpus and query. This module provides that as a
feature-hashing bag-of-words embedding (the classic hashing trick:
token → (bucket, sign) from a hash, sum, L2-normalize):

* fully deterministic and engine-independent (md5-derived token hash →
  the DuckDB oracle reproduces the vectors bit-for-bit);
* a pure Column expression — JVM-side, codegen'd, no Python workers;
* drop-in replaceable by a real model UDF (`pandas_udf` batch
  inference) without touching any downstream operator — every consumer
  sees only an ``array<double>`` column.

``hash_embed_py`` is the same function on a Python string, used to
embed the *question* driver-side (reference ask.py:15-16 embeds the
question in the client process too).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX

__all__ = [
    "hash_embedding",
    "hash_embedding_udf",
    "hash_embed_py",
    "model_inference_udf",
    "model_embedding_udf",
    "TinyProjectionModel",
    "NumpyLogisticHead",
    "train_lang_head",
]


def hash_embedding(text: Column | str, dim: int = 64) -> Column:
    """Feature-hashed unit-norm embedding of whitespace tokens.

    bucket = hash(token) mod dim, sign = ±1 from the next hash bit;
    vector = L2-normalized sum of signed one-hots. Same accumulator
    shape as dedup.simhash: aggregate over the token array with an
    array accumulator — tokens never leave the row, no explode.
    """
    toks = TX.tokens(text)
    zero = F.array(*[F.lit(0.0)] * dim)
    # materialize the md5-derived hash ONCE per token: the per-dimension
    # branches below run `dim` times per token, and expression lambdas
    # don't CSE — inlining the hash there would compute md5 ~2·dim times
    # per token (measured: 100× slower at sf0.01)
    hashes = F.transform(toks, TX.portable_token_hash)

    def contrib(h: Column) -> Column:
        bucket = F.pmod(h, F.lit(dim))
        # sign bit = floor(h/dim) mod 2, expressed with pure modular
        # arithmetic (h mod 2dim ≥ dim) — no float division of a 60-bit
        # int, and a 1:1 SQL mirror (CASE WHEN h % 2d >= d ...)
        sign = F.when(F.pmod(h, F.lit(2 * dim)) >= dim, F.lit(1.0)).otherwise(F.lit(-1.0))
        return F.array(
            *[F.when(bucket == j, sign).otherwise(F.lit(0.0)) for j in range(dim)]
        )

    acc = F.aggregate(hashes, zero, lambda a, h: F.zip_with(a, contrib(h), lambda x, y: x + y))
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.vector import (
        l2_normalize,
    )

    return l2_normalize(acc)


def hash_embedding_udf(dim: int = 64):
    """Arrow-batched pandas UDF computing the SAME embedding as
    :func:`hash_embedding` — the hot-path form.

    The pure-expression form costs O(dim) JVM branch evaluations per
    token (measured ~15 s over 500 docs at dim 64); here each Arrow
    batch is one Python pass with hashlib md5 + a dim-length
    accumulator. Bit-identical output: every intermediate sum is a
    small integer (±1 contributions, integer squared norms < 2^53), so
    accumulation order cannot change any value, and the final divide /
    sqrt are single correctly-rounded IEEE ops in both runtimes. This
    is also the seam where a real model UDF (SentenceTransformer per
    executor, reference rag_demo/ingest.py:27) slots in unchanged.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _embed(texts):
        return texts.map(lambda t: hash_embed_py(t if t else "", dim))

    # this module uses `from __future__ import annotations`, which turns
    # inline hints into strings pandas_udf can't resolve — set real ones
    _embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("array<double>")(_embed)


#: per-Python-worker model cache. Spark reuses worker processes across
#: tasks (spark.python.worker.reuse, default true), so a model loaded
#: here survives for the executor's lifetime — the load-once-per-
#: executor pattern of the reference's module-level SentenceTransformer
#: (rag_demo/ingest.py:27, loaded at import, reused per request).
_MODEL_CACHE: dict[str, object] = {}


def model_inference_udf(
    loader, cache_key: str, return_type: str = "array<double>", method: str = "encode"
):
    """The real-model seam (O16 embed / O19 generate): an Arrow-batched
    iterator ``pandas_udf`` that loads a model object at most once per
    Python worker process and runs batch inference per Arrow batch.

    ``loader`` is a zero-arg callable returning the model (e.g.
    ``lambda: SentenceTransformer("all-MiniLM-L6-v2")`` to match the
    reference, rag_demo/ingest.py:27) — it is pickled to executors and
    invoked THERE, never on the driver, so heavy weights ship as a
    download/load recipe rather than serialized bytes. ``method`` names
    the batch call on the model: ``encode`` (texts → vectors) or
    ``generate`` (prompts → strings). The iterator form matters: the
    model is resolved once before the batch loop (once per task), and
    the process-level cache makes later tasks in a reused worker free.

    Proven load-once in tests/test_model_seam.py via an accumulator-
    counting loader.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _infer(batches):
        model = _MODEL_CACHE.get(cache_key)
        if model is None:
            model = loader()
            _MODEL_CACHE[cache_key] = model
        fn = getattr(model, method)
        for series in batches:
            out = fn([x if x is not None else "" for x in series])
            yield pd.Series(list(out))

    _infer.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    return pandas_udf(return_type)(_infer)


def model_embedding_udf(loader, cache_key: str):
    """Text → ``array<double>`` via a per-executor-loaded model — the
    drop-in replacement for :func:`hash_embedding_udf` when a real
    embedding model is available (same column contract downstream)."""
    return model_inference_udf(loader, cache_key, "array<double>", "encode")


class TinyProjectionModel:
    """Deterministic stand-in with the SentenceTransformer *call shape*
    (``.encode(list[str]) -> [n, dim_out] unit vectors``, reference
    rag_demo/ingest.py:27,33): feature-hashed bag-of-words through a
    seeded random projection. Exists so the model seam can be exercised
    end-to-end in this container (no torch); swapping in the real model
    changes only the loader."""

    def __init__(self, dim_in: int = 64, dim_out: int = 16, seed: int = 7):
        import numpy as np

        rng = np.random.default_rng(seed)
        self._W = rng.standard_normal((dim_in, dim_out))
        self.dim_in, self.dim_out = dim_in, dim_out

    def encode(self, texts: list[str]) -> list[list[float]]:
        import numpy as np

        X = np.asarray([hash_embed_py(t, self.dim_in) for t in texts])
        Y = X @ self._W
        n = np.linalg.norm(Y, axis=1, keepdims=True)
        Y = Y / np.where(n == 0.0, 1e-12, n)
        return [[float(v) for v in row] for row in Y]


def train_lang_head(
    samples: list[tuple[str, str]],
    path: str,
    dim: int = 64,
    lr: float = 0.5,
    iters: int = 300,
) -> list[str]:
    """Train a REAL (weights-fitted, artifact-serialized) softmax
    classification head over the hash embedding and save it as an
    ``.npz`` artifact — the in-container stand-in for downloading a
    published checkpoint (no torch/transformers ship here).

    ``samples`` = [(text, label)]. Deterministic: zero-init weights,
    fixed-iteration full-batch gradient descent in float64 (no RNG, no
    data-order dependence beyond the caller's, which should sort).
    Returns the sorted class list. The artifact holds only
    ``W [dim, C]``, ``b [C]``, ``classes`` — exactly what
    :class:`NumpyLogisticHead` loads executor-side.
    """
    import numpy as np

    classes = sorted({lab for _, lab in samples})
    idx = {c: i for i, c in enumerate(classes)}
    X = np.asarray([hash_embed_py(t, dim) for t, _ in samples])
    y = np.asarray([idx[lab] for _, lab in samples])
    Y = np.eye(len(classes))[y]
    W = np.zeros((dim, len(classes)))
    b = np.zeros(len(classes))
    n = len(samples)
    for _ in range(iters):
        logits = X @ W + b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - Y) / n
        W -= lr * (X.T @ g)
        b -= lr * g.sum(axis=0)
    np.savez(path, W=W, b=b, classes=np.array(classes))
    return classes


class NumpyLogisticHead:
    """A real trained model behind the inference seam: loads softmax
    weights from an ``.npz`` artifact (the load-a-checkpoint flow of the
    reference's module-level SentenceTransformer, rag_demo/ingest.py:27
    — weights travel as an artifact path, never as pickled bytes) and
    batch-classifies text. ``predict`` is the seam method: one numpy
    matmul per Arrow batch."""

    def __init__(self, path: str, dim: int = 64):
        import numpy as np

        d = np.load(path)
        self.W, self.b = d["W"], d["b"]
        self.classes = [str(c) for c in d["classes"]]
        self.dim = dim

    def predict(self, texts: list[str]) -> list[str]:
        import numpy as np

        X = np.asarray([hash_embed_py(t or "", self.dim) for t in texts])
        logits = X @ self.W + self.b
        return [self.classes[i] for i in np.argmax(logits, axis=1)]


def hash_embed_py(text: str, dim: int = 64) -> list[float]:
    """Driver-side mirror of :func:`hash_embedding` (bit-identical
    semantics: same md5-derived 60-bit hash, same bucket/sign, same
    ε-guarded normalization)."""
    vec = [0.0] * dim
    for t in text.split():
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        bucket = h % dim
        sign = 1.0 if h % (2 * dim) >= dim else -1.0
        vec[bucket] += sign
    # zero-norm rule matches functions.vector.l2_normalize (ε only when
    # the norm is exactly zero; accumulator norms are 0 or ≥ 1 anyway)
    norm = math.sqrt(sum(x * x for x in vec)) or 1e-12
    return [x / norm for x in vec]
