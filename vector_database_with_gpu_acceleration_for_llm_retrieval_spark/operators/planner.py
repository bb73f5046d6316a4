"""Cost-based filtered-search planning: pick the filtered-top-k
strategy from predicate selectivity.

The reference drops ``meta`` at ingest (coordinator/main.py:43-45
accepts it, shard storage discards it) and offers no filtered search
at all (SURVEY §2.2); this engine has three filtered strategies with
different cost/recall envelopes, and production vector stores
(Qdrant/Weaviate/Vespa all document this exact decision) pick between
them PER QUERY from the predicate's selectivity:

* **pre-filter exact** — scan only the allowed rows and score them
  all. Cost ``O(s·N)`` scorings, recall 1.0. The right plan when the
  predicate is SELECTIVE: few allowed rows, and a graph traversal
  would waste its budget navigating disallowed territory (at s→0 the
  allowed set is mostly unreachable through a beam of any budget).
* **graph filtered traversal** — :func:`.graph_ann.graph_beam_search`
  ``allowed=`` (the ACORN form): the beam routes through the FULL
  graph, answers accumulate from allowed scored candidates. Per-query
  cost independent of N — the mid-selectivity plan, where the allowed
  set is too big to scan but selective enough that post-filtering
  would starve.
* **post-filter** — plain beam search, answers filtered afterwards.
  Cheapest (no per-round allowed-accumulator maintenance) and barely
  lossy when the predicate keeps most rows: the final beam holds
  ``beam ≥ k`` candidates of which ``~s·beam`` survive, so for s→1
  the top-k is intact.

``filtered_topk_auto`` measures selectivity with one tiny aggregate
(or takes it precomputed — at 100 TB the allowed count comes from
column statistics / a partition-pruned count, not a scan) and
dispatches. The thresholds are explicit knobs with measured-sane
defaults, not magic: ``low`` defaults to the point where scanning
``s·N`` vectors costs about one beam traversal (budget/N), ``high``
to 0.5 where post-filter's expected survivor count ``s·beam``
comfortably covers k.

Scale: the decision itself is O(1) driver work; every branch is an
existing scale-audited operator. The selectivity count is the only
added job — pass ``selectivity=`` to skip it when the catalog already
knows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import search as S
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph_ann import (
    graph_beam_search,
)

__all__ = ["estimate_selectivity", "filtered_topk_auto"]


def estimate_selectivity(
    corpus: DataFrame, allowed: DataFrame, id_col: str = "vec_id"
) -> float:
    """``|allowed ∩ corpus| / |corpus|`` via one semi-join count and
    one count — the measured fallback when no catalog statistic is at
    hand. Both jobs are column-pruned to ``id_col``."""
    n = corpus.select(id_col).count()
    if n == 0:
        return 0.0
    n_allowed = corpus.select(id_col).join(
        allowed.select(id_col).distinct(), id_col, "left_semi"
    ).count()
    return n_allowed / n


def filtered_topk_auto(
    corpus: DataFrame,
    qvec,
    allowed: DataFrame,
    k: int = 10,
    graph: DataFrame | None = None,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    low: float | None = None,
    high: float = 0.5,
    beam: int = 32,
    rounds: int = 4,
    n_entry: int = 8,
    layers: DataFrame | None = None,
    hops: int = 2,
    width: int = 1,
    hnsw_scale: int | None = None,
    hnsw_max_layer: int = 2,
    selectivity: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Single-query filtered top-k with cost-based strategy choice.
    Returns ``(id, score)`` score desc / id asc; ``stats`` (optional
    dict) records ``strategy`` ∈ {pre_filter_exact, graph_filtered,
    post_filter} and the ``selectivity`` used.

    Without a ``graph`` there is no decision: the exact pre-filtered
    scan dominates every alternative (scoring ``s·N ≤ N`` rows on the
    one unavoidable pass), so it is always chosen.

    ``low`` defaults to ``(n_entry + rounds·beam·avg_deg) / N`` — the
    selectivity at which scanning the allowed rows costs roughly one
    beam traversal's scorings — computed with avg_deg≈8 when a graph
    is present; pass it explicitly to pin planning behavior.
    """
    alw = allowed.select(F.col(id_col)).distinct()
    measured_n = None
    if selectivity is None:
        measured_n = corpus.select(id_col).count()
        if measured_n == 0:
            selectivity = 0.0
        else:
            selectivity = (
                corpus.select(id_col)
                .join(alw, id_col, "left_semi")
                .count()
                / measured_n
            )
    if graph is None:
        strategy = "pre_filter_exact"
    else:
        if low is None:
            if measured_n is not None:
                budget = n_entry + rounds * beam * 8
                low = min(0.25, budget / max(measured_n, 1))
            else:
                # selectivity came from the catalog — do NOT pay a
                # corpus count just to derive a threshold; callers
                # with stats should pass `low` too, else this static
                # conservative default applies
                low = 0.01
        if selectivity <= low:
            strategy = "pre_filter_exact"
        elif selectivity < high:
            strategy = "graph_filtered"
        else:
            strategy = "post_filter"
    if stats is not None:
        stats["strategy"] = strategy
        stats["selectivity"] = float(selectivity)

    if strategy == "pre_filter_exact":
        sub = corpus.join(F.broadcast(alw), id_col, "left_semi")
        return S.topk(sub, qvec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)

    q = corpus.sparkSession.createDataFrame([(0, list(qvec))], f"qid long, qvec {_vec_type(corpus, vec_col)}")
    if layers is not None:
        # hierarchy-aware traversal: the same strategy decision, but
        # both graph branches descend the upper layers to a per-query
        # entry first (operators/hnsw.py). The scale MUST match the
        # layers' build rule — a silent default would derive entries
        # under a DIFFERENT layer assignment (typically lvl-0 nodes
        # with no layer edges: every hop a no-op, recall silently
        # degraded), so it is required, never guessed.
        if hnsw_scale is None:
            raise ValueError(
                "layers= requires hnsw_scale= (the scale the layers were built with)"
            )
        from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.hnsw import (
            hnsw_search,
        )

        def _beam(allowed_arg):
            return hnsw_search(
                q, corpus, graph, layers, k=k, beam=beam, rounds=rounds,
                hops=hops, max_layer=hnsw_max_layer, width=width,
                scale=hnsw_scale,
                metric=metric, id_col=id_col, vec_col=vec_col,
                allowed=allowed_arg,
            )
    else:
        def _beam(allowed_arg):
            return graph_beam_search(
                q, corpus, graph, k=k, beam=beam, rounds=rounds,
                n_entry=n_entry, metric=metric, id_col=id_col,
                vec_col=vec_col, allowed=allowed_arg,
            )
    if strategy == "graph_filtered":
        res = _beam(alw)
    else:
        res = _beam(None).join(
            F.broadcast(alw), F.col("neighbor_id") == F.col(id_col), "left_semi"
        )
    out = res.select(F.col("neighbor_id").alias(id_col), "score")
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def _vec_type(corpus: DataFrame, vec_col: str) -> str:
    """DDL type of the vector column, so the one-row query frame
    matches the corpus element type (float vs double matters to the
    scoring fold)."""
    return corpus.schema[vec_col].dataType.simpleString()
