"""Per-query observability (O22 analogue).

The reference exposes Prometheus counters for query count, latency and
result sizes from its coordinator (coordinator/main.py:16-21). The
Spark-native equivalent has two halves:

* **in-plan metrics** — ``df.observe`` + :class:`pyspark.sql.Observation`:
  named aggregates (row count, sums, …) computed by the engine DURING
  the query's own action. Zero extra jobs, exact, and works on any
  plan. This is the supported PySpark metrics hook (the JVM
  ``QueryExecutionListener`` interface is not reachable from Python
  without a py4j callback server, which headless deployments disable).
* **driver-side counters** — :class:`MetricsRegistry` accumulates
  per-query run counts and wall-time, and renders a Prometheus-style
  text exposition so the parity with the reference's ``/metrics``
  endpoint is literal: point any scraper at :meth:`render_prometheus`.

Executor-level detail (shuffle bytes, spill, task skew) intentionally
stays with the Spark UI / history server REST API — re-exporting it
here would duplicate an existing, better tool.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observed", "MetricsRegistry", "QueryStats"]


def observed(df: DataFrame, name: str, *extra_metrics: Column):
    """Attach a named in-plan observation: output row count plus any
    caller aggregates. Returns ``(instrumented_df, observation)``;
    ``observation.get`` blocks until the df's first action and then
    yields the metric dict — collected by the engine inside that same
    action."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *extra_metrics), obs


@dataclass
class QueryStats:
    n_runs: int = 0
    total_seconds: float = 0.0
    last_seconds: float = 0.0
    last_metrics: dict = field(default_factory=dict)


class MetricsRegistry:
    """Driver-side per-query counters, the coordinator's QPS/latency
    story: ``run`` executes a DataFrame with wall-time + observed row
    count recorded under the query's name."""

    def __init__(self) -> None:
        self._stats: dict[str, QueryStats] = {}

    @contextmanager
    def track(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._stats.setdefault(name, QueryStats())
            s.n_runs += 1
            s.total_seconds += dt
            s.last_seconds = dt

    def run(self, df: DataFrame, name: str, *extra_metrics: Column) -> dict:
        """Execute ``df`` (noop sink: full distributed execution, no
        driver materialization) with in-plan metrics + wall time
        recorded; returns the observed metric dict."""
        inst, obs = observed(df, f"{name}#{self._stats.get(name, QueryStats()).n_runs}", *extra_metrics)
        with self.track(name):
            inst.write.mode("overwrite").format("noop").save()
        metrics = dict(obs.get)
        self._stats[name].last_metrics = metrics
        return metrics

    def snapshot(self) -> dict[str, QueryStats]:
        return dict(self._stats)

    def render_prometheus(self, prefix: str = "vdb") -> str:
        """Prometheus text exposition of the counters — the literal
        shape of the reference's /metrics endpoint."""
        lines = [
            f"# TYPE {prefix}_queries_total counter",
            f"# TYPE {prefix}_query_seconds_total counter",
            f"# TYPE {prefix}_query_last_seconds gauge",
            f"# TYPE {prefix}_query_last_rows gauge",
        ]
        for name in sorted(self._stats):
            s = self._stats[name]
            lines.append(f'{prefix}_queries_total{{query="{name}"}} {s.n_runs}')
            lines.append(
                f'{prefix}_query_seconds_total{{query="{name}"}} {s.total_seconds:.6f}'
            )
            lines.append(
                f'{prefix}_query_last_seconds{{query="{name}"}} {s.last_seconds:.6f}'
            )
            if "n_rows" in s.last_metrics:
                lines.append(
                    f'{prefix}_query_last_rows{{query="{name}"}} {s.last_metrics["n_rows"]}'
                )
        return "\n".join(lines) + "\n"
