"""Pipeline metrics (reference ``Metric`` / ``MetricsCollector`` /
``CounterMetric`` with print + save-to-JSON + start/end timing,
``src/metrics.rs:77-327``; pipeline hooks ``src/pipeline.rs:386-441``).

Spark-idiomatic mapping: per-query counters ride the job itself via
``df.observe`` (no second pass — the scalable ErrorCollector/counter path),
wall timing wraps the action, and the collector aggregates, prints, and
saves JSON exactly like the reference's surface.  Executor-side custom
counters beyond observations would use accumulators; row/byte totals are
already covered by observations.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

__all__ = ["MetricsCollector", "QueryMetrics"]


@dataclass
class QueryMetrics:
    name: str
    wall_sec: float
    counters: dict[str, Any] = field(default_factory=dict)


class MetricsCollector:
    """Collects named query metrics (reference ``MetricsCollector``,
    ``src/metrics.rs:98``): ``run()`` executes an action with timing and
    attached counter expressions; ``report()`` pretty-prints;
    ``save_json()`` persists."""

    def __init__(self) -> None:
        self.metrics: list[QueryMetrics] = []

    def run(
        self,
        name: str,
        df: DataFrame,
        action=lambda d: d.collect(),
        counters: dict[str, Column] | None = None,
    ):
        """Execute ``action(df)`` with wall timing; ``counters`` are
        aggregate expressions observed during the same job (reference
        ``CounterMetric`` — zero extra passes)."""
        obs = None
        if counters:
            obs = Observation(f"metrics_{name}")
            df = df.observe(obs, *[expr.alias(k) for k, expr in counters.items()])
        t0 = time.perf_counter()
        result = action(df)
        wall = time.perf_counter() - t0
        got = dict(obs.get) if obs is not None else {}
        self.metrics.append(QueryMetrics(name, round(wall, 4), got))
        return result

    def report(self) -> str:
        lines = []
        for m in self.metrics:
            ctr = ", ".join(f"{k}={v}" for k, v in m.counters.items())
            lines.append(f"{m.name}: {m.wall_sec:.3f}s" + (f" [{ctr}]" if ctr else ""))
        return "\n".join(lines)

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                [
                    {"name": m.name, "wall_sec": m.wall_sec, "counters": m.counters}
                    for m in self.metrics
                ],
                f,
                indent=2,
                default=str,
            )

    def counter_rows(self) -> dict[str, Column]:
        """Convenience: the standard row-count counter."""
        return {"n_rows": F.count(F.lit(1))}
