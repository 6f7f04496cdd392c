"""Plan inspection & optimization narrative (reference ``Plan::explain()`` →
``ExecutionExplanation`` with steps + optimization decisions,
``src/planner.rs:304-786``).

Catalyst already applies every rewrite the reference implements by hand
(SURVEY §4: fusion = WholeStageCodegen, pushdown = PushDownPredicates, partial
aggregation = HashAggregate partial/final, Bloom semi-join = runtime bloom
filters, adaptive partitions = AQE).  What the reference's ``explain`` adds is
a *narrative* — which optimizations actually applied.  ``plan_report`` parses
the formatted physical plan into that same structure, and the test suite
asserts plan shape with it (scan pruning, broadcasts, codegen coverage), so a
regression that silently de-optimizes a query fails CI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["PlanReport", "plan_report", "explain_formatted"]


@dataclass
class PlanReport:
    """Structured summary of a physical plan."""

    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    exchanges: int = 0
    hash_aggregates: int = 0
    codegen_stages: int = 0
    scans: int = 0
    take_ordered: bool = False
    aqe: bool = False

    def narrative(self) -> str:
        """Human-readable optimization story (the reference's
        ``OptimizationDecision`` list analogue)."""
        lines = [
            f"scans={self.scans} (pushed filter groups: {len(self.pushed_filters)})",
            f"joins: broadcast={self.broadcast_joins} sortmerge={self.sortmerge_joins} "
            f"shuffledhash={self.shuffled_hash_joins}",
            f"exchanges={self.exchanges}; hash aggregates={self.hash_aggregates} "
            "(>=2 per group = partial+final map-side combine)",
            f"whole-stage codegen stages={self.codegen_stages}",
            f"adaptive execution={'on' if self.aqe else 'off'}",
        ]
        if self.take_ordered:
            lines.append("top-k via TakeOrderedAndProject (no global sort)")
        return "\n".join(lines)


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (``df.explain`` prints only)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame, execute: bool = False) -> PlanReport:
    """Parse ``explain("formatted")`` output into a :class:`PlanReport`.

    ``execute=True`` additionally runs the query and reads codegen stage
    markers (``*(n)``) from the final AQE plan — whole-stage codegen spans are
    only visible after adaptive execution finalizes the plan."""
    text = explain_formatted(df)
    rep = PlanReport()
    rep.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", text) if m.strip()
    ]
    rep.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    rep.partition_filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", text) if m.strip()
    ]
    rep.broadcast_joins = len(re.findall(r"BroadcastHashJoin", text))
    rep.sortmerge_joins = len(re.findall(r"SortMergeJoin", text))
    rep.shuffled_hash_joins = len(re.findall(r"ShuffledHashJoin", text))
    rep.exchanges = len(re.findall(r"\bExchange\b", text))
    rep.hash_aggregates = len(re.findall(r"HashAggregate", text))
    rep.codegen_stages = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
    rep.scans = len(re.findall(r"Scan parquet|Scan ExistingRDD|Scan In-memory", text))
    rep.take_ordered = "TakeOrderedAndProject" in text
    rep.aqe = "AdaptiveSparkPlan" in text
    if execute:
        # collect() (not count()) — count wraps the frame in a NEW query
        # execution, leaving this one's adaptive plan unfinalized
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        rep.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", final)))
    return rep
