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

__all__ = [
    "CostEstimate",
    "PlanReport",
    "plan_report",
    "cost_estimates",
    "explain_formatted",
]


@dataclass
class CostEstimate:
    """Catalyst statistics for one plan node (the reference's
    ``CostEstimate`` analogue, ``src/planner.rs:304-786``): estimated output
    bytes always, estimated rows when the estimator can derive them."""

    node: str
    size_bytes: int
    rows: int | None

    def render(self) -> str:
        rows = f"~{self.rows} rows" if self.rows is not None else "rows unknown"
        return f"{self.node}: ~{self.size_bytes} B, {rows}"


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
    output_estimate: CostEstimate | None = None
    leaf_estimates: list[CostEstimate] = field(default_factory=list)

    def narrative(self) -> str:
        """Human-readable optimization story (the reference's
        ``OptimizationDecision`` list + ``CostEstimate`` analogue)."""
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
        if self.output_estimate is not None:
            lines.append(f"cost estimate (output): {self.output_estimate.render()}")
        for est in self.leaf_estimates:
            lines.append(f"cost estimate (scan): {est.render()}")
        return "\n".join(lines)


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (``df.explain`` prints only)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _node_estimate(jplan) -> CostEstimate:
    stats = jplan.stats()
    # py4j auto-converts scala BigInt-backed values to Python ints when they
    # fit; fall back to toString for the arbitrary-precision case
    size = stats.sizeInBytes()
    if not isinstance(size, int):
        size = int(size.toString())
    rows = None
    if stats.rowCount().isDefined():
        rows = stats.rowCount().get()
        if not isinstance(rows, int):
            rows = int(rows.toString())
    return CostEstimate(node=jplan.nodeName(), size_bytes=size, rows=rows)


def cost_estimates(df: DataFrame) -> tuple[CostEstimate, list[CostEstimate]]:
    """Catalyst's size/row statistics from the OPTIMIZED logical plan —
    (root output estimate, one estimate per leaf scan).  Sizes come from the
    file-source statistics and Catalyst's per-operator propagation; row
    counts appear when derivable (e.g. after CBO column stats or a local
    relation).  This is the reference ``ExecutionExplanation.cost`` surface
    (``src/planner.rs:304-786``) mapped onto Spark's native estimator."""
    jplan = df._jdf.queryExecution().optimizedPlan()
    root = _node_estimate(jplan)
    leaves_seq = jplan.collectLeaves()
    leaves = [
        _node_estimate(leaves_seq.apply(i)) for i in range(leaves_seq.size())
    ]
    return root, leaves


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
    rep.output_estimate, rep.leaf_estimates = cost_estimates(df)
    if execute:
        # collect() (not count()) — count wraps the frame in a NEW query
        # execution, leaving this one's adaptive plan unfinalized
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        rep.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", final)))
    return rep
