"""Dump .explain("formatted") for headline queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/explain_dump.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/explain_dump.py r12 before /root/testdata/sf0.1

Captures the pre-execution plan (AdaptiveSparkPlan isFinalPlan=false) — the
shape the optimizer chose: Exchange count/placement, join strategies,
PushedFilters/ReadSchema, WholeStageCodegen spans, Python eval nodes.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ironbeam_spark.session import get_spark  # noqa: E402
from ironbeam_spark.suite import QUERIES  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or [n for n, q in QUERIES.items() if q.bench]

    out_dir = Path(_REPO) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("ironbeam-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"# wrote {name}_{suffix}.txt ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
