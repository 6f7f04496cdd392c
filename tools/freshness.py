"""Evidence-freshness report for the r11+ rotation policy.

With every registry query driver-sampled at least once (wave 4, r10), the
audit window's job shifts from first-time coverage to evidence freshness:
each round, slots 1-15 should hold the 15 queries whose most recent GREEN
driver row is OLDEST (ties broken by canonical order), per the policy
comment in ``ironbeam_spark/suite/__init__.py``.

This tool makes the swap mechanical: it scans every ``CORRECTNESS_r*.json``
in the repo root, records the latest round in which each query had a fully
green row (rows+schema+hash match, no error), and prints:

- any query that is RED in its most recent sample (these take precedence —
  by policy a query without a green row cannot be displaced, and a
  regression must stay in the window until it re-earns green);
- the 15 stalest-green queries, in canonical order, ready to paste into
  slots 1-15 (displacing only queries that earned a green row in the
  round just recorded);
- the freshness histogram (queries per round-of-latest-green).

Usage: python tools/freshness.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def load_rows() -> dict[str, dict[int, bool]]:
    """query -> {round: green?} across every CORRECTNESS_r*.json."""
    rows: dict[str, dict[int, bool]] = {}
    for f in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except Exception:
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            )
            rows.setdefault(name, {})[rnd] = green
    return rows


def main() -> int:
    from ironbeam_spark.suite import CANONICAL_ORDER, QUERIES

    rows = load_rows()
    latest_round = max((r for by in rows.values() for r in by), default=0)
    order = {n: i for i, n in enumerate(CANONICAL_ORDER)}
    # enumeration order for ties beyond the canonical prefix
    for i, n in enumerate(QUERIES):
        order.setdefault(n, len(CANONICAL_ORDER) + i)

    red, latest_green = [], {}
    for name in QUERIES:
        by = rows.get(name, {})
        if by and not by[max(by)]:
            red.append((max(by), name))
        greens = [r for r, g in by.items() if g]
        latest_green[name] = max(greens) if greens else 0

    never = sorted((n for n in QUERIES if latest_green[n] == 0), key=order.get)
    if red:
        print("RED in most recent sample (must stay/enter the window):")
        for rnd, name in sorted(red):
            print(f"  {name} (red in r{rnd})")
    if never:
        print("never green (rotation not yet complete — finish wave coverage first):")
        for name in never:
            print(f"  {name}")

    stale = sorted(
        (n for n in QUERIES if latest_green[n] > 0),
        key=lambda n: (latest_green[n], order[n]),
    )
    print(f"\n15 stalest-green queries (candidates for slots 1-15 after r{latest_round}):")
    for name in stale[:15]:
        print(f"  {name}  (last green r{latest_green[name]})")

    hist: dict[int, int] = {}
    for n, r in latest_green.items():
        hist[r] = hist.get(r, 0) + 1
    print("\nfreshness histogram (latest-green round -> #queries):")
    for r in sorted(hist):
        label = f"r{r}" if r else "never"
        print(f"  {label}: {hist[r]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
