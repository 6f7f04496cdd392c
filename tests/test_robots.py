"""RFC 9309 robots.txt operator (operators/robots.py) vs a hand-written
from-spec model: an independent loop-based parser/matcher implementing
the published algorithm (group selection §2.2.1, longest-match with
Allow tie-break §2.2.2) with none of the engine's window/LIKE machinery.
"""

from __future__ import annotations

import re

from ironbeam_spark.operators.robots import robots_filter, robots_rules

# ---------------------------------------------------------------------------
# from-spec model (plain python, loop-based)


def _model_parse(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """[(agents, [(allow, pattern), ...]), ...] per RFC 9309 grouping."""
    records: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_ua_run = False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        name, value = line.split(":", 1)
        name, value = name.strip().lower(), value.strip()
        if name == "user-agent":
            if not in_ua_run:
                if agents:
                    records.append((agents, rules))
                agents, rules = [], []
            agents.append(value.lower())
            in_ua_run = True
        elif name in ("allow", "disallow"):
            in_ua_run = False
            if agents and value:
                rules.append((name == "allow", value))
    if agents:
        records.append((agents, rules))
    return records


def _model_match(pattern: str, path: str) -> bool:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.match(rx + ("$" if anchored else ""), path) is not None


def _model_allowed(text: str | None, agent: str, path: str) -> bool:
    if text is None:
        return True
    records = _model_parse(text)
    chosen = [r for a, r in records if agent.lower() in a]
    if not chosen:
        chosen = [r for a, r in records if "*" in a]
    best: tuple[int, bool] | None = None
    for rules in chosen:
        for allow, pattern in rules:
            if _model_match(pattern, path):
                key = (len(pattern), allow)
                if best is None or key > best:
                    best = key
    return best[1] if best else True


_ROBOTS = {
    "a.example": (
        "# politeness file\n"
        "User-agent: IronBeam\n"
        "Allow: /crawl/\n"
        "Disallow: /crawl/1*\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    ),
    "b.example": (
        "Disallow: /ignored-before-any-ua\n"
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "User-agent: ironbeam\n"
        "User-agent: second-bot\n"
        "Disallow: /crawl/4\n"
        "Allow: /crawl/44\n"
    ),
    "c.example": (
        "User-agent: *\n"
        "Allow: /crawl/2$\n"
        "Disallow: /crawl/2\n"
    ),
    "d.example": "User-agent: *\nDisallow:\n",   # empty pattern: allow all
    "e.example": (
        "User-agent: *\n"
        "Disallow: /*/private\n"                  # mid-pattern wildcard
        "Allow: /pub*\n"
    ),
}

_PATHS = [
    "/", "/crawl/", "/crawl/1", "/crawl/12", "/crawl/2", "/crawl/23",
    "/crawl/4", "/crawl/44", "/crawl/45", "/other", "/x/private",
    "/pub/x/private", "/publication",
]


def test_robots_verdicts_match_from_spec_model(spark):
    rows = [(k, v) for k, v in _ROBOTS.items()] + [("f.example", None)]
    robots = spark.createDataFrame(
        [(k, v) for k, v in rows if v is not None], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(d, p) for d, _ in rows for p in _PATHS], "domain string, path string"
    )
    got = {
        (r.domain, r.path): r.ok
        for r in robots_filter(
            docs, "path", robots, "ironbeam", verdict_col="ok"
        ).collect()
    }
    assert len(got) == len(rows) * len(_PATHS)
    for domain, text in rows:
        for path in _PATHS:
            want = _model_allowed(text, "ironbeam", path)
            assert got[(domain, path)] == want, (domain, path, got[(domain, path)], want)


def test_specific_group_silences_star(spark):
    robots = spark.createDataFrame(
        [("a.example", _ROBOTS["a.example"])], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame([("a.example", "/other")], "domain string, path string")
    # '*' says Disallow /, but the ironbeam group exists and has no match -> allowed
    assert robots_filter(docs, "path", robots, "IRONBEAM").count() == 1
    # an agent with no specific group falls back to '*' -> denied
    assert robots_filter(docs, "path", robots, "somebody-else").count() == 0


def test_tie_break_and_anchor(spark):
    robots = spark.createDataFrame(
        [("c.example", _ROBOTS["c.example"])], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [("c.example", "/crawl/2"), ("c.example", "/crawl/23")],
        "domain string, path string",
    )
    kept = {r.path for r in robots_filter(docs, "path", robots, "anybot").collect()}
    assert kept == {"/crawl/2"}  # $-anchored Allow (len 9) beats Disallow (len 8)


def test_parsed_rules_like_translation(spark):
    robots = spark.createDataFrame(
        [("e.example", _ROBOTS["e.example"])], "domain string, robots_txt string"
    )
    rules = {
        r.pattern: r
        for r in robots_rules(robots, "anybot").collect()
    }
    assert rules["/*/private"].like_pat == "/%/private%"
    assert rules["/pub*"].like_pat == "/pub%%"
    assert rules["/*/private"].rule_len == len("/*/private")


def test_missing_robots_key_allows(spark):
    robots = spark.createDataFrame(
        [("a.example", _ROBOTS["a.example"])], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [("nowhere.example", "/crawl/1")], "domain string, path string"
    )
    assert robots_filter(docs, "path", robots, "ironbeam").count() == 1


def test_broadcast_no_corpus_shuffle(spark):
    robots = spark.createDataFrame(
        [("a.example", _ROBOTS["a.example"])], "domain string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [("a.example", "/crawl/7")], "domain string, path string"
    )
    out = robots_filter(docs, "path", robots, "ironbeam", verdict_col="ok")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
