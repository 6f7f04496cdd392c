"""robots.txt parsing and URL filtering per RFC 9309 (north-star crawl
politeness — no reference counterpart; the gate every compliant crawl
pipeline applies before a URL enters the corpus).

Implemented contract (the RFC 9309 core, documented subset):

- records ("groups") are runs of ``User-agent`` lines followed by
  ``Allow``/``Disallow`` rules; a ``User-agent`` line directly after a
  rule line starts a NEW record, consecutive ``User-agent`` lines share
  one record; ``#`` starts a comment; unknown directives and rules
  before any ``User-agent`` line are ignored.
- group selection: all records naming the agent (case-insensitive exact
  product token) apply; if none do, the ``*`` records apply; matching a
  specific agent means the ``*`` records are IGNORED (RFC 9309 §2.2.1).
- rule matching: a rule matches when its path pattern matches a prefix
  of the URL path, with ``*`` matching any character run and a TRAILING
  ``$`` anchoring the end (mid-pattern ``$`` is literal).  The most
  specific match wins — longest pattern as written, octets — and on a
  length tie ``Allow`` wins (§2.2.2).  No matching rule, an
  empty-pattern rule, or no robots.txt at all ⇒ allowed.
- out of scope (documented): percent-encoding normalization of rule
  paths, crawl-delay/sitemap directives, substring product-token
  matching ("Goog" matching "Googlebot").

Scale shape: robots tables are metadata-scale (one small text per host/
domain — Common Crawl's robots subset is ~GBs against TBs of pages), so
parsing runs as expression+window work over the tiny table, rules
aggregate to one array row per key, and the corpus-side evaluation is a
BROADCAST left join plus a per-row higher-order-function fold — the
corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robots_rules", "robots_filter"]

_DIRECTIVES = ("user-agent", "allow", "disallow")


def robots_rules(
    robots_df: DataFrame,
    agent: str,
    *,
    key_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse raw robots.txt texts into the rule set that applies to
    ``agent``: ``(key_col, allow_i int, pattern string, rule_len int,
    like_pat string)``.

    ``like_pat`` is the SQL LIKE translation of the pattern (escape char
    ``!``): ``*`` → ``%``, a trailing ``$`` anchors (no trailing ``%``),
    otherwise a trailing ``%`` expresses prefix-match.  ``rule_len`` is
    the pattern length AS WRITTEN (the RFC's specificity measure).
    """
    key = F.col(key_col)
    w = Window.partitionBy(key_col).orderBy("pos")

    lines = robots_df.select(
        key_col, F.posexplode(F.split(text_col, "\n")).alias("pos", "raw")
    )
    cleaned = lines.select(
        key_col,
        "pos",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    ).where((F.col("line") != "") & F.col("line").contains(":"))
    parsed = cleaned.select(
        key_col,
        "pos",
        F.lower(F.trim(F.substring_index("line", ":", 1))).alias("directive"),
        F.trim(F.expr("substring(line, instr(line, ':') + 1)")).alias("value"),
    ).where(F.col("directive").isin(*_DIRECTIVES))

    is_ua = F.col("directive") == "user-agent"
    recs = parsed.withColumn(
        "rec_id",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).where(F.col("rec_id") > 0)  # rules before any User-agent line: ignored

    uas = recs.where(is_ua).select(
        key_col, "rec_id", F.lower(F.col("value")).alias("agent_name")
    )
    rules = recs.where(~is_ua & (F.col("value") != "")).select(
        key_col,
        "rec_id",
        (F.col("directive") == "allow").cast("int").alias("allow_i"),
        F.col("value").alias("pattern"),
    )

    agent_l = agent.lower()
    specific = uas.where(F.col("agent_name") == agent_l).select(key_col, "rec_id").distinct()
    star = uas.where(F.col("agent_name") == "*").select(key_col, "rec_id").distinct()
    # specific-group presence silences the * group entirely (RFC 9309 §2.2.1)
    selected = specific.unionByName(
        star.join(specific.select(key_col).distinct(), key_col, "left_anti")
    )
    chosen = rules.join(selected, [key_col, "rec_id"], "left_semi")

    anchored = F.col("pattern").endswith("$")
    # a TRAILING $ anchors and is removed BEFORE wildcard translation
    body = F.when(
        anchored, F.expr("substring(pattern, 1, length(pattern) - 1)")
    ).otherwise(F.col("pattern"))
    escaped = F.replace(
        F.replace(
            F.replace(body, F.lit("!"), F.lit("!!")), F.lit("%"), F.lit("!%")
        ),
        F.lit("_"),
        F.lit("!_"),
    )
    wild = F.replace(escaped, F.lit("*"), F.lit("%"))
    like_pat = F.when(anchored, wild).otherwise(F.concat(wild, F.lit("%")))
    return chosen.select(
        key_col,
        "allow_i",
        "pattern",
        F.length("pattern").cast("int").alias("rule_len"),
        like_pat.alias("like_pat"),
    )


def robots_filter(
    df: DataFrame,
    path_col: str,
    robots_df: DataFrame,
    agent: str,
    *,
    key_col: str = "domain",
    text_col: str = "robots_txt",
    verdict_col: str | None = None,
) -> DataFrame:
    """Evaluate RFC 9309 verdicts for ``df[path_col]`` against the robots
    texts keyed by ``key_col`` (which must exist in BOTH frames — host
    for spec-faithful keying, registered domain for coarse corpora).

    With ``verdict_col`` set, returns ``df`` plus that boolean column;
    otherwise returns only the allowed rows (verdict column dropped).

    One broadcast left join of a per-key rule-array table; the winner
    rule is picked per row by an expression-only fold (filter →
    transform → array_max over (rule_len, allow_i) structs — longest
    match, Allow wins ties).  Rows with no robots entry are allowed.
    """
    # collision-safe helper column: the rule array must not shadow an
    # input column (the name is interpolated into the fold expression)
    rules_col = "_robots"
    while rules_col in df.columns:
        rules_col += "_"
    rules = robots_rules(robots_df, agent, key_col=key_col, text_col=text_col)
    rule_arr = rules.groupBy(key_col).agg(
        F.collect_list(F.struct("rule_len", "allow_i", "like_pat")).alias(rules_col)
    )
    joined = df.join(F.broadcast(rule_arr), key_col, "left")
    # backtick-quote the interpolated names so non-identifier column names
    # (dots, spaces, hyphens) parse as column references, not expressions
    winner = F.expr(
        "array_max(transform("
        f"  filter(`{rules_col}`, r -> `{path_col}` LIKE r.like_pat ESCAPE '!'),"
        "  r -> struct(r.rule_len AS l, r.allow_i AS a)))"
    )
    verdict = F.when(winner.isNull(), F.lit(True)).otherwise(winner["a"] == 1)
    if verdict_col is not None:
        return joined.withColumn(verdict_col, verdict).drop(rules_col)
    return joined.where(verdict).drop(rules_col)
