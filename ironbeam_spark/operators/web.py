"""Web-corpus DataFrame operators: domain-level rollups and blocklist
filtering over URL columns (north-star web-pipeline curation — no
reference counterpart; the RefinedWeb/C4 front half: URL-level blocklist
filtering and per-domain volume/quality accounting feed every downstream
keep/drop decision in a Common-Crawl-scale pretraining pipeline).

Scale shape: the per-row work (parse → canonical host → registered
domain) is pure whole-stage-codegen expression work from
:mod:`ironbeam_spark.functions.web`; ``domain_stats`` then costs exactly
one partial+final aggregation shuffle on the (low-cardinality) domain
key; ``blocklist_filter`` is a broadcast LEFT ANTI join (the blocklist —
even industry ones like UT1 — is a few MB, never shuffle-joined).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, functions as F

from ironbeam_spark.functions.web import registered_domain, url_host

__all__ = [
    "with_registered_domain",
    "blocklist_filter",
    "domain_stats",
    "domain_filter",
    "registered_domain_via_join",
]


def with_registered_domain(
    df: DataFrame, url_col: str, out_col: str = "registered_domain"
) -> DataFrame:
    """Add canonical-host and PSL registered-domain columns for ``url_col``
    (``<out_col>_host`` and ``out_col``; NULL for unparseable URLs,
    IP-literal hosts, and bare public suffixes)."""
    host = url_host(url_col)
    return df.withColumn(f"{out_col}_host", host).withColumn(
        out_col, registered_domain(F.col(f"{out_col}_host"))
    )


def blocklist_filter(
    df: DataFrame,
    domain_col: str,
    blocked: DataFrame | Iterable[str],
    *,
    keep_null_domain: bool = False,
) -> DataFrame:
    """Drop rows whose registered domain is on a blocklist.

    ``blocked`` is a 1-column DataFrame (any column name) or an iterable
    of domain strings; either way it is broadcast into a LEFT ANTI join —
    the scale-correct shape for a list that is always tiny relative to
    the corpus.  Rows with a NULL domain (unparseable URL / IP host) are
    dropped by default: a document whose provenance can't be resolved
    can't be vetted against the blocklist (C4 keeps the same default).
    """
    if not isinstance(blocked, DataFrame):
        blocked = df.sparkSession.createDataFrame(
            [(d,) for d in sorted(set(blocked))], "blocked_domain string"
        )
    else:
        blocked = blocked.toDF("blocked_domain")
    out = df.join(
        F.broadcast(blocked),
        df[domain_col] == blocked["blocked_domain"],
        "left_anti",
    )
    if not keep_null_domain:
        out = out.where(F.col(domain_col).isNotNull())
    return out


def domain_stats(
    df: DataFrame,
    url_col: str,
    *,
    blocklist: DataFrame | Iterable[str] | None = None,
    agg_cols: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Per-registered-domain rollup: document count, distinct canonical
    hosts, plus any caller aggregates (e.g. exact char sums, distinct
    language counts).  With ``blocklist``, blocked domains are dropped
    first via :func:`blocklist_filter` (broadcast LEFT ANTI).

    Rows whose URL yields no registered domain are excluded (they have
    no domain to account under).  One aggregation shuffle on the domain
    key; distinct-host counting rides the same partial/final aggregate.
    """
    base = with_registered_domain(df, url_col)
    if blocklist is not None:
        base = blocklist_filter(base, "registered_domain", blocklist)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("registered_domain_host").alias("n_hosts"),
    ] + [expr.alias(name) for name, expr in (agg_cols or {}).items()]
    return (
        base.where(F.col("registered_domain").isNotNull())
        .groupBy("registered_domain")
        .agg(*aggs)
    )


def domain_filter(
    df: DataFrame,
    url_col: str,
    stat_col: str,
    min_mean: float,
    *,
    scale: int = 1000,
) -> DataFrame:
    """Keep only rows whose registered domain's MEAN of ``stat_col``
    meets ``min_mean`` — domain-level quality gating (Gopher/RefinedWeb
    drop entire low-quality domains, not just low-quality documents).

    The mean comparison is exact rational arithmetic on int64 — each
    stat value is scaled to ``round(stat * scale)`` BEFORE the int64
    cast (so fractional stats participate at 1/scale resolution instead
    of silently flooring), then ``sum_scaled >= count * round(min_mean *
    scale)`` — the keep set is deterministic and oracle-exact (no FP
    mean).  Integer stats are compared exactly for any ``scale``;
    fractional stats are compared at 1/scale resolution (round-half-even
    on ``stat * scale``).  Rows with no registered domain are dropped
    (nothing to account them under).

    Plan shape: one partial+final aggregation shuffle on the domain key
    produces the (low-cardinality) per-domain stat table, which then
    broadcast-joins back onto the corpus — the aggregate→join-back
    pattern costs ONE shuffle of domain-sized rows, never a corpus
    shuffle.
    """
    base = with_registered_domain(df, url_col)
    threshold = round(min_mean * scale)
    scaled_stat = F.round(F.col(stat_col) * scale).cast("long")
    stats = (
        base.where(F.col("registered_domain").isNotNull())
        .groupBy("registered_domain")
        .agg(
            F.sum(scaled_stat).alias("_stat_sum"),
            F.count(F.lit(1)).alias("_stat_n"),
        )
        .where(F.col("_stat_sum") >= F.col("_stat_n") * threshold)
        .select("registered_domain")
    )
    return base.join(F.broadcast(stats), "registered_domain", "left_semi")


def registered_domain_via_join(
    df: DataFrame,
    host_col: str,
    suffixes: DataFrame | Iterable[str] | None = None,
    out_col: str = "registered_domain",
) -> DataFrame:
    """Registered-domain extraction via a broadcast suffix join — the
    full-PSL scale path promised in functions/web.py.

    The expression form (:func:`ironbeam_spark.functions.web.registered_domain`)
    probes an embedded literal array per row, which is ideal for a
    curated subset but awkward for the full ~9k-entry publicsuffix.org
    list.  This variant takes the multi-label suffix table as DATA: a
    1-column DataFrame (or iterable) of 2-label public suffixes, LEFT
    broadcast-joined against each host's last-2-label string.  Longest
    match wins exactly as in the expression form: a matched 2-label
    suffix promotes the registered domain to the last 3 labels (NULL if
    the host IS the suffix); otherwise the implicit 1-label TLD rule
    yields the last 2 labels; IP literals and single labels yield NULL.

    Plan shape: ONE broadcast hash join (suffix table is KB-MB scale),
    zero shuffles of the corpus — semantically interchangeable with the
    expression form (equality pinned in tests/test_web_models.py).
    """
    from ironbeam_spark.functions.web import MULTI_LABEL_SUFFIXES

    spark = df.sparkSession
    if suffixes is None:
        suffixes = MULTI_LABEL_SUFFIXES
    if not isinstance(suffixes, DataFrame):
        suffixes = spark.createDataFrame(
            [(s,) for s in sorted(set(suffixes))], "_psl_suffix string"
        )
    else:
        # a duplicate suffix row would DUPLICATE every matching corpus row
        # through the left join — dedup the (tiny) table up front
        suffixes = suffixes.toDF("_psl_suffix").distinct()

    h = F.col(host_col)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    base = df.withColumn("_psl_last2", F.array_join(F.slice(labels, -2, 2), "."))
    joined = base.join(
        F.broadcast(suffixes),
        base["_psl_last2"] == suffixes["_psl_suffix"],
        "left",
    )
    is_ip = h.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    matched = F.col("_psl_suffix").isNotNull()
    domain = (
        F.when(h.isNull() | is_ip | (n < 2), F.lit(None).cast("string"))
        .when(matched & (n >= 3), F.array_join(F.slice(labels, -3, 3), "."))
        .when(matched, F.lit(None).cast("string"))
        .otherwise(F.col("_psl_last2"))
    )
    return joined.withColumn(out_col, domain).drop("_psl_last2", "_psl_suffix")
