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
    "crawl_schedule",
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
        from ironbeam_spark.scale import local_metadata_df

        # JVM-literal local frame: a parallelized createDataFrame would pay
        # one Python task per default-parallelism slice at every action
        blocked = local_metadata_df(
            df.sparkSession,
            [(d,) for d in sorted(set(blocked))],
            "blocked_domain string",
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
    """Registered-domain extraction via broadcast suffix joins — the
    FULL publicsuffix.org algorithm over an arbitrary rule table.

    The expression form (:func:`ironbeam_spark.functions.web.registered_domain`)
    probes an embedded literal array of curated 2-label suffixes per
    row; this variant takes the rule table as DATA (a 1-column DataFrame
    or iterable of rule strings in PSL syntax) and implements the
    published algorithm exactly:

    - **normal rules** of any label count (``com``, ``co.uk``,
      ``pref.hokkaido.jp``): the rule is the public suffix when it
      equals the host's label-suffix of the same length;
    - **wildcard rules** (``*.ck``, ``*.kawasaki.jp``): ``*`` consumes
      exactly one host label, so the rule matches hosts with at least
      as many labels as the rule and the public suffix spans the rule's
      label count;
    - **exception rules** (``!www.ck``, ``!city.kawasaki.jp``): if one
      matches it prevails over EVERY other match, and the public suffix
      is the rule minus its leftmost label;
    - otherwise the prevailing rule is the matching rule with the most
      labels; if nothing matches, the implicit default rule ``*`` makes
      the bare TLD the public suffix.

    The registered domain (eTLD+1) is the public suffix plus one label
    — NULL when the host IS a public suffix (or shorter), is an IPv4
    literal, or is NULL.  With a 2-label normal-rules-only table this
    reduces to the previous curated-subset behavior.

    Plan shape: the rule table is grouped by key label-count into at
    most ``max(label count)`` tiny per-length tables (~5 for the real
    PSL), each LEFT **broadcast** hash-joined against the host's
    label-suffix of that length — zero shuffles of the corpus, and the
    per-row work stays whole-stage-codegen expressions.  The only
    driver-side materialization is the rule table's distinct key
    lengths (≤ ~6 rows — metadata-bounded).
    """
    from ironbeam_spark.functions.web import MULTI_LABEL_SUFFIXES

    spark = df.sparkSession
    if suffixes is None:
        suffixes = MULTI_LABEL_SUFFIXES

    def _parse(rule: str) -> tuple[str, bool, bool] | None:
        """rule → (key, is_exception, is_wildcard); None for the bare
        default rule '*' (implicit in the fallback) / empty lines."""
        exc = rule.startswith("!")
        body = rule[1:] if exc else rule
        wc = body.startswith("*.")
        key = body[2:] if wc else body
        if not key or key == "*":
            return None
        return key, exc, wc

    # Build one tiny per-key-length table of presence flags.  For an
    # iterable rule set (incl. the default curated table) this happens
    # driver-side into literal DataFrames — the corpus-side plan then
    # contains ONLY broadcast joins, zero exchanges anywhere.  For a
    # DataFrame rule set the same normalization runs data-side (the
    # dedup/aggregation exchange touches the KB-scale rule table only,
    # underneath its BroadcastExchange — never the corpus).
    per_len_tables: dict[int, DataFrame] = {}
    if not isinstance(suffixes, DataFrame):
        per_len: dict[int, dict[str, list[bool]]] = {}
        for rule in sorted(set(suffixes)):
            parsed = _parse(rule)
            if parsed is None:
                continue
            key, exc, wc = parsed
            flags = per_len.setdefault(key.count(".") + 1, {}).setdefault(
                key, [False, False, False]
            )
            flags[0] |= not exc and not wc
            flags[1] |= exc
            flags[2] |= wc
        for L, entries in per_len.items():
            from ironbeam_spark.scale import local_metadata_df

            # JVM-literal local frame (see local_metadata_df): zero Python
            # tasks in the broadcast build
            per_len_tables[L] = local_metadata_df(
                spark,
                [
                    (k, 1 if e else None, 1 if x else None, 1 if w else None)
                    for k, (e, x, w) in sorted(entries.items())
                ],
                f"_psl_k{L} string, _psl_e{L} int, _psl_x{L} int, _psl_w{L} int",
            )
    else:
        # a duplicate rule row would DUPLICATE every matching corpus row
        # through the left join — the groupBy below dedups the (tiny)
        # table up front
        rules = suffixes.toDF("_psl_rule")
        raw = F.col("_psl_rule")
        body = F.when(raw.startswith("!"), F.substring(raw, 2, 2**30)).otherwise(raw)
        keyed = (
            rules.select(
                raw.startswith("!").alias("_exc"),
                body.startswith("*.").alias("_wc"),
                F.when(
                    body.startswith("*."), F.substring(body, 3, 2**30)
                ).otherwise(body).alias("_psl_key"),
            )
            .where((F.col("_psl_key") != "") & (F.col("_psl_key") != "*"))
            .withColumn("_klen", F.size(F.split(F.col("_psl_key"), r"\.")))
        )
        # metadata-bounded collect: distinct key label-counts (≤ ~6 for
        # the full 9k-entry publicsuffix.org list)
        for (L,) in keyed.select("_klen").distinct().collect():
            per_len_tables[L] = (
                keyed.where(F.col("_klen") == L)
                .groupBy("_psl_key")
                .agg(
                    F.max(
                        F.when(~F.col("_exc") & ~F.col("_wc"), 1)
                    ).alias(f"_psl_e{L}"),
                    F.max(F.when(F.col("_exc"), 1)).alias(f"_psl_x{L}"),
                    F.max(F.when(F.col("_wc"), 1)).alias(f"_psl_w{L}"),
                )
                .withColumnRenamed("_psl_key", f"_psl_k{L}")
            )

    key_lens = sorted(per_len_tables)
    h = F.col(host_col)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    base = df
    tail_cols: list[str] = []
    for L in key_lens:
        tc = f"_psl_t{L}"
        tail_cols.append(tc)
        base = base.withColumn(
            tc,
            F.when(n >= L, F.array_join(F.slice(labels, -L, L), ".")),
        )

    joined = base
    drop_cols = list(tail_cols)
    for L in key_lens:
        tL = per_len_tables[L]
        joined = joined.join(
            F.broadcast(tL),
            joined[f"_psl_t{L}"] == tL[f"_psl_k{L}"],
            "left",
        )
        drop_cols += [f"_psl_k{L}", f"_psl_e{L}", f"_psl_x{L}", f"_psl_w{L}"]

    def _greatest(cols: list) -> F.Column:
        if not cols:
            return F.lit(None).cast("int")
        if len(cols) == 1:
            return cols[0]
        return F.greatest(*cols)

    # Public-suffix label count: exception match (rule minus leftmost
    # label) beats all; else the longest match among normal rules (ps =
    # key length) and wildcard rules (ps = key length + 1, needing one
    # host label for the '*'); else the default rule '*' (ps = 1).
    exc_ps = _greatest(
        [F.when(F.col(f"_psl_x{L}").isNotNull(), F.lit(L - 1)) for L in key_lens]
    )
    norm_ps = _greatest(
        [F.when(F.col(f"_psl_e{L}").isNotNull(), F.lit(L)) for L in key_lens]
        + [
            F.when(
                F.col(f"_psl_w{L}").isNotNull() & (n >= L + 1), F.lit(L + 1)
            )
            for L in key_lens
        ]
    )
    ps = F.coalesce(exc_ps, norm_ps, F.lit(1))
    dlen = ps + F.lit(1)
    is_ip = h.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    domain = (
        F.when(h.isNull() | is_ip | (n < dlen), F.lit(None).cast("string"))
        .otherwise(F.array_join(F.slice(labels, -dlen, dlen), "."))
    )
    return joined.withColumn(out_col, domain).drop(*drop_cols)


def crawl_schedule(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    delay: int,
    out_col: str = "scheduled_ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Politeness scheduler: assign each request its earliest fetch slot
    under a fixed per-key minimum ``delay`` (int64, same unit as
    ``ts_col``) — the crawl-frontier rate limit (one request per domain
    per delay window, RFC 9309 §2.5's crawl-delay shape).

    Semantics are the sequential recurrence over each key's requests in
    ``(ts, tiebreak)`` order::

        s_0 = ts_0;  s_i = max(ts_i, s_{i-1} + delay)

    A per-key sequential loop cannot scale, so the recurrence is
    UNROLLED into associative window algebra: with 0-based in-key rank
    ``r``, ``s_i = max_{j<=i}(ts_j - r_j*delay) + r_i*delay`` — a
    running MAX, which Spark evaluates as one hash exchange on the key
    plus one in-partition sort shared by both window passes.  Exact
    int64 throughout (no FP).  Parallelism is across keys — the honest
    limit, since each key's schedule is inherently order-dependent; a
    100 TB frontier has ~10^8 domains, so the key space saturates any
    cluster.

    ``tiebreak_col`` makes the in-key order total when timestamps can
    collide (required for deterministic output).
    """
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w_rank = W.partitionBy(key_col).orderBy(*order)
    r = F.row_number().over(w_rank) - F.lit(1)
    return df.withColumn("_cs_rank", r.cast("long")).withColumn(
        out_col,
        F.max(F.col(ts_col) - F.col("_cs_rank") * F.lit(delay)).over(
            W.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        + F.col("_cs_rank") * F.lit(delay),
    ).drop("_cs_rank")
