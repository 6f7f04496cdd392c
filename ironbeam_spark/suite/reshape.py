"""Reshape queries: pivot (long→wide) and unpivot/melt (wide→long) — table
reshaping the reference has no operator for (Spark natives: ``groupBy().
pivot()`` with explicit values so no extra distinct-scan, ``unpivot``).
Registered after the driver window; oracle-checked locally now."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.sources.io import read_table
from ironbeam_spark.suite.registry import query

_ETYPES = ["click", "error", "purchase", "view"]


@query(
    "q_pivot",
    f"""
    SELECT user_id,
           {', '.join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in _ETYPES)}
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="pivot long→wide: per-user event-type count matrix via groupBy().pivot(values=...) — explicit pivot values skip the extra distinct pass, one shuffle total (no reference counterpart; oracle = FILTERed conditional aggregation)",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _ETYPES)
        .agg(F.count(F.lit(1)))
    )
    for t in _ETYPES:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return out.orderBy("user_id")


@query(
    "q_unpivot",
    """
    WITH wide AS (
      SELECT c_custkey,
             round(c_acctbal, 2) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nation
      FROM customer WHERE c_custkey <= 100
    )
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey, 'acctbal' AS metric, acctbal AS value FROM wide
      UNION ALL
      SELECT c_custkey, 'nation' AS metric, nation AS value FROM wide
    )
    ORDER BY c_custkey, metric
    """,
    doc="unpivot/melt wide→long: Spark native unpivot (zero shuffle — a per-row explode in the same stage); oracle = UNION ALL stack",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    wide = cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nation"),
    )
    out = wide.unpivot("c_custkey", ["acctbal", "nation"], "metric", "value")
    return out.orderBy("c_custkey", "metric")


@query(
    "q_window_analytics",
    """
    SELECT c_nationkey, c_custkey,
           round(c_acctbal, 2) AS acctbal,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           cume_dist() OVER w AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(coalesce(lag(c_acctbal) OVER w, 0.0), 2) AS prev_bal,
           round(coalesce(lead(c_acctbal) OVER w, 0.0), 2) AS next_bal
    FROM customer
    WHERE c_custkey <= 200
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, rnk, c_custkey
    """,
    doc="analytic window-function family (rank/cume_dist/ntile/lag/lead) over a single per-key window — ONE shuffle+sort serves all five functions (no reference counterpart; windows there are time-buckets only)",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = read_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.coalesce(F.lag("c_acctbal").over(w), F.lit(0.0)), 2).alias("prev_bal"),
            F.round(F.coalesce(F.lead("c_acctbal").over(w), F.lit(0.0)), 2).alias("next_bal"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


@query(
    "q_merge_upsert",
    """
    WITH updates AS (
      SELECT c_custkey, c_name, round(c_acctbal + 1000, 2) AS acctbal, c_nationkey
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT 900000 + n AS c_custkey, 'Customer#new' || n::VARCHAR AS c_name,
             round(n * 1.5, 2) AS acctbal, CAST(n % 25 AS BIGINT) AS c_nationkey
      FROM (SELECT unnest(generate_series(1, 50)) AS n)
    ),
    target AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, c_nationkey
      FROM customer
    ),
    merged AS (
      SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.acctbal ELSE t.acctbal END AS acctbal,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey
      FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM merged GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="merge/upsert without a lakehouse (operators/merge.py): matched rows replaced, new rows inserted, others kept — one key-shuffle full-outer join (bucket-layout removes even that); oracle mirrors the merge in SQL",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ironbeam_spark.operators.merge import merge_upsert

    cust = read_table(spark, sf_dir, "customer")
    target = cust.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "c_nationkey"
    )
    modified = target.where(F.col("c_custkey") % 10 == 0).withColumn(
        "acctbal", F.round(F.col("acctbal") + 1000, 2)
    )
    inserts = spark.range(1, 51).select(
        (F.col("id") + 900000).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("id").cast("string")).alias("c_name"),
        F.round(F.col("id") * 1.5, 2).alias("acctbal"),
        (F.col("id") % 25).cast("long").alias("c_nationkey"),
    )
    merged = merge_upsert(target, modified.unionByName(inserts), ["c_custkey"])
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("acctbal") * 100).cast("long")).alias("bal_cents"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_group_stats",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
             CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sqq,
             CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sp,
             CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sqp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sq, sp,
           (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_qty,
           (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_qty_price
    FROM s ORDER BY l_returnflag
    """,
    doc="per-group descriptive statistics (population variance + covariance, beyond the reference's Average/Mean): moments accumulated as EXACT int64 sums (bit-reproducible under any partitioning), the float formula evaluated identically on both engines — the scaled-int discipline extended to second moments",
)
def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    q = F.round("l_quantity").cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sqq"),
        F.sum(p).alias("sp"),
        F.sum(q * p).alias("sqp"),
    )
    nd = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sqq = F.col("sqq").cast("double")
    sp = F.col("sp").cast("double")
    sqp = F.col("sqp").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        "sq",
        "sp",
        ((nd * sqq - sq * sq) / (nd * nd)).alias("var_qty"),
        ((nd * sqp - sq * sp) / (nd * nd)).alias("cov_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q_histogram",
    """
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ),
    binned AS (
      SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) AS BIGINT), 19) AS bin
      FROM orders, bounds
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin ORDER BY bin
    """,
    doc="equi-width histogram (data profiling): 20 bins over the observed range — one pass for bounds (2 scalars to the driver-free broadcast), one pass to bin+count; the profiling primitive behind any column-distribution dashboard",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(20.0))
            ).cast("long"),
            F.lit(19).cast("long"),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).orderBy("bin")


@query(
    "q_profile",
    """
    SELECT 'c_acctbal' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(c_acctbal) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_distinct,
           CAST(round(min(c_acctbal)*100) AS BIGINT) AS min_cents,
           CAST(round(max(c_acctbal)*100) AS BIGINT) AS max_cents
    FROM customer
    UNION ALL
    SELECT 'c_nationkey',
           CAST(count(*) AS BIGINT),
           CAST(count(c_nationkey) AS BIGINT),
           CAST(count(DISTINCT c_nationkey) AS BIGINT),
           CAST(min(c_nationkey)*100 AS BIGINT),
           CAST(max(c_nationkey)*100 AS BIGINT)
    FROM customer
    ORDER BY column_name
    """,
    doc="column profiling (data quality): row/non-null/distinct counts + range per column in one agg pass per column — the standard ingest-time profile",
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")

    def profile(col: str, scale: bool) -> DataFrame:
        lo = F.min(col) * 100 if not scale else F.round(F.min(col) * 100)
        hi = F.max(col) * 100 if not scale else F.round(F.max(col) * 100)
        return cust.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            lo.cast("long").alias("min_cents"),
            hi.cast("long").alias("max_cents"),
        ).select(F.lit(col).alias("column_name"), "*")

    return profile("c_acctbal", True).unionByName(
        profile("c_nationkey", False)
    ).orderBy("column_name")
