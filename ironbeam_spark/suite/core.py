"""Core queries: aggregation, element-wise, joins, top-k, distinct (SURVEY §2.2-2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.collection import PCollection
from ironbeam_spark.functions.exact import avg_money, cents, sum_long, sum_money
from ironbeam_spark.functions.time import ts_lit
from ironbeam_spark.sources.io import read_table
from ironbeam_spark.suite.registry import _t, query

# =========================================================================
# Aggregation core (SURVEY §2.6) — flagship: TPC-H Q1 pricing summary
# =========================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))
               * (100 + CAST(round(l_tax*100) AS BIGINT)))/1000000.0 AS sum_charge,
           sum(CAST(round(l_quantity) AS BIGINT)) / CAST(count(*) AS DOUBLE) AS avg_qty,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)) / (100.0*count(*)) AS avg_price,
           sum(CAST(round(l_discount*100) AS BIGINT)) / (100.0*count(*)) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="filter → groupBy → 8 exact aggregates (ref combine_values, src/helpers/combine.rs:66)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    out = (
        li.filter(F.col("l_shipdate") <= ts_lit("1998-09-02"))
        .key_by("l_returnflag", "l_linestatus")
        .agg_per_key(
            sum_long("l_quantity", "sum_qty"),
            sum_money("l_extendedprice", "sum_base_price"),
            (F.sum(price_c * (100 - disc_c)) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(F.round(F.col("l_quantity")).cast("long")) / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
            avg_money("l_extendedprice", "avg_price"),
            avg_money("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.df.orderBy("l_returnflag", "l_linestatus")


@query(
    "q_global_agg",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)) / (100.0*count(*)) AS avg_price
    FROM lineitem
    """,
    doc="combine_globally: sum/min/max/avg/count in one global agg (ref src/helpers/combine_global.rs:50)",
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg_global(
        F.count(F.lit(1)).alias("n_rows"),
        sum_long("l_quantity", "total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        avg_money("l_extendedprice", "avg_price"),
    ).df


# =========================================================================
# Element-wise + predicates (SURVEY §2.2, §2.3)
# =========================================================================


@query(
    "q_filter_map_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS disc_price
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity < 20 AND l_returnflag = 'R'
    """,
    doc="map + filter_range + filter_eq fused projection (ref src/helpers/common.rs:44, filter.rs:224)",
)
def q_filter_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter_range("l_quantity", 10.0, 20.0)
        .filter_eq("l_returnflag", "R")
        .map(
            "l_orderkey",
            "l_linenumber",
            disc_price=(cents("l_extendedprice") * (100 - cents("l_discount")) / F.lit(10000.0)),
        )
        .df
    )


@query(
    "q_flat_map_tokens",
    """
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
    bench=True,
    doc="canonical word count: flat_map → key_by → count_per_key (ref src/lib.rs:30-51)",
)
def q_flat_map_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = (
        docs.flat_map(F.split(F.col("text"), " "), alias="word")
        .filter(F.col("word") != "")
        .key_by("word")
        .count_per_key(alias="cnt")
    )
    return out.df.orderBy(F.col("cnt").desc(), "word").limit(20)


# =========================================================================
# Joins (SURVEY §2.5)
# =========================================================================


@query(
    "q_join_inner",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o.o_totalprice*100) AS BIGINT))/100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
    bench=True,
    doc="inner equi-join + agg (ref join_inner, src/helpers/joins.rs:148); broadcast-able dim side",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").key_by(o_custkey=F.col("o_custkey"))
    cust = PCollection(F.broadcast(read_table(spark, sf_dir, "customer")), ("c_custkey",))
    joined = PCollection(
        orders.df.join(cust.df, orders.df.o_custkey == cust.df.c_custkey, "inner")
    )
    out = joined.key_by("c_mktsegment").agg_per_key(
        F.count(F.lit(1)).alias("n_orders"),
        sum_money("o_totalprice", "revenue"),
    )
    return out.df.orderBy("c_mktsegment")


@query(
    "q_join_left_nulls",
    """
    SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
    doc="left outer join, Option<W> ⇒ nullable right (ref join_left, src/helpers/joins.rs:281)",
)
def q_join_left_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").key_by("c_custkey")
    orders = _t(spark, sf_dir, "orders")
    joined = PCollection(
        cust.df.join(orders.df, cust.df.c_custkey == orders.df.o_custkey, "left"),
        ("c_custkey",),
    )
    out = joined.key_by("c_custkey", "c_name").agg_per_key(
        F.count("o_orderkey").alias("n_orders")
    )
    return out.df.orderBy("c_custkey")


@query(
    "q_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="left-anti join: customers without orders (free in Spark; ref has only internal Bloom semi-join)",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").map(c_custkey=F.col("o_custkey"))
    return cust.join_anti(orders, on=["c_custkey"]).df.select("c_custkey", "c_name").orderBy("c_custkey")


# =========================================================================
# Top-k / limits (SURVEY §2.8)
# =========================================================================


@query(
    "q_top_k_global",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="top_k_globally via TakeOrderedAndProject (ref src/helpers/topk.rs:69)",
)
def q_top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.top_k_globally(10, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .df.select("o_orderkey", "o_totalprice")
    )


@query(
    "q_top_k_per_key",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="top_k_per_key via window row_number ≤ k (ref src/helpers/topk.rs:122)",
)
def q_top_k_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").key_by("o_custkey")
    out = orders.top_k_per_key(2, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return out.df.select("o_custkey", "o_orderkey", "o_totalprice").orderBy(
        "o_custkey", F.col("o_totalprice").desc(), "o_orderkey"
    )


# =========================================================================
# Distinct family (SURVEY §2.6 distinct)
# =========================================================================


@query(
    "q_distinct_exact",
    """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps
    FROM lineitem
    """,
    doc="exact distinct_count_globally (ref DistinctCount, src/combiners/distinct.rs:21)",
)
def q_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg_global(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    ).df


@query(
    "q_distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="distinct() global dedupe (ref src/helpers/distinct.rs:69)",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.map("l_returnflag", "l_linestatus").distinct().df.orderBy(
        "l_returnflag", "l_linestatus"
    )
