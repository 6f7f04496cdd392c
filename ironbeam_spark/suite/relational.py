"""Relational coverage: outer joins, semi join, cogroup, group_by_key family,
set ops, rollup, analytic windows, keyed restructuring (SURVEY §2.4-2.6, §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.collection import PCollection, flatten
from ironbeam_spark.functions.exact import cents, sum_long, sum_money
from ironbeam_spark.suite.registry import _t, query


@query(
    "q_join_right",
    """
    SELECT p.p_partkey, p.p_brand,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_items,
           CAST(coalesce(sum(CAST(round(l.l_quantity) AS BIGINT)), 0) AS BIGINT) AS total_qty
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) l
    RIGHT JOIN (SELECT * FROM part WHERE p_size < 10) p
      ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_brand
    ORDER BY p.p_partkey
    """,
    doc="right outer join with real null left side (ref join_right, src/helpers/joins.rs:411)",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter_ge("l_quantity", 45.0)
    part = _t(spark, sf_dir, "part").filter_lt("p_size", 10)
    joined = PCollection(
        li.df.join(part.df, li.df.l_partkey == part.df.p_partkey, "right")
    )
    out = joined.key_by("p_partkey", "p_brand").agg_per_key(
        F.count("l_orderkey").alias("n_items"),
        F.coalesce(F.sum(F.round(F.col("l_quantity")).cast("long")), F.lit(0)).alias("total_qty"),
    )
    return out.df.orderBy("p_partkey")


@query(
    "q_join_full",
    """
    SELECT coalesce(a.p_partkey, b.p_partkey) AS partkey,
           a.n_small AS n_small, b.n_big AS n_big
    FROM (SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_small
          FROM part WHERE p_size < 25 GROUP BY p_partkey) a
    FULL JOIN (SELECT l_partkey AS p_partkey, CAST(count(*) AS BIGINT) AS n_big
               FROM lineitem WHERE l_quantity > 40 GROUP BY l_partkey) b
      ON a.p_partkey = b.p_partkey
    ORDER BY partkey
    """,
    doc="full outer join, nulls on both sides ⇒ Option/Option tuple (ref join_full, src/helpers/joins.rs:543)",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    small = (
        _t(spark, sf_dir, "part")
        .filter_lt("p_size", 25)
        .key_by("p_partkey")
        .count_per_key(alias="n_small")
    )
    big = (
        _t(spark, sf_dir, "lineitem")
        .filter_gt("l_quantity", 40.0)
        .map(p_partkey=F.col("l_partkey"))
        .key_by("p_partkey")
        .count_per_key(alias="n_big")
    )
    out = small.join_full(big, on=["p_partkey"]).df
    return out.select(
        F.col("p_partkey").alias("partkey"), "n_small", "n_big"
    ).orderBy("partkey")


@query(
    "q_join_semi",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
    doc="left-semi join (ref: only internal Bloom semi-join, src/bloom_filter.rs; first-class here)",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    f_orders = (
        _t(spark, sf_dir, "orders")
        .filter_eq("o_orderstatus", "F")
        .map(c_custkey=F.col("o_custkey"))
    )
    return (
        cust.join_semi(f_orders, on=["c_custkey"])
        .df.select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q_cogroup",
    """
    SELECT n.n_nationkey,
           coalesce(array_to_string(c.names, '|'), '') AS customer_names,
           coalesce(array_to_string(s.names, '|'), '') AS supplier_names
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, list_sort(list(c_name)) AS names
               FROM customer GROUP BY c_nationkey) c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT s_nationkey, list_sort(list(s_name)) AS names
               FROM supplier GROUP BY s_nationkey) s ON s.s_nationkey = n.n_nationkey
    ORDER BY n.n_nationkey
    """,
    doc="2-way CoGroupByKey: per-key list per source, absent ⇒ empty list (ref cogroup_by_key!, src/helpers/co_gbk.rs:305); lists '|'-joined for the driver's scalar value-hash",
)
def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").map(
        n_nationkey=F.col("c_nationkey"), c_name=F.col("c_name")
    )
    supp = _t(spark, sf_dir, "supplier").map(
        n_nationkey=F.col("s_nationkey"), s_name=F.col("s_name")
    )
    nations = _t(spark, sf_dir, "nation").map("n_nationkey")
    cg = cust.cogroup([supp], value_cols=[["c_name"], ["s_name"]], on=["n_nationkey"])
    # anchor on the nation dimension so keyless nations appear with empty lists
    out = nations.join_left(cg, on=["n_nationkey"]).df
    for col, alias in [("c_name_list_0", "customer_names"), ("s_name_list_1", "supplier_names")]:
        out = out.withColumn(
            alias,
            F.array_join(F.coalesce(F.col(col), F.array().cast("array<string>")), "|"),
        ).drop(col)
    return out.orderBy("n_nationkey")


@query(
    "q_group_by_key",
    """
    SELECT c_nationkey, array_to_string(list_sort(list(c_name)), '|') AS c_name_list
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="group_by_key → (K, sorted list<V>) (ref src/helpers/keyed.rs:213; ordering per SURVEY §7 item 3); list '|'-joined for the driver's scalar value-hash",
)
def q_group_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").key_by("c_nationkey")
    return (
        cust.group_by_key("c_name")
        .map("c_nationkey", c_name_list=F.array_join("c_name_list", "|"))
        .df.orderBy("c_nationkey")
    )


@query(
    "q_to_set_per_key",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS event_type_set,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="to_set_per_key + distinct_count_per_key (ref src/helpers/collect_values.rs:160, distinct.rs:244); set '|'-joined for the driver's scalar value-hash",
)
def q_to_set_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").key_by("user_id")
    out = ev.agg_per_key(
        F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias("event_type_set"),
        F.countDistinct("event_type").alias("n_types"),
    )
    return out.df.orderBy("user_id")


@query(
    "q_count_per_element",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="count_per_element (ref src/helpers/count.rs:72)",
)
def q_count_per_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.map("event_type").count_per_element("event_type").df.orderBy("event_type")


@query(
    "q_latest_per_key",
    """
    SELECT user_id,
           arg_max(value, ts) AS latest_value,
           epoch_ms(max(ts)) AS latest_ts_ms
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="latest_per_key = max_by(value, ts) (ref Latest combiner, src/combiners/latest.rs:61)",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").key_by("user_id")
    # dtype-aware: ts is TIMESTAMP in current testdata (epoch-millis via
    # unix_millis), int64 nanos under the legacy nanosAsLong read
    if ev.df.schema["ts"].dataType.simpleString() == "bigint":
        latest_ms = F.expr("max(ts) div 1000000")
    else:
        latest_ms = F.unix_millis(F.max("ts"))
    out = ev.agg_per_key(
        F.max_by("value", "ts").alias("latest_value"),
        latest_ms.alias("latest_ts_ms"),
    )
    return out.df.orderBy("user_id")


@query(
    "q_flatten_union",
    """
    SELECT src, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT 'click' AS src, user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'error' AS src, user_id FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT 'purchase' AS src, user_id FROM events WHERE event_type = 'purchase'
    )
    GROUP BY src ORDER BY src
    """,
    doc="flatten: N-way union-all then agg (ref src/helpers/flatten.rs:110)",
)
def q_flatten_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parts = [
        ev.filter_eq("event_type", t).map(src=F.lit(t), user_id=F.col("user_id"))
        for t in ("click", "error", "purchase")
    ]
    return flatten(parts).key_by("src").count_per_key(alias="n").df.orderBy("src")


@query(
    "q_intersect_except",
    """
    WITH big_cust AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000),
         big_supp AS (SELECT s_nationkey AS c_nationkey FROM supplier WHERE s_acctbal > 5000)
    SELECT 'both' AS which, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM big_cust
                                              INTERSECT SELECT DISTINCT c_nationkey FROM big_supp)
    UNION ALL
    SELECT 'cust_only' AS which, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM big_cust
                                                   EXCEPT SELECT DISTINCT c_nationkey FROM big_supp)
    ORDER BY which, c_nationkey
    """,
    doc="intersect / except set ops (free in Spark; absent in reference — SURVEY §2.9)",
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter_gt("c_acctbal", 5000.0)
        .map("c_nationkey")
        .distinct()
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter_gt("s_acctbal", 5000.0)
        .map(c_nationkey=F.col("s_nationkey"))
        .distinct()
    )
    both = cust.intersect(supp).map(which=F.lit("both"), c_nationkey=F.col("c_nationkey"))
    only = cust.except_all(supp).map(
        which=F.lit("cust_only"), c_nationkey=F.col("c_nationkey")
    )
    return both.union_all(only).df.orderBy("which", "c_nationkey")


@query(
    "q_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="rollup hierarchy totals (SURVEY §2.6 'missing vs SQL engines' — free in Spark)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").df
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(sum_long("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q_running_total",
    """
    SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ts,
           sum(CAST(round(o_totalprice*100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
             AS running_revenue
    FROM orders
    ORDER BY o_custkey, order_ts, o_orderkey
    """,
    bench=True,
    doc="analytic window: exact running revenue per customer (beyond reference — no SQL window fns in ironbeam, SURVEY §2.7)",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders").df
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("order_ts"),
            (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias("running_revenue"),
        )
        .orderBy("o_custkey", "order_ts", "o_orderkey")
    )


@query(
    "q_keyed_restructure",
    """
    SELECT c_nationkey,
           sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0 AS sum_bal,
           CAST(count(*) AS BIGINT) AS n_cust,
           min(c_name) AS first_name
    FROM (SELECT c_nationkey, c_acctbal, c_name FROM customer WHERE c_acctbal >= 0)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="key_by → filter_values → map_values → agg composition (ref keyed.rs:45, values.rs:67,105)",
)
def q_keyed_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").key_by("c_nationkey")
    out = (
        cust.filter_values(F.col("c_acctbal") >= 0)
        .map_values(c_acctbal=F.col("c_acctbal"), c_name=F.col("c_name"))
        .agg_per_key(
            sum_money("c_acctbal", "sum_bal"),
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_name").alias("first_name"),
        )
    )
    return out.df.orderBy("c_nationkey")


@query(
    "q_multi_join_revenue",
    """
    SELECT n.n_name, r.r_name,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100) AS BIGINT)))/10000.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY revenue DESC, n_name
    """,
    bench=True,
    doc="star-schema 4-way join, dims broadcast (TPC-H Q5 shape; ref chains of join_inner)",
)
def q_multi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ironbeam_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(read_table(spark, sf_dir, "nation"))
    reg = F.broadcast(read_table(spark, sf_dir, "region"))
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
    )
    out = joined.groupBy("n_name", "r_name").agg(
        (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))) / F.lit(10000.0)).alias(
            "revenue"
        )
    )
    return out.orderBy(F.col("revenue").desc(), "n_name")
