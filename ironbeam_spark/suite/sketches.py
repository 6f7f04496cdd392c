"""Sketch & grouping depth: faithful KMV distinct-count (deterministic, so it
gets an exact oracle — unlike HLL), exact interpolated quantiles, 3-way
CoGroupByKey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.functions.text import token_int
from ironbeam_spark.sources.io import read_table
from ironbeam_spark.suite.registry import _t, query

_TWO48 = 281474976710656  # 2^48: token_int's hash domain


@query(
    "q_kmv_distinct",
    f"""
    WITH hashes AS (
      SELECT DISTINCT ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,12))::BIGINT AS h
      FROM lineitem
    ),
    kmin AS (SELECT h FROM hashes ORDER BY h LIMIT 256),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS r_k FROM kmin)
    SELECT n AS k_seen,
           CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                ELSE (256-1) * {_TWO48}.0 / r_k END AS kmv_estimate
    FROM stats
    """,
    doc="KMV approx-distinct, faithful to the reference's sketch (estimate (k-1)/r_k, exact below k — src/combiners/distinct.rs:105-228); deterministic md5 hashing ⇒ exact SQL oracle, and the k-smallest set comes from distinct+TakeOrdered (never collects all hashes)",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 256
    li = read_table(spark, sf_dir, "lineitem")
    # scale path: shuffle-distinct the hashes, then TakeOrdered k — the
    # "k minimum values" never exceed k rows anywhere
    kmin = (
        li.select(token_int(F.col("l_partkey").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return kmin.agg(
        F.count(F.lit(1)).alias("k_seen"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(float(_TWO48)) / F.max("h"))
        .alias("kmv_estimate"),
    )


@query(
    "q_quantiles_exact",
    """
    SELECT quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           quantile_cont(l_quantity, 0.99) AS q99
    FROM lineitem
    """,
    doc="exact interpolated quantiles (both engines: continuous/linear interpolation) — the exact-oracle counterpart of q_approx_quantiles (ref ApproxQuantiles, src/combiners/quantiles.rs:34)",
)
def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.percentile("l_quantity", F.lit(0.99)).alias("q99"),
    )


@query(
    "q_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    doc="CUBE grouping sets (SURVEY §2.6 'missing vs SQL engines' — free in Spark, absent in reference)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "q_median_per_key",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="exact median per key (ref approx_median_per_key, src/helpers/statistical.rs:127 — here exact, interpolation matching quantile_cont)",
)
def q_median_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_cogroup3",
    """
    SELECT n.n_nationkey,
           coalesce(array_to_string(c.names, '|'), '') AS customer_names,
           coalesce(array_to_string(s.names, '|'), '') AS supplier_names,
           coalesce(array_to_string(r.names, '|'), '') AS rich_customer_names
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, list_sort(list(c_name)) AS names
               FROM customer GROUP BY c_nationkey) c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT s_nationkey, list_sort(list(s_name)) AS names
               FROM supplier GROUP BY s_nationkey) s ON s.s_nationkey = n.n_nationkey
    LEFT JOIN (SELECT c_nationkey, list_sort(list(c_name)) AS names
               FROM customer WHERE c_acctbal > 7500 GROUP BY c_nationkey) r
           ON r.c_nationkey = n.n_nationkey
    ORDER BY n.n_nationkey
    """,
    doc="3-way CoGroupByKey (ref cogroup_by_key! supports 2..10 sources, src/helpers/co_gbk.rs:305): per-source list columns, absent ⇒ empty list",
)
def q_cogroup3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").map(
        n_nationkey=F.col("c_nationkey"), c_name=F.col("c_name")
    )
    supp = _t(spark, sf_dir, "supplier").map(
        n_nationkey=F.col("s_nationkey"), s_name=F.col("s_name")
    )
    rich = _t(spark, sf_dir, "customer").filter_gt("c_acctbal", 7500.0).map(
        n_nationkey=F.col("c_nationkey"), r_name=F.col("c_name")
    )
    nation = _t(spark, sf_dir, "nation").map("n_nationkey")
    grouped = cust.key_by("n_nationkey").cogroup(
        [supp, rich], [["c_name"], ["s_name"], ["r_name"]], on=["n_nationkey"]
    )
    # right-join to nation so key-less nations still appear (full-outer shape)
    out = nation.df.join(grouped.df, on="n_nationkey", how="left")
    for col, alias in [
        ("c_name_list_0", "customer_names"),
        ("s_name_list_1", "supplier_names"),
        ("r_name_list_2", "rich_customer_names"),
    ]:
        out = out.withColumn(
            alias,
            F.array_join(F.coalesce(F.col(col), F.array().cast("array<string>")), "|"),
        ).drop(col)
    return out.select(
        "n_nationkey", "customer_names", "supplier_names", "rich_customer_names"
    ).orderBy("n_nationkey")


@query(
    "q_cms_counts",
    # The oracle rebuilds the IDENTICAL sketch (same md5 bucket hashing,
    # same depth x width grid, same min-over-rows estimate) - it verifies
    # the sketch itself, not just a property band.
    """
    WITH words AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    ds AS (SELECT unnest(generate_series(0, 3)) AS d),
    sketch AS (
      SELECT d,
             ('0x'||substr(md5(CAST(d AS VARCHAR)||'|'||w),1,12))::BIGINT % 512 AS b,
             count(*) AS c
      FROM words, ds
      GROUP BY d, b
    ),
    keys AS (
      SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS item
      FROM documents WHERE doc_id = 0
    ),
    kb AS (
      SELECT item, d,
             ('0x'||substr(md5(CAST(d AS VARCHAR)||'|'||item),1,12))::BIGINT % 512 AS b
      FROM keys, ds
    )
    SELECT item, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
    FROM kb LEFT JOIN sketch USING (d, b)
    GROUP BY item
    ORDER BY item
    """,
    doc="Count-Min Sketch word-frequency estimates (Cormode-Muthukrishnan): stream explodes into a FIXED depth x width bucket grid (never a row per distinct item - the billion-key-domain survivor), query keys broadcast-join the sketch and take min over rows; deterministic md5 buckets mean the oracle rebuilds the exact same sketch (operators/frequency.cms_estimates)",
)
def q_cms_counts(spark, sf_dir):
    from ironbeam_spark.functions.text import tokens
    from ironbeam_spark.operators.frequency import cms_estimates

    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("item"))
    keys = docs.where(F.col("doc_id") == 0).select(
        F.explode(tokens("text")).alias("item")
    )
    return cms_estimates(words, "item", keys, depth=4, width=512).orderBy("item")


@query(
    "q_kmv_setops",
    # KMV sketch algebra (public estimators: Beyer et al., SIGMOD 2007 —
    # distinct-value synopses under multiset operations): per-segment
    # k-min sketches, union sketch = k smallest of the merged k-min sets
    # (valid because kmin_k(A ∪ B) ⊆ kmin_k(A) ∪ kmin_k(B)), Jaccard
    # estimator rho = |union-sketch ∩ A-sketch ∩ B-sketch| / |union
    # sketch|, intersection estimate = rho × union estimate.  All
    # arithmetic is count ratios + one division — deterministic md5
    # hashing makes the whole thing exact-oracle-checkable.
    f"""
    WITH ha AS (SELECT DISTINCT ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,12))::BIGINT AS h
                FROM lineitem WHERE l_returnflag = 'R'),
    hb AS (SELECT DISTINCT ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,12))::BIGINT AS h
           FROM lineitem WHERE l_returnflag = 'A'),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
    ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
           ORDER BY h LIMIT 256),
    sa AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS r FROM ka),
    sb AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS r FROM kb),
    su AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS r FROM ku),
    m AS (SELECT CAST(count(*) AS BIGINT) AS matches FROM ku
          WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
    est AS (
      SELECT sa.n AS k_a,
             CASE WHEN sa.n < 256 THEN CAST(sa.n AS DOUBLE)
                  ELSE (256-1) * {_TWO48}.0 / sa.r END AS est_a,
             sb.n AS k_b,
             CASE WHEN sb.n < 256 THEN CAST(sb.n AS DOUBLE)
                  ELSE (256-1) * {_TWO48}.0 / sb.r END AS est_b,
             su.n AS k_union,
             CASE WHEN su.n < 256 THEN CAST(su.n AS DOUBLE)
                  ELSE (256-1) * {_TWO48}.0 / su.r END AS est_union,
             m.matches AS matches
      FROM sa, sb, su, m
    )
    SELECT k_a, est_a, k_b, est_b, k_union, est_union,
           CASE WHEN k_union = 0 THEN 0.0
                ELSE CAST(matches AS DOUBLE) / k_union END AS jaccard_est,
           CASE WHEN k_union = 0 THEN 0.0
                ELSE CAST(matches AS DOUBLE) / k_union * est_union END
             AS est_intersect
    FROM est
    """,
    doc="KMV sketch set operations (Beyer et al. 2007): per-segment k-min sketches merge into a union sketch (k smallest of the merged sets — the mergeability that makes KMV distributable), Jaccard estimator from sketch membership, intersection estimate = rho x union estimate; deterministic hashing => exact oracle (north-star sketches)",
)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 256
    li = read_table(spark, sf_dir, "lineitem")

    def kmin(flag: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(token_int(F.col("l_partkey").cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    ka, kb = kmin("R"), kmin("A")
    ku = ka.union(kb).distinct().orderBy("h").limit(k)

    def stats(df: DataFrame, n_col: str, est_col: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(n_col),
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(float(_TWO48)) / F.max("h"))
            .alias(est_col),
        )
    matches = (
        ku.join(ka, on="h", how="left_semi")
        .join(kb, on="h", how="left_semi")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    out = (
        stats(ka, "k_a", "est_a")
        .crossJoin(stats(kb, "k_b", "est_b"))
        .crossJoin(stats(ku, "k_union", "est_union"))
        .crossJoin(matches)
    )
    return out.select(
        "k_a", "est_a", "k_b", "est_b", "k_union", "est_union",
        F.when(F.col("k_union") == 0, F.lit(0.0))
        .otherwise(F.col("matches").cast("double") / F.col("k_union"))
        .alias("jaccard_est"),
        F.when(F.col("k_union") == 0, F.lit(0.0))
        .otherwise(
            F.col("matches").cast("double") / F.col("k_union") * F.col("est_union")
        )
        .alias("est_intersect"),
    )


# -- distributed PCA, exact-gram pass (round 6): operators/pca.py -----------


@query(
    "q_pca_gram",
    # the 100 TB-touching part of PCA is the gram/mean accumulation — and
    # quantized to int64 by floor(x*2^20 + 0.5) (the one rounding rule
    # numpy and DuckDB mirror exactly) it is order-free and exact, so the
    # whole upper triangle hash-matches; a float gram re-associates per
    # plan and never could
    """
    WITH q AS (SELECT list_transform(embedding,
                 x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)) AS qv
               FROM embeddings),
    cells AS (
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             CAST(sum(qv[i] * qv[j]) AS BIGINT) AS s
      FROM q, unnest(generate_series(1, 64)) AS u(i),
           unnest(generate_series(1, 64)) AS v(j)
      WHERE j >= i GROUP BY i, j
    ),
    means AS (SELECT CAST(i AS INT) AS i, 0 AS j,
                     CAST(sum(qv[i]) AS BIGINT) AS s
              FROM q, unnest(generate_series(1, 64)) AS u(i) GROUP BY i),
    cnt AS (SELECT 0 AS i, 0 AS j, CAST(count(*) AS BIGINT) AS s FROM q)
    SELECT * FROM cells
    UNION ALL SELECT * FROM means
    UNION ALL SELECT * FROM cnt
    ORDER BY i, j
    """,
    doc="distributed PCA, exact-gram formulation (operators/pca): per-Arrow-batch int64 q^T q partials (|q| <= 2^20 keeps products exact) summed in DECIMAL(38) — commutative and partition-invariant, d^2 cells per batch of shuffle (metadata-sized); the d x d decomposition itself is a bounded driver step (numpy eigh over the exact gram, sign-pinned), projection is a row-local Arrow matmul; this query pins the full exact upper triangle + mean sums + count over the embeddings table",
)
def q_pca_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ironbeam_spark.operators.pca import scaled_gram

    emb = read_table(spark, sf_dir, "embeddings")
    # the operator keeps DECIMAL(38,0) totals (exact at 100 TB); the gate
    # grain is bench-scale, where int64 is exact and matches the oracle's
    # BIGINT cast
    return scaled_gram(emb, "embedding", 64).withColumn(
        "s", F.col("s").cast("long")
    )
