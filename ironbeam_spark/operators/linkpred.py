"""Link prediction features: common-neighbor counts and neighborhood
Jaccard for candidate pairs (Liben-Nowell & Kleinberg, "The Link
Prediction Problem for Social Networks", CIKM 2003 — public paper).

No reference analogue; extends the graph family (components, PageRank,
triangles, clustering) with the RECOMMENDATION primitive: "which node
pairs are likely related but not yet linked" — in a corpus context,
which sources/tags/entities co-occur indirectly (shared neighbors)
without ever co-occurring directly.

Scale shape: candidate pairs are generated ONLY through shared neighbors
(a center-keyed self-join of adjacency rows — never an all-pairs
product), counted with ONE combinable aggregate, and scored with a
single-division Jaccard so the value oracle stays exact.  The inherent
cost is Σ_v C(deg(v), 2): a hub with 10^6 neighbors would alone emit
5·10^11 pairs, so ``max_degree`` is the explicit fail-fast guard (the
same discipline as ``max_basket_items`` in A-priori and ``max_df`` in
winnowing) — the job RAISES on a hub instead of silently melting a task;
callers cap or pre-filter hubs deliberately (a million-degree common
neighbor carries no signal anyway, which is why Adamic-Adar downweights
high degree)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironbeam_spark.operators.triangles import materialized_edges

__all__ = ["common_neighbors_join"]


def common_neighbors_join(
    df: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
    checkpoint_policy=None,
) -> DataFrame:
    """All pairs ``(node1 < node2)`` sharing at least ``min_common``
    neighbors: ``(node1, node2, common, degree1, degree2, jaccard,
    ra_micro)`` where ``jaccard = common / (degree1 + degree2 - common)``
    (neighborhood overlap) and ``ra_micro`` is the resource-allocation
    index Σ 1/deg(shared neighbor) in exact integer micro-units — RA
    downweights hub-mediated connections, the reason it beats raw counts
    on real graphs.  A direct edge between the pair is allowed and does
    not count toward ``common``."""
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    # the edge set feeds SEVEN subtrees (two union branches of nbrs, the
    # degree aggregate, the guard join, both sides of the wedge self-join,
    # and the two final degree joins) — policy-checkpoint it once so the
    # upstream edge construction never replays per subtree (the
    # triangle_count convention)
    edges = materialized_edges(df, src_col, dst_col, checkpoint_policy)
    nbrs = edges.select(
        F.col("a").alias("c"), F.col("b").alias("n")
    ).unionAll(edges.select(F.col("b").alias("c"), F.col("a").alias("n")))
    deg = nbrs.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        centers = nbrs.join(deg, on="c").where(
            F.when(F.col("deg") <= max_degree, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"common_neighbors_join: hub exceeds "
                            f"max_degree={max_degree} (quadratic guard): node "
                        ),
                        F.col("c").cast("string"),
                    )
                )
            )
        ).drop("deg")
    else:
        centers = nbrs
    # resource-allocation index (Zhou/Lü/Zhang, EPJ B 2009 — public paper):
    # RA(a,b) = Σ_{c ∈ common} 1/deg(c), in micro-units via INTEGER div so
    # the per-pair sum is order-free and bit-exact cross-engine (a float
    # 1/deg sum would depend on aggregation order)
    wedge = centers.join(deg, on="c").withColumn(
        "_ra", F.expr("1000000 div deg")
    )
    x = wedge.alias("x")
    y = wedge.alias("y")
    common = (
        x.join(
            y, (F.col("x.c") == F.col("y.c")) & (F.col("x.n") < F.col("y.n"))
        )
        .select(
            F.col("x.n").alias("node1"),
            F.col("y.n").alias("node2"),
            F.col("x._ra").alias("_ra"),
        )
        .groupBy("node1", "node2")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("_ra").cast("long").alias("ra_micro"),
        )
        .where(F.col("common") >= min_common)
    )
    d1 = deg.select(F.col("c").alias("node1"), F.col("deg").alias("degree1"))
    d2 = deg.select(F.col("c").alias("node2"), F.col("deg").alias("degree2"))
    return (
        common.join(d1, on="node1")
        .join(d2, on="node2")
        .select(
            "node1",
            "node2",
            F.col("common").cast("long").alias("common"),
            F.col("degree1").cast("long").alias("degree1"),
            F.col("degree2").cast("long").alias("degree2"),
            (
                F.col("common").cast("double")
                / (F.col("degree1") + F.col("degree2") - F.col("common")).cast(
                    "double"
                )
            ).alias("jaccard"),
            F.col("ra_micro"),
        )
    )
