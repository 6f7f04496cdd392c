"""Equi-width histograms in exact integer arithmetic.

The profiling companion of ``operators/profile.py`` (Deequ's
``Histogram`` analyzer — public tool; no reference analogue): bucket a
numeric column into ``n`` equal-width bins and count, with every boundary
decision made in scaled int64 arithmetic so the result is bit-exact
cross-engine — float bin assignment (``floor((x-lo)/width)``) puts
boundary values in different bins per engine/rounding mode, which is why
float histograms never hash-match.

Bucketing rule (``scale`` = cents by default):

    bucket(x) = clamp( (cents(x) - lo) * n  div  (hi - lo), 0, n-1 )

i.e. bin edges at ``lo + i*(hi-lo)/n`` without ever computing a float
edge; the top edge is inclusive (``x == hi`` lands in bin ``n-1``), values
outside ``[lo, hi]`` clamp into the end bins (the SQL ``width_bucket``
over/underflow convention folded into the edge bins, documented).

Scale shape: ONE map-side-combinable groupBy on the bucket id (at most
``n`` groups — the shuffle is bounded by the histogram size, not the
data), then a broadcast-range join fills empty buckets so the output is
always exactly ``n`` deterministic rows.  Bounds default to the column's
observed min/max via one bounded 1-row aggregate broadcast back (the BM25
stats-row pattern) — pass explicit ``lo``/``hi`` to skip that pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["equi_width_histogram"]


def equi_width_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int,
    lo: int | None = None,
    hi: int | None = None,
    scale: int = 100,
) -> DataFrame:
    """``(bucket, lo_cents, hi_cents, n)`` — exactly ``n_buckets`` rows.

    ``lo``/``hi`` are scaled ints (cents); when omitted they come from the
    column's min/max.  Degenerate span (``lo == hi``) puts every row in
    bucket 0.  NULLs are not counted."""
    if n_buckets <= 0:
        raise ValueError("equi_width_histogram: n_buckets must be positive")
    spark = df.sparkSession
    cents = F.round(F.col(col) * F.lit(scale)).cast("long")
    vals = df.where(F.col(col).isNotNull()).select(cents.alias("_x"))

    if lo is None or hi is None:
        bounds = vals.agg(
            F.min("_x").alias("_lo"), F.max("_x").alias("_hi")
        )
    else:
        bounds = spark.range(1).select(
            F.lit(int(lo)).alias("_lo"), F.lit(int(hi)).alias("_hi")
        )
    staged = vals.crossJoin(F.broadcast(bounds))
    span = F.col("_hi") - F.col("_lo")
    raw = F.expr(f"(_x - _lo) * {n_buckets} div greatest(_hi - _lo, 1L)")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), raw))
    )
    counts = (
        staged.select(bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "bucket",
            (
                F.col("_lo")
                + F.expr(f"bucket * (_hi - _lo) div {n_buckets}")
            ).alias("lo_cents"),
            (
                F.col("_lo")
                + F.expr(f"(bucket + 1) * (_hi - _lo) div {n_buckets}")
            ).alias("hi_cents"),
        )
    )
    return (
        grid.join(counts, on="bucket", how="left")
        .select(
            "bucket",
            "lo_cents",
            "hi_cents",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bucket")
    )
