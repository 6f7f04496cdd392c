"""Bucketed tables: shuffle-free co-located joins.

The 100 TB lever the session configs can't give you: two fact tables bucketed
by the same key into the same bucket count join WITHOUT a shuffle — each
bucket pair joins locally.  For a pipeline that repeatedly joins on one key
(orders ⋈ lineitem every run), paying one bucketed write amortizes the
exchange out of every later query.

Spark requires bucketed data to live in the session catalog
(``saveAsTable``, not plain ``save``), so these helpers wrap table-backed
writes.  ``spark.sql.sources.bucketing.enabled`` is on by default; plan
verification = no ``Exchange`` above the scans (asserted in
``tests/test_scale.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans with zero
    exchanges when both sides were bucketed identically."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
