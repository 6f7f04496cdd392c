"""Scale/parallelism helpers.

``ensure_min_parallelism`` fixes the "small file, heavy expression" shape:
a single-file parquet scan yields one input split, so an expensive map-side
expression chain (minhash signatures, simhash bit votes, n-gram explosion)
runs on one core no matter how many executors exist.  At 100 TB the scan has
thousands of splits and this is a no-op; on small inputs it inserts one
round-robin exchange so the expensive projection parallelizes.

This mirrors the reference's explicit ``reshuffle()`` barrier
(``src/helpers/reshuffle.rs:75``, "analogous to repartition() in Apache
Spark") applied for the same reason: redistribute before expensive work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism iff the
    plan currently has fewer partitions; otherwise return ``df`` unchanged.

    Call this immediately before a compute-heavy narrow stage (per-row
    hashing, shingling, vector math).  Never call it on an already-wide plan:
    the partition check makes it free there.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions if min_partitions is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
