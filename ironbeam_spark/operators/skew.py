"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions.  Salting is the *plan-level* tool for the
cases AQE can't fix — e.g. a broadcast-ineligible medium dimension joined on
a power-law key, or a per-key aggregate where one key holds 10% of 100 TB:

- ``salted_join``: explode the small side K ways (one copy per salt), salt
  the big side randomly-but-deterministically (hash of a unique column), join
  on (key, salt).  The hot key's rows spread over K tasks instead of one.
- ``salted_agg``: two-phase aggregate — partial by (key, salt), final by key.
  Only valid for associative+commutative aggregates (the reference's
  assoc-comm CombineFn declaration, ``src/collection.rs:343-360``).

No RNG: salts derive from a hash of a caller-named unique column, so results
are reproducible and the same pipeline is re-runnable (same discipline as
operators/sampling.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_agg"]


def _salt_of(unique_col: str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): stable hash of a unique column."""
    return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int,
    big_unique_col: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys: ``small`` is exploded
    ``buckets``× (one row per salt), ``big`` gets a deterministic salt, and
    the join key becomes (key..., salt) — a hot key's rows land on
    ``buckets`` different reducers.

    Cost model: small side payload × buckets extra shuffle/broadcast volume
    buys hot-key parallelism on the big side.  Use only when the skewed side
    is the big one and AQE skew-split isn't available (e.g. the join already
    ended up sort-merge on a non-splittable stage)."""
    salted_big = big.withColumn("_salt", _salt_of(big_unique_col, buckets))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    out = salted_big.join(salted_small, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    buckets: int,
    unique_col: str,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys..., salt) computes
    ``partial_aggs``, then groupBy(keys) computes ``final_aggs`` over the
    partials.  ``final_aggs`` must reference the partial aliases (e.g.
    partial ``sum(x) AS s`` → final ``sum(s) AS s``).  Valid only for
    assoc+comm aggregates."""
    salted = df.withColumn("_salt", _salt_of(unique_col, buckets))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
