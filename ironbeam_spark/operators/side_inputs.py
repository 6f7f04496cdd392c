"""Broadcast side inputs (reference ``src/helpers/side_inputs.rs``).

The reference broadcasts a Vec / HashMap / singleton / multimap alongside the
main collection and exposes ``map_with_side*`` / ``filter_with_side*``
(``src/helpers/side_inputs.rs:100-388``).  Spark's idioms, in preference
order:

- driver-literal map/list → ``create_map`` / ``isin`` (pure codegen, no
  shuffle, no broadcast machinery needed);
- side DataFrame → ``F.broadcast`` hash join (the 100 TB path: the small
  side ships once per executor, the big side never moves);
- multimap → pre-aggregate the side to ``key → sort_array(collect_list)``
  (keeps the join 1:1 — no row multiplication), then broadcast join.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_side_map",
    "with_side_multimap",
    "with_singleton",
    "filter_with_side",
]


def with_side_map(
    df: DataFrame, mapping: Mapping[Any, Any], key_col: str, out_col: str
) -> DataFrame:
    """Reference ``map_with_side_map`` (``src/helpers/side_inputs.rs:235``):
    O(1) lookup of a small driver-side dict.  Compiled as a literal
    ``create_map`` expression — evaluated in codegen, nothing is shuffled."""
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return df.withColumn(out_col, m[F.col(key_col)])


def with_side_multimap(
    df: DataFrame,
    side: DataFrame,
    on: str,
    side_key: str,
    collect_col: str,
    out_col: str,
) -> DataFrame:
    """Reference ``map_with_side_multimap`` (``src/helpers/side_inputs.rs:355``):
    attach the full (sorted) list of side values for the row's key.  The side
    is pre-aggregated to one row per key *before* the broadcast, so the join
    never multiplies rows and the broadcast payload is minimal."""
    mm = side.groupBy(F.col(side_key).alias(on)).agg(
        F.sort_array(F.collect_list(collect_col)).alias(out_col)
    )
    return df.join(F.broadcast(mm), on=on, how="left")


def with_singleton(df: DataFrame, value: Any, name: str) -> DataFrame:
    """Reference ``map_with_singleton`` (``src/helpers/side_inputs.rs:293``)."""
    return df.withColumn(name, F.lit(value))


def filter_with_side(
    df: DataFrame, values: Sequence[Any] | Column, key_col: str, keep: bool = True
) -> DataFrame:
    """Reference ``filter_with_side`` (``src/helpers/side_inputs.rs:124``):
    membership filter against a small broadcast collection (``isin`` literal
    set → semi-join semantics in codegen)."""
    cond = F.col(key_col).isin(list(values))
    return df.filter(cond if keep else ~cond)
