"""Upsert / merge-into for parquet tables (no lakehouse dependency).

Plain Spark has no ``MERGE INTO`` without Delta/Iceberg; the portable
pattern is read → full-outer join on the key → pick-per-row → rewrite.
That IS how a merge executes underneath a lakehouse too — the table formats
add snapshot isolation and file-level pruning, not different join math.

Scale notes: the join shuffles both sides on the merge key once; with the
target laid out via ``sources/bucketing.write_bucketed`` the target side
needs NO shuffle (bucket-join), and with hive partitioning only affected
partitions need rewriting (dynamic partition overwrite) — both existing
levers in this repo compose with this operator.  The rewrite itself is the
unavoidable cost of immutable files; lakehouse MERGE pays it too.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE semantics: rows matched on ``keys`` take the update's values
    (whole-row replace, so update NULLs overwrite), unmatched update rows
    are inserted, unmatched target rows are kept.  Join keys must be
    non-null in both inputs (merge contract).  Both inputs must share a
    schema; returns the merged DataFrame (lazy) — callers write it where
    they want."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert requires matching schemas: {target.columns} vs {updates.columns}"
        )
    key_list = list(keys)
    non_keys = [c for c in target.columns if c not in key_list]
    u = updates.select([F.col(c).alias(f"_u_{c}") for c in updates.columns])
    cond = reduce(
        lambda a, b: a & b, [target[k] == u[f"_u_{k}"] for k in key_list]
    )
    joined = target.join(u, cond, "full_outer")
    # keys are never null by contract, so a non-null update-side key marks
    # every matched-or-insert row
    u_present = F.col(f"_u_{key_list[0]}").isNotNull()
    out = [F.coalesce(F.col(f"_u_{k}"), F.col(k)).alias(k) for k in key_list]
    out += [
        F.when(u_present, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
        for c in non_keys
    ]
    return joined.select(*out).select(*target.columns)
