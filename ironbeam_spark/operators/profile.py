"""Single-pass table profiling (Deequ-style data-quality statistics).

The column-statistics pass every ingestion pipeline runs before trusting a
new data drop (the shape popularized by AWS Deequ / Great Expectations —
public tools; the reference has per-query ``Validate`` rules,
src/operators/validate.rs, but no whole-table profiler): for every column,
null count, exact distinct count, and typed min/max, emitted as a tall
``(col_name, metric, value_long, value_double, value_str)`` table.

Scale shape: ONE aggregation job over the table produces a single row
holding every metric (Spark compiles the multi-``count(distinct)`` into
one Expand + two-phase aggregate — one logical pass over the data, no
per-column jobs), then the tall output is an ``explode`` of that one row —
driver never sees the data.  At 100 TB the Expand multiplies the shuffle
by the distinct-column count; pass ``distinct="approx"`` to switch to
``approx_count_distinct`` sketches (one ordinary aggregate, no Expand) or
``distinct="none"`` to skip — the exact mode is the oracle-verifiable
default, the approx mode is the scale default, and the choice is the
caller's documented trade.

Typed values, never stringified numbers: doubles go in ``value_double``
and integers/timestamps (epoch micros)/dates (epoch days) in
``value_long`` — cross-engine float-to-string formatting is not a stable
contract, raw doubles are.  Columns without a typed slot — complex types
(arrays, maps, structs) and types with no exact long/double embedding
(decimal, binary) — report null counts only; cast decimals to a scaled
long (cents) upstream to profile them fully.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _slots(col: str, dt: str) -> tuple[Column, Column] | None:
    """(min_expr, max_expr) landing in the right typed slot, or None for
    complex types."""
    c = F.col(col)
    if dt in _INTEGRAL:
        return c.cast("long"), c.cast("long")
    if dt in ("float", "double"):
        return c.cast("double"), c.cast("double")
    if dt == "string":
        return c, c
    if dt == "timestamp":
        return F.unix_micros(c), F.unix_micros(c)
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast(
            "long"
        ), F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
    if dt == "boolean":
        return c.cast("long"), c.cast("long")
    return None


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    distinct: str = "exact",
) -> DataFrame:
    """Tall profile of ``cols`` (default: every column).

    One row per (column, metric); metrics: ``n_null``, ``n_distinct``
    (null-excluding, per SQL ``count(distinct)``), ``min``, ``max``, plus
    a single ``('*', 'count')`` row with the table size."""
    if distinct not in ("exact", "approx", "none"):
        raise ValueError("profile_table: distinct must be exact|approx|none")
    names = list(cols) if cols is not None else df.columns
    dtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    plan: list[tuple[str, str, str, str]] = []  # (col, metric, alias, slot)

    def emit(col: str, metric: str, expr: Column, slot: str) -> None:
        alias = f"__m{len(aggs)}"
        aggs.append(expr.alias(alias))
        plan.append((col, metric, alias, slot))

    for name in names:
        dt = dtypes[name]
        c = F.col(name)
        # count(when), not sum(cast): sum over ZERO rows is NULL, so an
        # empty table would report n_null = NULL where the SQL oracle's
        # count(*) - count(c) reports 0
        emit(name, "n_null", F.count(F.when(c.isNull(), F.lit(1))), "long")
        slots = _slots(name, dt)
        if slots is not None:
            if distinct == "exact":
                emit(name, "n_distinct", F.count_distinct(c), "long")
            elif distinct == "approx":
                emit(name, "n_distinct", F.approx_count_distinct(c), "long")
            slot = (
                "double"
                if dt in ("float", "double")
                else ("str" if dt == "string" else "long")
            )
            emit(name, "min", F.min(slots[0]), slot)
            emit(name, "max", F.max(slots[1]), slot)

    one = df.agg(*aggs)

    def cell(alias: str | None, slot: str, want: str) -> Column:
        if alias is not None and slot == want:
            target = {"long": "long", "double": "double", "str": "string"}[want]
            return F.col(alias).cast(target)
        return F.lit(None).cast(
            {"long": "long", "double": "double", "str": "string"}[want]
        )

    structs = [
        F.struct(
            F.lit("*").alias("col_name"),
            F.lit("count").alias("metric"),
            F.col("__n").cast("long").alias("value_long"),
            F.lit(None).cast("double").alias("value_double"),
            F.lit(None).cast("string").alias("value_str"),
        )
    ]
    for col, metric, alias, slot in plan:
        structs.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.lit(metric).alias("metric"),
                cell(alias, slot, "long").alias("value_long"),
                cell(alias, slot, "double").alias("value_double"),
                cell(alias, slot, "str").alias("value_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("_r")).select(
        "_r.col_name", "_r.metric", "_r.value_long", "_r.value_double", "_r.value_str"
    )
