"""Exact decimal arithmetic helpers for oracle-comparable aggregates.

The driver's correctness gate hashes result values against a DuckDB oracle.
Floating-point SUM is order-dependent, so summing doubles directly would be
nondeterministic across engines (and across Spark partitionings).  The test
data's monetary columns are exact cents and quantities are integers, so we
aggregate in scaled int64 ("cents") space — associative, commutative, exact —
and divide once at the end.  This also mirrors what a production engine does
with DECIMAL types, and it is *faster* than decimal: the hot path is int64
sum inside whole-stage codegen.

The same expressions are mirrored in the DuckDB oracle SQL strings
(``ironbeam_spark/suite.py``), producing bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cents", "sum_money", "sum_long", "avg_money", "avg_exact", "ratio"]


def cents(col: Column | str, scale: int = 100) -> Column:
    """Scaled-integer view of an exact-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("long")


def sum_money(col: Column | str, alias: str, scale: int = 100) -> Column:
    """Exact SUM of a money column, returned as double."""
    return (F.sum(cents(col, scale)) / F.lit(float(scale))).alias(alias)


def sum_long(col: Column | str, alias: str) -> Column:
    """Exact SUM of an integer-valued column, returned as long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c).cast("long")).alias(alias)


def avg_money(col: Column | str, alias: str, scale: int = 100) -> Column:
    """Exact AVG of a money column: integer sum, single final division."""
    return (
        F.sum(cents(col, scale)) / (F.lit(float(scale)) * F.count(F.lit(1)))
    ).alias(alias)


def avg_exact(col: Column | str, alias: str) -> Column:
    """Exact AVG of an integer-valued column."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c).cast("long")) / F.count(F.lit(1))).alias(alias)


def ratio(num: Column, den: Column, alias: str) -> Column:
    """Single deterministic double division."""
    return (num / den).alias(alias)
