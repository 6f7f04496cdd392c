"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (``zip_with`` + ``aggregate``), no UDFs.

Arithmetic discipline: elements are cast to double *before* multiply and the
sum is a sequential left-fold, so any engine evaluating the same expression
order produces bit-identical doubles (the SQL oracle mirrors it with
``generate_series`` + ``list_sum``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
