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

__all__ = ["dot", "norm", "cosine", "cosine_safe", "quantize_int8", "int_dot", "cosine_int8"]


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


def cosine_safe(a: Column, b: Column) -> Column:
    """Cosine that yields NULL where the quotient is undefined (zero-norm
    or empty vectors) instead of raising under Spark 4's ANSI mode —
    identical doubles to :func:`cosine` wherever both are defined.  The
    dirty-corpus variant: dedup/similarity operators filter nulls, so a
    degenerate vector simply never pairs."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization — the standard
    embedding-compression step for billion-vector ANN (4× smaller than
    float32, integer dot products downstream).

    ``scale = max|x| / 127``; ``q_i = round(x_i / scale)`` (by construction
    ``|q_i| ≤ 127``, no clamp needed).  Returns ``struct(q: array<int>,
    scale: double)``; the all-zero vector quantizes to zeros with scale 0.
    Deterministic cross-engine: division and round-half-away-from-zero
    behave identically in Spark and DuckDB, so an oracle reproduces the
    exact codes."""
    from ironbeam_spark.functions.hof import let_

    maxabs = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))

    def build(m: Column) -> Column:
        scale = m / F.lit(127.0)
        q = F.transform(a, lambda x: F.round(x.cast("double") / scale).cast("int"))
        return F.struct(q.alias("q"), scale.alias("scale"))

    zero = F.struct(
        F.transform(a, lambda x: F.lit(0)).alias("q"),
        F.lit(0.0).alias("scale"),
    )
    return F.when(maxabs > 0, let_(maxabs, build)).otherwise(zero)


def int_dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two quantized code arrays (int64 fold —
    127²·dim stays far below overflow)."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_int8(qa: Column, qb: Column) -> Column:
    """Cosine over int8-quantized vectors.  The per-vector scales CANCEL:
    cos(ŝ_a·qa, ŝ_b·qb) = ⟨qa,qb⟩ / (√⟨qa,qa⟩·√⟨qb,qb⟩) — three exact
    integer dots, two sqrt, one division: bit-deterministic in any IEEE
    engine, so quantized ANN results are exact-oracle-checkable."""
    return int_dot(qa, qb).cast("double") / (
        F.sqrt(int_dot(qa, qa).cast("double")) * F.sqrt(int_dot(qb, qb).cast("double"))
    )
