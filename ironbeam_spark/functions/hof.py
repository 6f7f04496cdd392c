"""Higher-order-function helpers for Catalyst expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_"]


def let_(expr: Column, fn) -> Column:
    """Let-binding for Spark expressions: evaluate ``expr`` ONCE and pass it
    to ``fn`` as a lambda variable.

    ``transform(array(expr), x -> fn(x))[0]`` — inside the higher-order
    function the value is a variable read, however many times ``fn``
    references it.  This is the only reliable way to share a subexpression
    within one projection: Catalyst's CollapseProject inlines (not CSEs)
    column references, so "stage it in a withColumn" silently re-evaluates
    the expression at every use site downstream.
    """
    return F.get(F.transform(F.array(expr), fn), 0)
