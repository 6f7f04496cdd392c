"""Differential test: every suite query with an oracle must match DuckDB at
sf0.001 (fast smoke; tools/check.py covers sf0.01 — the driver's gate)."""

from __future__ import annotations

import pytest

from ironbeam_spark.suite import QUERIES
from tests.conftest import SF_SMOKE, assert_df_equals_oracle

ORACLE_QUERIES = [n for n, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    assert_df_equals_oracle(df, duck, q.oracle)


NON_ORACLE = [n for n, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", NON_ORACLE)
def test_query_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
