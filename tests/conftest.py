from __future__ import annotations

import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ironbeam_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ironbeam-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from ironbeam_spark.sources.io import TPCH_TABLES

    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con


def assert_df_equals_oracle(df, duck_con, sql: str):
    """Differential assertion: Spark DataFrame vs DuckDB SQL, order-insensitive,
    exact values (pytest analogue of the reference's PAssert layer,
    reference src/testing/assertions.rs:71-514)."""
    rel = duck_con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    assert sorted(s_cols) == sorted(d_cols), f"schema: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"rowcount: {len(s_rows)} vs {len(d_rows)}"

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def canon(v):
            if isinstance(v, float):
                return repr(v)
            if isinstance(v, list):
                return tuple(canon(x) for x in v)
            return str(v)

        return sorted(tuple(canon(r[i]) for i in order) for r in rows)

    assert norm(s_rows, s_cols) == norm(d_rows, d_cols)
