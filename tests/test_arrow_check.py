"""Unit tests for tools/arrow_check.py's canonicalizer — the Arrow-surface
value compare that closes the local blind spot behind the four-round
q_prefix_scan/q_token_packing driver divergence (check.py compares
post-fetchall Python objects; the external gate hashes Arrow/pandas)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyarrow as pa

from tools.arrow_check import _canon_value, canon_table

UTC = dt.timezone.utc
CET = dt.timezone(dt.timedelta(hours=2))


def test_float_nan_distinct_from_null():
    t = pa.float64()
    assert _canon_value(None, t) == ("null",)
    assert _canon_value(float("nan"), t) == ("nan",)
    assert _canon_value(None, t) != _canon_value(float("nan"), t)


def test_float_bit_exact():
    t = pa.float64()
    assert _canon_value(0.1, t) == _canon_value(0.1, t)
    # adjacent doubles differ
    import math

    x = 1.0
    assert _canon_value(x, t) != _canon_value(math.nextafter(x, 2.0), t)


def test_timestamp_tz_normalizes_to_utc_naive():
    """A tz-aware timestamp (Spark's TIMESTAMP over Arrow carries tz=UTC)
    and the equal naive instant (DuckDB TIMESTAMP is naive) must agree."""
    naive = dt.datetime(2024, 3, 1, 10, 30, 0, 123456)
    aware_utc = naive.replace(tzinfo=UTC)
    aware_cet = naive.replace(tzinfo=UTC).astimezone(CET)
    t_naive = pa.timestamp("us")
    t_utc = pa.timestamp("us", tz="UTC")
    assert (
        _canon_value(naive, t_naive)
        == _canon_value(aware_utc, t_utc)
        == _canon_value(aware_cet, t_utc)
    )


def test_decimal_compares_by_number_not_scale_representation():
    # scale divergence is the dtype lint's axis; VALUES 1.10 == 1.1
    assert _canon_value(Decimal("1.10"), pa.decimal128(10, 2)) == _canon_value(
        Decimal("1.1"), pa.decimal128(10, 1)
    )
    assert _canon_value(Decimal("1.10"), pa.decimal128(10, 2)) != _canon_value(
        Decimal("1.11"), pa.decimal128(10, 2)
    )


def test_map_order_insensitive():
    t = pa.map_(pa.string(), pa.int64())
    a = _canon_value([("x", 1), ("y", 2)], t)
    b = _canon_value([("y", 2), ("x", 1)], t)
    c = _canon_value({"y": 2, "x": 1}, t)
    assert a == b == c


def test_list_and_struct_recurse():
    lt = pa.list_(pa.float64())
    assert _canon_value([1.5, None], lt) == (
        "l",
        (("f", repr(1.5)), ("null",)),
    )
    st_t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    assert _canon_value({"a": 3, "b": "x"}, st_t) == (
        "s",
        (("a", ("i", 3)), ("b", ("str", "x"))),
    )


def test_canon_table_sorts_columns_and_rows():
    t1 = pa.table({"b": [2, 1], "a": ["y", "x"]})
    t2 = pa.table({"a": ["x", "y"], "b": [1, 2]})
    assert canon_table(t1) == canon_table(t2)


def test_canon_table_catches_int_vs_decimal_values():
    """The original bug class end-to-end: same VALUES, int64 vs
    decimal128 — canonical forms must differ (dtype-sensitive)."""
    ti = pa.table({"v": pa.array([7, 8], pa.int64())})
    td = pa.table({"v": pa.array([Decimal(7), Decimal(8)], pa.decimal128(38, 0))})
    assert canon_table(ti) != canon_table(td)
