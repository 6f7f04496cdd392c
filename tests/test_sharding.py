"""Deterministic shard export (operators/sharding.py) vs a Python model."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ironbeam_spark.operators.sharding import (
    AFFINE_P,
    affine_params,
    deterministic_shuffle_key,
    shard_assignment,
    write_shards,
)


def _model(rows, cap, seed):
    """Python reference: affine key, (key, id) order, cumsum, DIV/% layout."""
    a, b, p = affine_params(seed)
    keyed = [(((i % p) * a + b) % p, i, n) for i, n in rows]
    out, cum = {}, 0
    for k, i, n in sorted(keyed):
        start, cum = cum, cum + n
        out[i] = (k, start // cap, start % cap)
    return out


def _got(spark, rows, cap, seed):
    df = spark.createDataFrame(rows, "doc_id long, n long")
    res = shard_assignment(df, "doc_id", "n", cap, seed=seed)
    return {
        r["doc_id"]: (r["shuffle_key"], r["shard_id"], r["offset_in_shard"])
        for r in res.collect()
    }


def test_small_model(spark):
    rows = [(i, 10 * i % 37) for i in range(50)]
    assert _got(spark, rows, 64, seed=7) == _model(rows, 64, 7)


def test_same_seed_reproduces_different_seed_reorders(spark):
    rows = [(i, 5) for i in range(40)]
    a = _got(spark, rows, 16, seed=1)
    b = _got(spark, rows, 16, seed=1)
    c = _got(spark, rows, 16, seed=2)
    assert a == b
    assert a != c  # the b-rotation changes wrap-around, hence the order


def test_affine_key_is_bijective_below_p(spark):
    rows = [(i, 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    keys = [
        r["shuffle_key"]
        for r in deterministic_shuffle_key(df, "doc_id", 3).collect()
    ]
    assert len(set(keys)) == 500
    assert all(0 <= k < AFFINE_P for k in keys)


def test_out_of_range_ids_still_total_order(spark):
    # id >= p collides with (id - p): the (key, id) tiebreak keeps the
    # order total and the model agrees
    rows = [(2, 10), (2 + AFFINE_P, 20), (5, 1)]
    assert _got(spark, rows, 8, seed=0) == _model(rows, 8, 0)


def test_negative_ids_use_pmod(spark):
    """Engine pmod == Python floored %; a negative id must land where the
    model says (and collide with id + p, the pmod wrap)."""
    rows = [(-5, 10), (-5 + AFFINE_P, 20), (3, 1), (-1, 4)]
    assert _got(spark, rows, 8, seed=2) == _model(rows, 8, 2)


def test_negative_size_raises_midjob(spark):
    df = spark.createDataFrame([(1, 5), (2, -1)], "doc_id long, n long")
    with pytest.raises(Exception, match="negative n"):
        shard_assignment(df, "doc_id", "n", 8).collect()


def test_zero_capacity_rejected(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    with pytest.raises(ValueError, match="shard_capacity"):
        shard_assignment(df, "doc_id", "n", 0)


def test_non_integral_id_rejected(spark):
    df = spark.createDataFrame([("x", 5)], "doc_id string, n long")
    with pytest.raises(TypeError, match="integral id"):
        deterministic_shuffle_key(df, "doc_id")


def test_write_shards_roundtrip(spark, tmp_path):
    rows = [(i, 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    assigned = shard_assignment(df, "doc_id", "n", 70, seed=9)
    path = str(tmp_path / "shards")
    write_shards(assigned, path)
    back = spark.read.parquet(path)
    assert back.count() == 60
    # layout survives the roundtrip (shard_id is the hive partition col)
    got = {
        r["doc_id"]: (r["shard_id"], r["offset_in_shard"])
        for r in back.collect()
    }
    expect = {
        i: (sid, off) for i, (_k, sid, off) in _model(rows, 70, 9).items()
    }
    assert got == expect
    # each shard holds at most ceil(cap/size)=10 docs and offsets are unique
    from collections import defaultdict

    per = defaultdict(list)
    for i, (sid, off) in got.items():
        per[sid].append(off)
    for sid, offs in per.items():
        assert len(offs) == len(set(offs))


def test_write_shards_requires_assignment_cols(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    with pytest.raises(ValueError, match="shard_id"):
        write_shards(df, str(tmp_path / "x"))


def test_write_shards_rejects_max_records_per_file(spark, tmp_path):
    """A nonzero spark.sql.files.maxRecordsPerFile would split a shard
    directory into multiple files, silently breaking the advertised
    one-file-per-shard layout — the writer must refuse up front."""
    df = spark.createDataFrame([(i, 7) for i in range(20)], "doc_id long, n long")
    assigned = shard_assignment(df, "doc_id", "n", 35, seed=1)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "5")
    try:
        with pytest.raises(ValueError, match="maxRecordsPerFile"):
            write_shards(assigned, str(tmp_path / "split"))
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    # back at the default the same frame writes fine
    write_shards(assigned, str(tmp_path / "ok"))
    assert spark.read.parquet(str(tmp_path / "ok")).count() == 20


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.integers(-100, 100), st.integers(-(1 << 62), 1 << 62)
            ),
            st.integers(0, 500),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    cap=st.sampled_from([1, 17, 256]),
    seed=st.integers(0, 3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shard_assignment_property_model(spark, rows, cap, seed):
    assert _got(spark, rows, cap, seed) == _model(rows, cap, seed)
