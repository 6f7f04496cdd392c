"""Unit tests for operators/scan.py: the distributed prefix scan and the
pack-layout arithmetic (q_token_packing's core), with emphasis on the
double-precision cliff — integer DIV must stay exact where ``/`` + cast
would round across pack boundaries (round-8 verdict ask #3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ironbeam_spark.operators.scan import global_running_sum, pack_layout

CAP = 2048


def _py_layout(rows, cap=CAP):
    """Driver-side integer-exact reference: (pack_id, offset, spanned)."""
    out, cum = [], 0
    for _id, n in rows:
        start, cum = cum, cum + n
        spanned = 1 if n == 0 else (cum - 1) // cap - start // cap + 1
        out.append((_id, start // cap, start % cap, spanned))
    return out


def test_pack_layout_small(spark):
    rows = [(1, 100), (2, 0), (3, 2000), (4, 5000), (5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    scanned = global_running_sum(df, ["doc_id"], "n", "cum")
    got = {
        r["doc_id"]: (r["pack_id"], r["offset_in_pack"], r["n_packs_spanned"])
        for r in pack_layout(scanned, "n", "cum", CAP).collect()
    }
    for _id, pid, off, span in _py_layout(rows):
        assert got[_id] == (pid, off, span), _id


def test_pack_layout_exact_past_2_53(spark):
    """The latent bug this test pins down: with cumulative offsets past
    2^53, double division ``(start / 2048)`` rounds across integer
    boundaries (odd longs > 2^53 are not even representable), so
    ``pack_id``/``n_packs_spanned`` computed via ``/`` + cast misassign
    near pack edges.  Integer DIV must match driver-side Python ints
    exactly.  Rows are engineered so ``start`` lands 1 below, on, and 1
    above a pack boundary in the > 2^53 regime."""
    base = (1 << 53) + 5 * CAP  # pack-aligned huge base
    rows = [
        (1, base - 1),      # start 0,        end = boundary - 1
        (2, 1),             # start base-1    (2048k - 1: the round-UP trap)
        (3, 1),             # start base      (exactly on a boundary)
        (4, CAP + 1),       # start base+1, spans 2 packs
        (5, 0),             # zero-size element on a huge offset
        (6, 3 * CAP),       # spans exactly 3 packs from an aligned start
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    scanned = global_running_sum(df, ["doc_id"], "n", "cum")
    got = {
        r["doc_id"]: (r["pack_id"], r["offset_in_pack"], r["n_packs_spanned"])
        for r in pack_layout(scanned, "n", "cum", CAP).collect()
    }
    expect = {_id: (p, o, s) for _id, p, o, s in _py_layout(rows)}
    assert got == expect
    # and the trap really is a trap: double division gets row 2 wrong
    start = base - 1
    assert int(float(start) / CAP) != start // CAP


def test_pack_layout_double_division_would_be_wrong(spark):
    """Negative control executed IN Spark: the old `/` + cast spelling
    disagrees with DIV on the >2^53 fixture — proves the engine-level
    failure mode is real, not a Python-only artifact."""
    start = (1 << 53) + 5 * CAP - 1
    df = spark.createDataFrame([(start,)], "start long")
    r = df.select(
        (F.col("start") / CAP).cast("long").alias("bad"),
        F.expr(f"start DIV {CAP}").alias("good"),
    ).collect()[0]
    assert r["good"] == start // CAP
    assert r["bad"] != r["good"]


def test_mechanism_override_stamped_matches_bucketed(spark):
    """mechanism='stamped' (the outlier-robust RangePartitioner path) and
    the default bucketed path must agree bit-for-bit — including on an
    OUTLIER-HEAVY key distribution (one key at 2^62 with the rest
    clustered), the case the override exists for."""
    rows = [(i, i % 7) for i in range(200)] + [(1 << 62, 999)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = {
        r["k"]: r["rs"]
        for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    b = {
        r["k"]: r["rs"]
        for r in global_running_sum(
            df, ["k"], "v", "rs", mechanism="stamped"
        ).collect()
    }
    assert a == b
    # and the values are right: inclusive prefix in k order
    cum, expect = 0, {}
    for k, v in sorted(rows):
        cum += v
        expect[k] = cum
    assert a == expect


def test_mechanism_validation(spark):
    df = spark.createDataFrame([(1.0, 1)], "k double, v long")
    import pytest

    with pytest.raises(TypeError, match="bucketed"):
        global_running_sum(df, ["k"], "v", mechanism="bucketed")
    with pytest.raises(ValueError, match="mechanism"):
        global_running_sum(df, ["k"], "v", mechanism="nope")
    # auto on a double key silently takes the stamped path — still exact
    got = {
        r["k"]: r["rs"]
        for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    assert got == {1.0: 1}


def test_pack_layout_validates_cap(spark):
    df = spark.createDataFrame([(1, 1, 1)], "doc_id long, n long, cum long")
    try:
        pack_layout(df, "n", "cum", 0)
        raise AssertionError("cap=0 must be rejected")
    except ValueError:
        pass


# -- property-based models (hypothesis): adversarial key distributions ------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# keys mix a clustered range with int64-scale outliers (the distribution
# the mechanism override exists for) and negatives
_LONG_KEY = st.one_of(
    st.integers(-50, 50),
    st.integers(-(1 << 62), 1 << 62),
)


@given(
    rows=st.lists(
        st.tuples(_LONG_KEY, st.integers(-(10**9), 10**9)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    n_buckets=st.sampled_from([1, 3, 64]),
    mechanism=st.sampled_from(["auto", "stamped"]),
)
@settings(**_HSETTINGS)
def test_running_sum_long_key_model(spark, rows, n_buckets, mechanism):
    """Both scan mechanisms == Python prefix sum, for ANY mix of clustered,
    outlier, and negative int64 keys and signed values."""
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["rs"]
        for r in global_running_sum(
            df, ["k"], "v", "rs", n_buckets=n_buckets, mechanism=mechanism
        ).collect()
    }
    cum, expect = 0, {}
    for k, v in sorted(rows):
        cum += v
        expect[k] = cum
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.text(max_size=12), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
@settings(**_HSETTINGS)
def test_running_sum_string_key_model(spark, rows):
    """The string monotone projection (first 8 UTF-8 bytes) == Python
    prefix sum under code-point order, for arbitrary unicode keys —
    including shared prefixes, empty strings, and astral-plane chars
    (valid-UTF-8 byte order equals code-point order, so Python's sorted()
    IS the spec here)."""
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: r["rs"]
        for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    cum, expect = 0, {}
    for k, v in sorted(rows):
        cum += v
        expect[k] = cum
    assert got == expect


@given(
    sizes=st.lists(
        st.one_of(st.integers(0, 5000), st.just(0)),
        min_size=1,
        max_size=30,
    ),
    cap=st.sampled_from([1, 7, 2048]),
    base=st.sampled_from([0, (1 << 53) + 12345]),
)
@settings(**_HSETTINGS)
def test_pack_layout_model(spark, sizes, cap, base):
    """pack_layout == the Python integer model for ANY size sequence
    (zero-size runs, cap=1 degenerate, sub-cap and multi-pack spans), both
    from offset 0 and from a base past the double-precision cliff."""
    rows = []
    if base:
        rows.append((0, base))  # shifts every later start past 2^53
    rows += [(i + 1, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    scanned = global_running_sum(df, ["doc_id"], "n", "cum")
    got = {
        r["doc_id"]: (r["pack_id"], r["offset_in_pack"], r["n_packs_spanned"])
        for r in pack_layout(scanned, "n", "cum", cap).collect()
    }
    expect = {_id: (p, o, s) for _id, p, o, s in _py_layout(rows, cap)}
    assert got == expect


def test_pack_layout_rejects_negative_midjob(spark):
    """Negative sizes/starts would silently mis-pack (DIV truncates toward
    zero, % follows the dividend) — the guard must raise instead."""
    import pytest

    df = spark.createDataFrame(
        [(1, -2, -2), (2, 3, 1)], "doc_id long, n long, cum long"
    )
    with pytest.raises(Exception, match="negative size or start"):
        pack_layout(df, "n", "cum", 2048).collect()
