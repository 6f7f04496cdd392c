"""Scale-lever tests: salted skew joins/aggs (correct vs unsalted) and
bucketed co-located joins (no exchange in the plan)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ironbeam_spark.operators.skew import salted_agg, salted_join
from ironbeam_spark.plans.explain import explain_formatted
from ironbeam_spark.sources.bucketing import read_bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


def _skewed(spark):
    # 90% of rows share key 0 — the power-law shape salting exists for
    rows = [(i, i % 10 if i % 10 < 2 else 0) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, k long")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(k, f"v{k}") for k in range(10)], "k long, label string")
    plain = big.join(small, on="k").select("row_id", "k", "label")
    salted = salted_join(big, small, ["k"], buckets=8, big_unique_col="row_id").select(
        "row_id", "k", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    big = _skewed(spark).withColumn("_salt_probe", F.pmod(F.xxhash64("row_id"), F.lit(8)))
    # the hot key's rows really do land in >1 salt bucket
    n_buckets = big.where("k = 0").select("_salt_probe").distinct().count()
    assert n_buckets > 1


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark).withColumn("v", F.col("row_id") % 100)
    plain = df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    salted = salted_agg(
        df,
        ["k"],
        partial_aggs=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
        final_aggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
        buckets=8,
        unique_col="row_id",
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_join_has_no_exchange(spark):
    # tables land in the default warehouse dir; dropped (managed) in finally
    left = spark.createDataFrame([(i, i * 2) for i in range(100)], "k long, a long")
    right = spark.createDataFrame([(i, i * 3) for i in range(100)], "k long, b long")
    write_bucketed(left, "t_bleft", ["k"], buckets=4, sort_by=["k"])
    write_bucketed(right, "t_bright", ["k"], buckets=4, sort_by=["k"])
    joined = read_bucketed_join(spark, "t_bleft", "t_bright", on=["k"])
    # small sides would normally broadcast; force the shuffle-join path to
    # prove bucketing (not broadcast) removes the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_formatted(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_range_sorted_write_gives_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted must produce files whose parquet min/max footer
    stats are pairwise disjoint on the sort key — the property that lets a
    range predicate skip every non-overlapping file at 100 TB."""
    from ironbeam_spark.sources.io import read_table
    from ironbeam_spark.sources.layout import file_column_ranges, write_range_sorted

    events = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_ts")
    write_range_sorted(events, out, ["ts"], num_files=8)

    ranges = file_column_ranges(out, "ts")
    assert len(ranges) >= 2, ranges
    spans = sorted((lo, hi) for _, lo, hi in ranges)
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo, spans  # disjoint (boundary ties allowed)

    # layout must not change content
    assert (
        spark.read.parquet(out).count() == events.count()
    )


def test_zorder_write_skips_files_on_both_columns(spark, tmp_path):
    """Z-order layout: a narrow range predicate on EITHER interleaved column
    intersects only a fraction of the files' footer ranges — the multi-column
    file-skipping a plain leading-column sort cannot give."""
    from ironbeam_spark.sources.io import read_table
    from ironbeam_spark.sources.layout import file_column_ranges, write_zordered
    from tests.conftest import SF_SMOKE

    events = read_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    total = events.count()
    out = str(tmp_path / "zorder.parquet")
    # event_id and value are both high-cardinality — the interesting case
    write_zordered(events, out, ["event_id", "value"], bits=6, num_files=16)

    back = spark.read.parquet(out)
    assert back.count() == total  # layout is result-invariant

    def files_hit(col, lo, hi):
        ranges = file_column_ranges(out, col)
        assert len(ranges) >= 8
        return sum(1 for _, fmin, fmax in ranges if not (fmax < lo or fmin > hi)), len(ranges)

    hit_e, n_files = files_hit("event_id", 100, 160)  # ~6% of the id domain
    assert hit_e <= n_files // 2, (hit_e, n_files)

    hit_v, n_files = files_hit("value", 1.0, 2.0)  # narrow value slice
    assert hit_v <= n_files // 2, (hit_v, n_files)
