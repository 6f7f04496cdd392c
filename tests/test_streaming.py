"""Stateful Structured Streaming operator tests (applyInPandasWithState):
first-seen dedup and running counts over the events table, AvailableNow."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from ironbeam_spark.sources.io import read_table
from ironbeam_spark.streaming.stateful import stream_dedup_first, stream_running_count
from tests.conftest import SF_SMOKE


def _events_stream(spark):
    static = read_table(spark, SF_SMOKE, "events")
    return (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    ), static


def _run_to_memory(sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ironbeam_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_dedup_first_matches_batch_winner(spark):
    sdf, static = _events_stream(spark)
    out = stream_dedup_first(
        sdf.select("user_id", "event_type", "event_id"),
        ["user_id", "event_type"],
        "event_id",
    )
    _run_to_memory(out, "t_stream_dedup", "append")
    got = {
        (r.user_id, r.event_type): r.event_id for r in spark.table("t_stream_dedup").collect()
    }
    expected = {
        (r.user_id, r.event_type): r.first_id
        for r in static.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_id"))
        .collect()
    }
    assert got == expected  # one winner per key, deterministic min-by


def test_stream_running_count_single_batch(spark):
    sdf, static = _events_stream(spark)
    out = stream_running_count(
        sdf.select(F.col("event_type").cast("string").alias("event_type")),
        ["event_type"],
    )
    _run_to_memory(out, "t_stream_counts", "update")
    got = {r.event_type: r.running_n for r in spark.table("t_stream_counts").collect()}
    expected = {
        r.event_type: r.n
        for r in static.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected
