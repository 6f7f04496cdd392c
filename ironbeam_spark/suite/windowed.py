"""Event-time windowing queries over the `events` table (SURVEY §2.7).

Window starts are epoch-millis integers computed with the reference's exact
tumble arithmetic (``offset + floor((ts-offset)/size)*size``,
reference ``src/window.rs:85-96``) so the DuckDB oracle can mirror them
bit-for-bit.  Value sums use exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironbeam_spark.functions.exact import sum_money
from ironbeam_spark.operators.windowing import (
    combine_per_key_and_window,
    combine_per_window,
    session_window_agg,
    slide_windows,
)
from ironbeam_spark.suite.registry import _t, query

HOUR = 3600 * 1000


@query(
    "q_tumble_global",
    f"""
    SELECT (epoch_ms(ts) // {HOUR}) * {HOUR} AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
    FROM events
    GROUP BY window_start
    ORDER BY window_start
    """,
    bench=True,
    doc="combine_per_window: 1h tumbling count+sum (ref src/helpers/windowed_combine.rs:114)",
)
def q_tumble_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").df
    out = combine_per_window(
        ev,
        "ts",
        HOUR,
        F.count(F.lit(1)).alias("n_events"),
        sum_money("value", "sum_value"),
    )
    return out.orderBy("window_start")


@query(
    "q_tumble_per_key",
    f"""
    SELECT event_type,
           ((epoch_ms(ts) - {6 * HOUR}) // {24 * HOUR}) * {24 * HOUR} + {6 * HOUR} AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type, window_start
    ORDER BY event_type, window_start
    """,
    doc="combine_per_key_and_window with 6h offset: daily windows aligned at 06:00 (ref windowed_combine.rs:355; offset semantics src/window.rs:85-96)",
)
def q_tumble_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").df
    out = combine_per_key_and_window(
        ev,
        "ts",
        24 * HOUR,
        ["event_type"],
        F.count(F.lit(1)).alias("n"),
        sum_money("value", "sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        offset_ms=6 * HOUR,
    )
    return out.orderBy("event_type", "window_start")


@query(
    "q_sliding_window",
    f"""
    WITH exploded AS (
      SELECT value, epoch_ms(ts) AS tms,
             unnest(list_transform(generate_series(0, 3),
                    i -> (epoch_ms(ts) // {6 * HOUR}) * {6 * HOUR} - ({24 * HOUR} - {6 * HOUR}) + i * {6 * HOUR}))
                    AS window_start
      FROM events
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
    FROM exploded
    WHERE tms >= window_start AND tms < window_start + {24 * HOUR}
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="EXTENSION: sliding window 24h/6h via bounded explode (not in reference — tumbling only, SURVEY §2.7)",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").df
    slid = slide_windows(ev, "ts", 24 * HOUR, 6 * HOUR)
    return (
        slid.groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"), sum_money("value", "sum_value"))
        .orderBy("window_start")
    )


@query(
    "q_session_windows",
    """
    WITH seq AS (
      SELECT user_id, epoch_ms(ts) AS tms, value,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) > 1800000
                  OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NULL
                  THEN 1 ELSE 0 END AS boundary
      FROM events
    ),
    sess AS (
      SELECT user_id, tms, value,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY tms
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq
    )
    SELECT user_id, min(tms) AS session_start, max(tms) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="EXTENSION: 30min-gap session windows via gaps-and-islands (not in reference; Structured Streaming analogue in streaming/)",
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").df
    out = session_window_agg(
        ev,
        "ts",
        30 * 60 * 1000,
        ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
        sum_money("value", "sum_value"),
    )
    return out.orderBy("user_id", "session_start")
