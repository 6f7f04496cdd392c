"""Per-operator unit tests mirroring the reference's test strategy (SURVEY §5):
inline goldens, seeded determinism, tolerance bands for sketches, and
repartitioning-invariance (the Spark analogue of the reference's seq/par
differential tests, reference tests/mega_integration.rs:1-19)."""

from __future__ import annotations


from pyspark.sql import functions as F

from ironbeam_spark.collection import PCollection, flatten, from_vec
from ironbeam_spark.operators.dead_letter import (
    FAIL_FAST,
    LOG_AND_CONTINUE,
    Rule,
    map_catching,
    validate,
)
from ironbeam_spark.operators.sampling import sample_fraction, sample_reservoir
from ironbeam_spark.operators.windowing import tumble_start
from tests.conftest import SF_SMOKE


def _li(spark):
    from ironbeam_spark.sources.io import read_table

    return read_table(spark, SF_SMOKE, "lineitem")


# ---------------------------------------------------------- sketch tolerance


def test_approx_count_distinct_band(spark):
    li = _li(spark)
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.016)).collect()[0][0]
    # reference HLL precision 12 ≈ 1.6% rsd; allow 5 sigma
    assert abs(approx - exact) / exact < 0.08


def test_percentile_approx_band(spark, duck):
    li = _li(spark)
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    exact = duck.execute(
        "SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem"
    ).fetchone()[0]
    assert abs(approx - exact) / exact < 0.01


# ------------------------------------------------------ sampling determinism


def test_reservoir_partitioning_invariance(spark):
    li = _li(spark).withColumn(
        "_k",
        F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")),
    )
    a = sample_reservoir(li.repartition(3), 50, 42, "_k").select("_k").collect()
    b = sample_reservoir(li.repartition(11), 50, 42, "_k").select("_k").collect()
    assert sorted(r._k for r in a) == sorted(r._k for r in b)
    assert len(a) == 50


def test_fraction_sample_rate(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n = orders.count()
    s = sample_fraction(orders, 0.2, 1, "o_orderkey").count()
    assert abs(s / n - 0.2) < 0.1  # 1500 rows, loose band


# -------------------------------------------------------------- dead letter


def test_map_catching_split(spark):
    df = from_vec(
        spark, [(1, "ok"), (2, "bad"), (3, "ok")], schema="id long, status string"
    ).df
    err = F.when(F.col("status") == "bad", F.lit("bad_status"))
    good, dead = map_catching(df, {}, err, cache=False)
    assert good.count() == 2
    d = dead.collect()
    assert len(d) == 1 and d[0]["error"] == "bad_status" and d[0]["id"] == 2


def test_validate_modes(spark):
    df = from_vec(spark, [(1, 5.0), (2, -1.0), (3, 2.0)], schema="id long, v double").df
    rules = [Rule("nonneg", F.col("v") >= 0)]
    valid, _ = validate(df, rules, "skip_invalid")
    assert valid.count() == 2

    observed, obs = validate(df, rules, LOG_AND_CONTINUE)
    assert observed.count() == 2
    assert obs.get["n_invalid"] == 1 and obs.get["n_rows"] == 3

    try:
        validate(df, rules, FAIL_FAST)
        raised = False
    except ValueError:
        raised = True
    assert raised


# ----------------------------------------------------------------- windowing


def test_tumble_matches_spark_window(spark):
    """Our int64 tumble matches F.window bucketing for offset=0."""
    ev = spark.range(0, 1000).select(
        F.timestamp_millis(F.col("id") * 37_000).alias("ts")
    )
    ours = ev.select(tumble_start(ev, "ts", 3_600_000).alias("w"))
    theirs = ev.select(F.window("ts", "3600 seconds").alias("w")).select(
        F.unix_millis(F.col("w.start")).alias("w")
    )
    assert ours.collect() == theirs.collect()


def test_tumble_offset_semantics(spark):
    """Reference semantics: start = offset + floor((ts-offset)/size)*size
    (src/window.rs:85-96), including ts < offset (we extend via floor)."""
    ev = spark.createDataFrame([(500,), (1700,), (2400,), (100,)], "ms long").select(
        F.timestamp_millis("ms").alias("ts")
    )
    out = sorted(
        r.w for r in ev.select(tumble_start(ev, "ts", 1000, 200).alias("w")).collect()
    )
    #  ts=100 → floor((100-200)/1000) = -1 → start -800; 500→200; 1700→1200; 2400→2200
    assert out == [-800, 200, 1200, 2200]


# --------------------------------------------------------------- collection


def test_pcollection_basics(spark):
    pc = from_vec(
        spark,
        [("a", 1), ("b", 2), ("a", 3), ("c", 4)],
        schema="k string, v long",
    )
    got = {
        (r["k"], r["sum_v"])
        for r in pc.key_by("k").sum_per_key("v").collect()
    }
    assert got == {("a", 4), ("b", 2), ("c", 4)}

    fm = pc.filter_map(F.when(F.col("v") % 2 == 0, F.col("v") * 10), "x")
    assert sorted(r.x for r in fm.collect()) == [20, 40]

    assert pc.take(2).df.count() == 2
    assert pc.to_display_string("v").df.columns == ["display"]

    u = flatten([pc, pc])
    assert u.df.count() == 8

    gb = pc.key_by("k").group_by_key("v").collect()
    assert {r["k"]: r["v_list"] for r in gb}["a"] == [1, 3]


def test_batch_elements_preserves_rows(spark):
    pc = from_vec(spark, [(i,) for i in range(100)], schema="v long").reshuffle(4)
    out = pc.batch_elements(7)
    batches = out.collect()
    total = sum(len(r["batch"]) for r in batches)
    assert total == 100
    assert all(len(r["batch"]) <= 7 for r in batches)
    # at most one short batch per partition (4 partitions), the rest full
    assert sum(1 for r in batches if len(r["batch"]) < 7) <= 4
    # per-partition chunking needs no shuffle beyond the explicit reshuffle:
    # the batch_elements plan segment itself adds zero Exchange
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final_plan.count("Exchange") <= 1  # only reshuffle(4)'s repartition


def test_cogroup_empty_sides(spark):
    a = from_vec(spark, [(1, "x"), (1, "y")], schema="k long, a string")
    b = from_vec(spark, [(2, "z")], schema="k long, b string")
    out = {r["k"]: (r["a_list_0"], r["b_list_1"]) for r in a.cogroup([b], [["a"], ["b"]], ["k"]).collect()}
    assert out[1] == (["x", "y"], [])
    assert out[2] == ([], ["z"])


# ------------------------------------------------------------------ streaming


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """availableNow streaming over the events table == batch result (the
    DataFrame-first promise: same code both modes)."""
    from ironbeam_spark.streaming.windows import stream_tumbling_agg

    from ironbeam_spark.operators.windowing import to_event_time

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    src = ev.select(to_event_time(ev, "ts").alias("ts"), "event_type", "value")
    batch = {
        (r["event_type"], r["window_start"]): r["n"]
        for r in stream_tumbling_agg(
            src, "ts", 3_600_000, ["event_type"], F.count(F.lit(1)).alias("n")
        ).collect()
    }

    data_dir = str(tmp_path / "stream_in")
    src.write.parquet(data_dir)
    sdf = spark.readStream.schema(src.schema).parquet(data_dir)
    agg = stream_tumbling_agg(
        sdf, "ts", 3_600_000, ["event_type"], F.count(F.lit(1)).alias("n"),
        watermark_ms=3_600_000,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_tumble")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["event_type"], r["window_start"]): r["n"]
        for r in spark.sql("select * from t_stream_tumble").collect()
    }
    assert streamed == batch
