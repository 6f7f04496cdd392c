"""Streaming CDC apply (streaming/cdc.py): multi-micro-batch state,
tombstone/resurrection, late-row suppression, batch equivalence."""

from __future__ import annotations

import random
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from ironbeam_spark.operators.cdc import apply_changes
from ironbeam_spark.streaming.cdc import stream_apply_changes

SCHEMA = "key long, us long, seq long, op string, val string"


def _run_stream(spark, batches):
    """batches: list[list[rows]] -> converged snapshot dict + emissions.

    Each inner list becomes one parquet file; maxFilesPerTrigger=1 makes
    each file one micro-batch (file order = listing order, so file names
    are zero-padded)."""
    tag = uuid.uuid4().hex[:8]
    src = tempfile.mkdtemp(prefix=f"ironbeam_cdc_src_{tag}_")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i:03d}"
        )
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    out = stream_apply_changes(
        sdf, ["key"], "us", ["val"], op_col="op", tiebreak_cols=["seq"]
    )
    name = f"t_cdc_{tag}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ironbeam_cdc_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table(name)
    w = W.partitionBy("key").orderBy(F.col("us").desc(), F.col("seq").desc())
    final = (
        t.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .collect()
    )
    snap = {
        r["key"]: (r["val"], r["us"])
        for r in final
        if not r["_deleted"]
    }
    return snap, t.count()


def _batch_snap(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = apply_changes(
        df.withColumn("us", F.col("us") * 1000),  # ns contract
        ["key"], "us", op_col="op", tiebreak_cols=["seq"],
    )
    return {r["key"]: (r["val"], r["_us"]) for r in got.collect()}


def test_tombstone_and_resurrection_across_batches(spark):
    b1 = [(1, 10, 0, "U", "a"), (2, 10, 1, "U", "x")]
    b2 = [(1, 20, 2, "D", None)]          # tombstone key 1
    b3 = [(1, 30, 3, "U", "back")]        # resurrect key 1
    snap, _ = _run_stream(spark, [b1, b2, b3])
    assert snap == {1: ("back", 30), 2: ("x", 10)}


def test_late_row_is_ignored(spark):
    b1 = [(1, 100, 0, "U", "new")]
    b2 = [(1, 50, 1, "U", "late")]  # older than stored winner: no emission
    snap, n_emissions = _run_stream(spark, [b1, b2])
    assert snap == {1: ("new", 100)}
    assert n_emissions == 1  # the late batch emitted nothing


def test_stream_converges_to_batch_apply(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(10), rng.randrange(200), i,
         rng.choice(["U", "U", "D"]), rng.choice(["p", "q"]))
        for i in range(120)
    ]
    batches = [rows[0:40], rows[40:80], rows[80:120]]
    snap, _ = _run_stream(spark, batches)
    assert snap == _batch_snap(spark, rows)
