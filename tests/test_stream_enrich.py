"""Stream-static enrichment (streaming/enrich.py): batch-equivalence under
Trigger.AvailableNow, unmatched-row survival on the left join, and the
contract validations."""

from __future__ import annotations

import pytest

from ironbeam_spark.streaming.enrich import stream_static_enrich


def _run_stream(spark, sdf, name, ckpt):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_batch_equivalence_and_unmatched_rows(spark, tmp_path):
    facts = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 7.0), (3, 99, 9.0)],  # 99 has no dim row
        "event_id long, user_id long, value double",
    )
    src = str(tmp_path / "facts")
    facts.write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "user_id long, segment string"
    )
    sdf = spark.readStream.schema(facts.schema).parquet(src)
    out = _run_stream(
        spark,
        stream_static_enrich(sdf, dim, on="user_id"),
        "enrich_equiv_sink",
        str(tmp_path / "ckpt"),
    )
    got = {(r.event_id, r.segment) for r in out.collect()}
    want = {
        (r.event_id, r.segment)
        for r in facts.join(dim, on="user_id", how="left_outer").collect()
    }
    assert got == want
    assert (3, None) in got  # unmatched fact row survives with null dim


def test_inner_join_drops_unmatched(spark, tmp_path):
    facts = spark.createDataFrame(
        [(1, 10, 1.0), (2, 99, 2.0)], "event_id long, user_id long, value double"
    )
    src = str(tmp_path / "facts2")
    facts.write.parquet(src)
    dim = spark.createDataFrame([(10, "A")], "user_id long, segment string")
    sdf = spark.readStream.schema(facts.schema).parquet(src)
    out = _run_stream(
        spark,
        stream_static_enrich(sdf, dim, on="user_id", how="inner"),
        "enrich_inner_sink",
        str(tmp_path / "ckpt2"),
    )
    assert {(r.event_id, r.segment) for r in out.collect()} == {(1, "A")}


def test_contract_validations(spark, tmp_path):
    batch = spark.createDataFrame([(1, 1)], "a long, user_id long")
    src = str(tmp_path / "v")
    batch.write.parquet(src)
    sdf = spark.readStream.schema(batch.schema).parquet(src)
    with pytest.raises(ValueError, match="must be streaming"):
        stream_static_enrich(batch, batch, on="user_id")
    with pytest.raises(ValueError, match="must be batch"):
        stream_static_enrich(sdf, sdf, on="user_id")
    with pytest.raises(ValueError, match="stream-left"):
        stream_static_enrich(sdf, batch, on="user_id", how="full_outer")
