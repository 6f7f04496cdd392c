"""Builder-layer tests: determinism + distribution shape (reference analog:
``src/testing/builders.rs`` seeded builders)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.builders import hash64, near_dup_corpus, seeded_kvs, skewed_kvs, time_series


def test_hash64_deterministic_and_spread():
    a = [hash64(42, i) for i in range(1000)]
    assert a == [hash64(42, i) for i in range(1000)]  # pure function
    assert len(set(a)) == 1000  # no collisions in a small range
    assert [hash64(43, i) for i in range(10)] != a[:10]  # seed matters


def test_seeded_kvs_reproducible(spark):
    d1 = seeded_kvs(spark, 500, n_keys=7).collect()
    d2 = seeded_kvs(spark, 500, n_keys=7).collect()
    assert d1 == d2
    keys = {r.key for r in d1}
    assert keys == {f"key_{i}" for i in range(7)}


def test_skewed_kvs_shape(spark):
    df = skewed_kvs(spark, 2000, hot_frac=0.5, n_cold=20)
    counts = {r.key: r.n for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    hot = counts.pop("hot_key")
    assert 0.4 * 2000 < hot < 0.6 * 2000, hot  # ~hot_frac of rows
    assert all(v < hot / 5 for v in counts.values())  # every cold key is cold


def test_time_series_monotone(spark):
    rows = time_series(spark, n=11).orderBy("ts").collect()
    assert [r.ts for r in rows] == list(range(1000, 2100, 100))
    assert all(10.0 <= r.value < 20.0 for r in rows)


def test_near_dup_corpus_ground_truth(spark):
    df, expected = near_dup_corpus(spark, n_families=4, family_size=3, n_filler=20)
    assert df.count() == 4 * 3 + 20
    assert len(expected) == 4 * 3  # C(3,2)=3 pairs per family
    # filler docs never collide with families on doc_id
    ids = {r.doc_id for r in df.select("doc_id").collect()}
    assert len(ids) == df.count()
