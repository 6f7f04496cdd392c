"""Group-aware (leakage-safe) train/val/test split."""

from __future__ import annotations

from pyspark.sql import functions as F

from ironbeam_spark.operators.dedup import minhash_dedup_pairs
from ironbeam_spark.operators.sampling import leakage_safe_split, train_val_test_split


def test_no_near_dup_pair_straddles_splits(spark):
    """The defining property: for EVERY mined near-dup pair, both endpoints
    get the same split — where the plain doc-keyed split provably leaks on
    the same data (sanity-checks the test has teeth)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_words=3, k=8, bands=4, threshold=0.5
    )
    safe = leakage_safe_split(docs.select("doc_id"), pairs, "doc_id", seed=31)
    assign = {r["doc_id"]: r["split"] for r in safe.collect()}
    plain = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(docs.select("doc_id"), "doc_id", seed=31).collect()
    }
    pair_rows = pairs.collect()
    assert pair_rows, "fixture regression: no near-dup pairs at sf0.001"
    for r in pair_rows:
        assert assign[r["id_a"]] == assign[r["id_b"]], (r["id_a"], r["id_b"])
    # the doc-keyed split leaks on at least one pair (else this test is vacuous)
    assert any(plain[r["id_a"]] != plain[r["id_b"]] for r in pair_rows)


def test_transitive_group_coassignment_and_fractions(spark):
    # chain a~b, b~c (a!~c): all three must share a split via the component
    docs = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (500, 700)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, "doc_id", seed=5)
    rows = {r["doc_id"]: (r["group_key"], r["split"]) for r in out.collect()}
    assert rows[1] == rows[2] == rows[3] == (1, rows[1][1])
    assert rows[500] == rows[700] == (500, rows[500][1])
    # singletons keep their own id as group key
    assert rows[42][0] == 42
    # roughly 80/10/10 over ~997 groups
    from collections import Counter

    c = Counter(s for _, s in rows.values())
    assert 0.7 < c["train"] / 1000 < 0.9
    assert c["val"] > 0 and c["test"] > 0
