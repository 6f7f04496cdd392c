"""Query-level seq/par differential (SURVEY §5, reference
tests/mega_integration.rs): representative registry queries must return
IDENTICAL results under radically different shuffle parallelism.

The reference proves partition-invariance by running every pipeline both
sequentially and parallel; the Spark analogue is the shuffle-partition
count, which moves every exchange boundary, AQE coalescing decision, and
per-partition evaluation order.  The picked queries cover each mechanism
with a potential partitioning dependence: the two-level bucketed scan and
its dependents (prefix scan / packing / sharding), iterative graph
algebra (pagerank, triangles), banded minhash + connected components,
order-statistics sketches (KMV), seeded sampling (priority reservoir,
weighted systematic), and a partial+final TPC-H aggregate.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.check import normalize

from ironbeam_spark.caches import release_all_caches
from ironbeam_spark.suite import QUERIES

REPRESENTATIVES = [
    "q_prefix_scan",
    "q_token_packing",
    "q_shard_export",
    "q_scan_string_key",
    # the stamped fallback (double key): RangePartitioner slice count and
    # spark_partition_id stamps are exactly the env-sensitive machinery
    # this differential exists to catch
    "q_scan_float_key",
    "q_weighted_sample",
    "q_pagerank",
    "q_triangle_count",
    "q_dedup_minhash",
    # delta-vs-index classification: min-id winner + min_by jaccard picks
    # must not depend on which partition delivers a candidate first
    "q_dedup_incremental",
    "q_corpus_clean",
    "q_kmv_distinct",
    "q_sample_reservoir",
    "q1_pricing_summary",
    # iterative greedy argmax: each round's farthest-point pick must not
    # depend on which partition reports its max first
    "q_kcenter",
    # q-gram prefix-filter join: candidate generation order varies with
    # partitioning; the verified output must not
    "q_editdist_join",
    # corpus-wide keep-first line winner: min-by aggregate across shuffles
    "q_line_dedup",
    # BPE merge induction: the argmax pair each round is a global decision
    # assembled from partial counts
    "q_bpe_tokenize",
    # group-aware split: component labels (iterative min-propagation) and
    # the md5 bucket assignment must agree across shuffle widths
    "q_leakage_safe_split",
    # contrastive triples: the seeded priority pool is a bounded driver
    # collect over a distributed sort — its membership AND order must not
    # depend on partitioning, nor may the per-anchor exclusion filter
    "q_contrastive_pairs",
]


def _canon(df):
    return normalize([tuple(r) for r in df.collect()], df.columns)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_invariant_under_shuffle_parallelism(name, spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        seq = _canon(QUERIES[name].fn(spark, SF_SMOKE))
        release_all_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        par = _canon(QUERIES[name].fn(spark, SF_SMOKE))
        release_all_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert seq == par, f"{name}: results depend on shuffle partitioning"
