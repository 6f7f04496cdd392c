"""The registry enumeration order is a frozen contract.

The first 50 names form the audit window sampled by the external
correctness gate; they must never move or be displaced, so regressions in
already-verified queries stay visible round over round.  New queries may
only be appended AFTER the canonical prefix.
"""

from ironbeam_spark.suite import CANONICAL_ORDER, QUERIES

FROZEN_PREFIX = [
    "q_simhash_fingerprints",
    "q_asof_join",
    "q_interval_join",
    "q_pii_scrub",
    "q_vocab_topk",
    "q_heavy_hitters",
    "q_doc_chunking",
    "q_contamination",
    "q_pivot",
    "q_unpivot",
    "q_window_analytics",
    "q_merge_upsert",
    "q_group_stats",
    "q_histogram",
    "q_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "q_join_inner",
    "q_join_left_nulls",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_cogroup",
    "q_global_agg",
    "q_group_by_key",
    "q_combinefn_udaf",
    "q_combine_lifted",
    "q_count_per_element",
    "q_top_k_per_key",
    "q_to_dict",
    "q_tumble_global",
    "q_sliding_window",
    "q_session_windows",
    "q_stream_tumble",
    "q_running_total",
    "q_kmv_distinct",
    "q_approx_quantiles",
    "q_sample_reservoir",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_embedding",
    "q_ann_lsh",
    "q_training_mix",
    "q_lang_id",
]


def test_prefix_is_frozen():
    assert CANONICAL_ORDER == FROZEN_PREFIX, (
        "CANONICAL_ORDER changed — the audit-window prefix is a frozen "
        "contract; append new queries after it instead"
    )


def test_registry_enumerates_prefix_first():
    names = list(QUERIES)
    assert names[: len(FROZEN_PREFIX)] == FROZEN_PREFIX


def test_order_is_deterministic_and_complete():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(CANONICAL_ORDER) <= set(names)
