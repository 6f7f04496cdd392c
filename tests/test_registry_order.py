"""The registry enumeration order is a frozen contract with a rotation window.

The first 50 names form the audit window sampled by the external
correctness gate.  Slots 16-50 are immutable: a hand-picked cross-section
of every operator family whose rows stay visible round over round so
regressions surface.  Slots 1-15 are a documented rotation window: at the
start of a round, queries there that earned a green driver row in the
previous round may be displaced — and only such green-row queries may be
displaced — by queries that have never had a driver row; displaced queries
move to the block immediately after slot 50.  See the rotation history in
``ironbeam_spark/suite/__init__.py``.
"""

from ironbeam_spark.suite import CANONICAL_ORDER, QUERIES

# Current frozen prefix (r12 FRESHNESS WAVE 2 applied — slots 1-9 hold the
# never-driver-sampled r11 web family, slots 10-15 the six stalest-green
# queries, per the oldest-green-first policy documented in
# ironbeam_spark/suite/__init__.py, named mechanically by
# `python tools/freshness.py`).
FROZEN_PREFIX = [
    # 1-9: freshness window, wave 2 — never driver-sampled (r11 web family)
    "q_url_canonical",
    "q_domain_stats",
    "q_html_extract",
    "q_link_graph",
    "q_domain_filter",
    "q_warc_roundtrip",
    "q_robots_filter",
    "q_web_pipeline",
    "q_stream_warc_ingest",
    # 10-15: freshness window, wave 2 — stalest green (all last green r1)
    "q_latest_global",
    "q_tumble_offset",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    # 16-50: IMMUTABLE cross-section
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
    # 51-65: displaced from the r11 window (all green in CORRECTNESS_r11)
    "q_filter_map_project",
    "q_flat_map_tokens",
    "q_top_k_global",
    "q_distinct_exact",
    "q_distinct_rows",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q7_volume_shipping",
    "q19_discounted_revenue",
    "q4_order_priority",
    "q14_promo_revenue",
    "q_side_multimap",
    "q_partition_tags",
    "q_try_map",
    "q_bottom_k_per_key",
    # 66-80: displaced from the r10 window (all green in CORRECTNESS_r10)
    "q_scan_float_key",
    "q_dedup_incremental",
    "q_stream_dedup_index",
    "q_contrastive_pairs",
    "q_leakage_safe_split",
    "q_ann_pq",
    "q_lm_score",
    "q_collocations",
    "q_retention",
    "q_ewma",
    "q_zscore_anomaly",
    "q_price_histogram",
    "q_fingerprint",
    "q_table_diff",
    "q_compaction",
    # 81-95: displaced from the r9 window (all green in CORRECTNESS_r09)
    "q_prefix_scan",
    "q_token_packing",
    "q_scan_string_key",
    "q_shard_export",
    "q_arrow_ipc",
    "q_orc",
    "q_cdc_merge",
    "q_rollup_merge",
    "q_warehouse_pipeline",
    "q_funnel",
    "q_pca_gram",
    "q_frequent_pairs",
    "q_substring_scrub",
    "q_bloom_skip",
    "q_unicode_norm",
    # 96-108: displaced from the r8 window (all green in CORRECTNESS_r08)
    "q_weighted_sample",
    "q_jpeg_progressive",
    "q_mpeg_probe",
    "q_flac_decode",
    "q_safetensors",
    "q_triangle_count",
    "q_clustering_coeff",
    "q_link_prediction",
    "q_kcenter",
    "q_editdist_join",
    "q_scd2_merge",
    "q_line_dedup",
    "q_phrase_search",
    # 109-121: displaced from the r7 window (all green in CORRECTNESS_r07)
    "q_bpe_tokenize",
    "q_jpeg_decode",
    "q_substring_spans",
    "q_scd2",
    "q_cdc_apply",
    "q_rollup_cascade",
    "q_pagerank",
    "q_profile_table",
    "q_ann_ivfpq",
    "q_stream_enrich",
    "q_stream_cdc",
    "q_stream_left_join",
    "q_stream_sink",
    # 122-133: displaced from the r6 window (all green in CORRECTNESS_r06)
    "q_winnow_fingerprints",
    "q_token_counts",
    "q_audio_decode",
    "q_semantic_dedup",
    "q_dsir_weights",
    "q_pretrain_pipeline",
    "q_kmv_setops",
    "q_stream_join",
    "q_tfidf_topterms",
    "q_webdataset",
    "q_tar_image_pipeline",
    "q_asof_join",
    # 134-145: displaced from the r5 window (all green in CORRECTNESS_r05)
    "q_winnow_match",
    "q_stream_dedup",
    "q_image_decode",
    "q_image_resize",
    "q_video_frame_sample",
    "q_cms_counts",
    "q_bm25_rational",
    "q_ann_int8",
    "q_train_split",
    "q_avro",
    "q_simhash_fingerprints",
    "q_interval_join",
    # 146-155: displaced from the r4 window (all green in CORRECTNESS_r04)
    "q_setsim_search",
    "q_corpus_clean",
    "q_ts_motif",
    "q_crossshard_dedup",
    "q_quality_pipeline",
    "q_repetition_filter",
    "q_asof_forward",
    "q_asof_nearest",
    "q_stream_session",
    "q_stream_sliding",
    # 156-167: displaced from the r3 window (all green in CORRECTNESS_r03)
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
]

# Slots 16-50 must NEVER change, regardless of window rotation.
IMMUTABLE_16_50 = FROZEN_PREFIX[15:50]


def test_prefix_is_frozen():
    assert CANONICAL_ORDER == FROZEN_PREFIX, (
        "CANONICAL_ORDER changed — slots 16-50 are immutable and slots 1-15 "
        "may only change via the documented per-round rotation policy"
    )


def test_immutable_cross_section():
    assert CANONICAL_ORDER[15:50] == IMMUTABLE_16_50


def test_registry_enumerates_prefix_first():
    names = list(QUERIES)
    assert names[: len(FROZEN_PREFIX)] == FROZEN_PREFIX


def test_order_is_deterministic_and_complete():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(CANONICAL_ORDER) <= set(names)


def test_docs_registry_count_matches():
    """COVERAGE.md and README.md state the registry size; round-5 verdict
    caught COVERAGE.md drifting (said 134 while the registry was 144) —
    pin both docs to ``len(QUERIES)`` so they can't drift again."""
    import re
    from pathlib import Path

    n = len(QUERIES)
    root = Path(__file__).resolve().parent.parent
    for doc in ("COVERAGE.md", "README.md"):
        text = (root / doc).read_text()
        stated = {int(m) for m in re.findall(r"(\d+)\s+registry quer", text)}
        assert stated == {n}, (
            f"{doc} states registry size(s) {stated or '{}'} but the "
            f"registry has {n} queries — update the doc"
        )
