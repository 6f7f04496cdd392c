"""Query suite package: importing it registers every query into QUERIES."""

from ironbeam_spark.suite.registry import QUERIES, Query, query

from ironbeam_spark.suite import (  # noqa: E402,F401
    core,
    extended,
    mm_stream,
    production,
    sketches,
    relational,
    text_ml,
    udf_batch,
    windowed,
    temporal,  # these two stay last: they register after the driver's
    llmops,    # 50-query window and earn driver rows next round
)

# The driver's correctness gate checks the first 50 registry entries
# (CORRECTNESS_r01.json contains exactly the first 50 names in registration
# order).  Round-robin coverage across rounds: enumerate everything that has
# NOT yet earned a green driver row first — the 43 round-1-unchecked queries,
# the 2 round-1 error rows (both fixed), and any newly added queries — and
# push the 48 round-1-green names to the back.
_R1_GREEN = [
    "q1_pricing_summary", "q_global_agg", "q_filter_map_project",
    "q_flat_map_tokens", "q_join_inner", "q_join_left_nulls", "q_join_anti",
    "q_top_k_global", "q_top_k_per_key", "q_distinct_exact",
    "q_distinct_rows", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q12_shipmode_priority",
    "q7_volume_shipping", "q19_discounted_revenue", "q4_order_priority",
    "q14_promo_revenue", "q18_large_volume_customers", "q_side_multimap",
    "q_partition_tags", "q_try_map", "q_to_dict", "q_bottom_k_per_key",
    "q_latest_global", "q_tumble_offset", "q8_market_share",
    "q9_product_profit", "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q11_important_stock", "q16_supplier_part_counts",
    "q20_excess_stock_suppliers", "q_multimodal_meta", "q_multimodal_decode",
    "q_sample_reservoir", "q_sample_fraction", "q_sample_per_key",
    "q_dead_letter", "q_validate", "q_regex_suite", "q_side_input_map",
]


def _reorder_for_driver_gate() -> None:
    green = set(_R1_GREEN)
    first = [n for n in QUERIES if n not in green]
    last = [n for n in QUERIES if n in green]
    ordered = {n: QUERIES[n] for n in first + last}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_for_driver_gate()

__all__ = ["QUERIES", "Query", "query"]
