"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``xmlstreamprocessor_spark/operators/`` and register
themselves into a single REGISTRY (see operators/registry.py for the
cross-engine exactness rules: decimal aggregation, rounded ratios,
string-formatted timestamps).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402

# The driver hash-verifies the FIRST 50 entries of queries() each round, so
# the head of the ordering is a per-round curated window.  ROUND-12 window
# (r11 verdict task #2): 4 slots are the queries ADDED in round 12 (DSIR
# importance resampling, the MRL funnel cascade, the containment delta's
# persisted-prefix protocol, the greedy k-center coreset); the SIX
# r6-stale carries LEAD the rotation
# as the r11 verdict required (agg_approx_percentile_accuracy,
# analytic_cohort_ltv_triangle, multimodal_image_features_png,
# similarity_topk_ivfpq_residual_adc, tokenizer_vocab_coverage,
# window_sliding_24h_distinct_users — after r12 no query's newest driver
# verdict is older than r7); 7 slots re-pin queries whose CODE this round
# changed (the overlay BPE trainer -> both tokenizer queries; the fused
# xspxml writer escape -> both xspxml round-trips; the explicit-broadcast
# rerank -> similarity_topk_mrl_rerank; the sb-helper refactor ->
# dedup_pairs_delta_postings; the pruned-artifact branch ->
# dedup_containment_delta); the remaining 33 come from the r7-stale
# cohort (46 members, newest driver verdict r7 by joining
# CORRECTNESS_r01..r11; 33 fit after the 4th new query), including its
# two members this round touched
# (similarity_topk_ivfpq_rerank — explicit broadcast — and
# dedup_pairs_delta — refactored helper).  The 12 r7 members that don't
# fit (agg_argmax_order_per_customer, agg_cube_lineitem_flags,
# agg_distinct_counts, agg_grouping_sets_mixed, agg_minmax_stats,
# distinct_order_status_priority, join_anti_customers_without_orders,
# join_cross_region_pairs, join_full_outer_nation_presence,
# q10_returned_items, q13_customer_order_distribution, q14_promo_revenue)
# carry to r13 — as does scalar_date_functions, displaced by the 4th new
# query (sample_kcenter_coreset): all 13 live in relational.py —
# untouched this round — and all are re-verified by the local strict
# gate below before shipping.
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # the six r6-stale carries — they lead, per the r11 verdict
    "agg_approx_percentile_accuracy",
    "analytic_cohort_ltv_triangle",
    "multimodal_image_features_png",
    "similarity_topk_ivfpq_residual_adc",
    "tokenizer_vocab_coverage",
    "window_sliding_24h_distinct_users",
    # new queries this round (never driver-checked)
    "mix_dsir_importance_resample",
    "similarity_topk_mrl_funnel",
    "dedup_containment_delta_prefix",
    "sample_kcenter_coreset",
    # queries whose code round 12 changed
    "tokenizer_bpe_train_k_merges",
    "tokenizer_bpe_encode_corpus",
    "xspxml_roundtrip_orders",
    "xspxml_partition_pruned_read",
    "similarity_topk_mrl_rerank",
    "dedup_pairs_delta_postings",
    "dedup_containment_delta",
    # stalest re-checks: newest driver green was round 7 (33 of 46; the
    # 13 relational.py carries are listed in the note above)
    "agg_percentiles_price_by_returnflag",
    "agg_rollup_order_year_priority",
    "agg_salted_skewed_event_totals",
    "analytic_new_vs_returning_weekly",
    "asof_forward_view_next_purchase",
    "asof_join_purchase_last_view",
    "dedup_exact_documents",
    "dedup_lsh_band_stats",
    "dedup_lsh_plan",
    "dedup_minhash_lsh_pairs",
    "dedup_pairs_delta",
    "dedup_simhash_pairs",
    "formats_bucketed_join_no_shuffle",
    "formats_partition_pruned_read",
    "graph_components_incremental",
    "join_nonequi_price_band",
    "join_right_orders_customer_segment",
    "join_salted_skewed_fact_dim",
    "join_semi_customers_with_high_value_order",
    "pipeline_drop_contained_stats",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q8_market_share",
    "sample_leakage_free_split",
    "similarity_topk_ivfpq_rerank",
    "subquery_in_top_nations",
    "xml_udtf_lineitem_array",
]


def _ordered() -> list[str]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return _PRIORITY + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["q_revenue_per_nation"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name][0] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (others get
    the driver's weaker rows-only check)."""
    return {
        name: REGISTRY[name][1]
        for name in _ordered()
        if REGISTRY[name][1] is not None
    }
