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
# the head of the ordering is a per-round curated window.  ROUND-13 window
# (r12 verdict task #1): the THIRTEEN r7-stale carries LEAD the rotation
# as the r12 verdict required — all 13 live in relational.py and were the
# queries displaced from the r12 window; after r13 no query's newest
# driver verdict is older than r8.  One slot is the query ADDED in round
# 13 (SemDeDup semantic pruning over the k-center anchors); 5 slots
# re-pin queries whose CODE this round changed (multi-merge batching ->
# both tokenizer queries; the materialize lineage cut ->
# sample_kcenter_coreset; the prefix_rows extraction + streaming-append
# face -> dedup_containment_delta_prefix; the resolve_sb_modulus
# strict/warning fallback -> dedup_containment_delta).  The remaining 31
# come from the r8-stale cohort (44 members, newest driver verdict r8 by
# joining CORRECTNESS_r01..r12; alphabetical-first fill).  The 13 r8
# members that don't fit (sort_top20_orders,
# subquery_exists_urgent_customers, subquery_scalar_above_avg_price,
# temporal_ewma_per_user, temporal_rollup_multires,
# text_langid_documents, text_stats_documents, text_tfidf_top_terms,
# window_session_10m_events, window_topk_orders_per_customer,
# window_trailing_7day_revenue, window_tumbling_hourly_events,
# xml_udtf_orders_struct) carry to r14 at freshness r8 — none touched
# this round, and all are re-verified by the local strict gate below
# before shipping.
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # the thirteen r7-stale carries — they lead, per the r12 verdict
    "agg_argmax_order_per_customer",
    "agg_cube_lineitem_flags",
    "agg_distinct_counts",
    "agg_grouping_sets_mixed",
    "agg_minmax_stats",
    "distinct_order_status_priority",
    "join_anti_customers_without_orders",
    "join_cross_region_pairs",
    "join_full_outer_nation_presence",
    "q10_returned_items",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "scalar_date_functions",
    # new query this round (never driver-checked)
    "dedup_semantic_prune",
    # queries whose code round 13 changed
    "tokenizer_bpe_train_k_merges",
    "tokenizer_bpe_encode_corpus",
    "sample_kcenter_coreset",
    "dedup_containment_delta_prefix",
    "dedup_containment_delta",
    # stalest re-checks: newest driver green was round 8 (31 of 44; the
    # 13 carries to r14 are listed in the note above)
    "agg_histogram_totalprice",
    "embedding_int8_quantize",
    "formats_roundtrip_orders",
    "graph_components_incremental_persisted",
    "graph_components_minhash_groups",
    "graph_dup_group_sizes",
    "join_left_customer_order_stats",
    "json_extract_event_props",
    "multimodal_frame_sample",
    "multimodal_payload_stats",
    "pack_sequences_plan",
    "pipeline_dedup_mix_pack",
    "pivot_status_totals_by_priority",
    "q12_shipmode_priority",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q22_global_sales_opportunity",
    "q7_volume_shipping",
    "q9_product_profit",
    "q_revenue_per_nation",
    "sample_deterministic_rate",
    "sample_train_val_split",
    "scalar_array_functions",
    "scalar_math_functions",
    "scalar_string_functions",
    "setop_except_nations",
    "setop_intersect_nations",
    "setop_union_all_keys",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
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
