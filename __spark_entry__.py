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
# the head of the ordering is a per-round curated window.  ROUND-7 window
# (r6 verdict task #3): the 4 XML round-trips stay pinned (the
# reference-derived §2A surface — round 7 rebuilt the Python kernel's
# _eval_record, so these four are also this round's re-check targets); the
# next 7 slots are EVERY query that has never held a driver verdict in any
# round (4 carried from the un-rotated r6 window + the 3 round-6 additions)
# — a green window makes cumulative driver coverage complete for the
# round-6 registry; 5 slots are the queries ADDED in round 7 (IVFADC rerank,
# LSH band stats + S-curve plan, XML array UDTF, forward as-of); 34 are the
# STALEST re-checks (last green r1/r2, computed from CORRECTNESS_r01..r06),
# freshening the oldest verdicts in the ledger.
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # §2A reference surface (pinned every round; kernel rebuilt round 7)
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_lineitem_array",
    # never driver-checked in any round (r6 verdict "What's missing" #1)
    "formats_partition_pruned_read",
    "formats_bucketed_join_no_shuffle",
    "sample_leakage_free_split",
    "analytic_new_vs_returning_weekly",
    "dedup_pairs_delta",
    "graph_components_incremental",
    "pipeline_drop_contained_stats",
    # stalest re-checks: last driver green was round 1
    "agg_distinct_counts",
    "agg_grouping_sets_mixed",
    "agg_minmax_stats",
    "agg_percentiles_price_by_returnflag",
    "distinct_order_status_priority",
    "join_anti_customers_without_orders",
    "join_cross_region_pairs",
    "join_full_outer_nation_presence",
    "join_nonequi_price_band",
    "join_right_orders_customer_segment",
    "join_salted_skewed_fact_dim",
    "join_semi_customers_with_high_value_order",
    "q10_returned_items",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q8_market_share",
    "scalar_date_functions",
    "subquery_in_top_nations",
    # new queries this round (never driver-checked)
    "similarity_topk_ivfpq_rerank",
    "dedup_lsh_band_stats",
    "xml_udtf_lineitem_array",
    "asof_forward_view_next_purchase",
    "dedup_lsh_plan",
    # stalest re-checks: last driver green was round 2
    "agg_argmax_order_per_customer",
    "agg_cube_lineitem_flags",
    "agg_rollup_order_year_priority",
    "agg_salted_skewed_event_totals",
    "asof_join_purchase_last_view",
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
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
