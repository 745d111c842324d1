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
# the head of the ordering is a per-round curated window.  ROUND-8 window
# (r7 verdict task #3): the 4 XML round-trips stay pinned (the
# reference-derived §2A surface — the wildcard query now also locks the
# engine="python" iterparse kernel, since root-wildcard specs auto-dispatch
# to the new JVM hybrid); 4 slots are the queries ADDED in round 8 (the
# hybrid-path wildcard/Tag twin, the CreateParser struct UDTF, and the two
# persisted-protocol twins — postings-probed delta pairs, stored-label CC
# fold), keeping cumulative driver coverage complete at 231/231; the other
# 42 are the STALEST standing verdicts, computed by joining
# CORRECTNESS_r01..r07 for each query's newest green round — ALL 5
# remaining r1-era and ALL 36 r2-era verdicts are refreshed this round,
# plus the oldest r3-era one.
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # §2A reference surface (pinned every round)
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_lineitem_array",
    # new queries this round (never driver-checked)
    "xml_roundtrip_wildcard_tag_events_jvm",
    "xml_udtf_orders_struct",
    "dedup_pairs_delta_postings",
    "graph_components_incremental_persisted",
    # stalest re-checks: last driver green was round 1
    "scalar_array_functions",
    "scalar_math_functions",
    "setop_except_nations",
    "setop_intersect_nations",
    "subquery_scalar_above_avg_price",
    # stalest re-checks: last driver green was round 2
    "embedding_int8_quantize",
    "formats_roundtrip_orders",
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
    "scalar_string_functions",
    "setop_union_all_keys",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "sort_top20_orders",
    "subquery_exists_urgent_customers",
    "temporal_ewma_per_user",
    "temporal_rollup_multires",
    "text_langid_documents",
    "text_stats_documents",
    "text_tfidf_top_terms",
    "window_session_10m_events",
    "window_topk_orders_per_customer",
    "window_trailing_7day_revenue",
    "window_tumbling_hourly_events",
    # stalest re-check: last driver green was round 3 (oldest one)
    "agg_histogram_totalprice",
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
