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
# the head of the ordering is a per-round curated window.  ROUND-9 window
# (r8 verdict task #2): the 4 XML round-trips stay pinned (the
# reference-derived §2A surface); 3 slots are the queries ADDED in round
# 9 (the GenericTest-shaped hetero-meta pair — python kernel + the new
# below-root hybrid — and the dedup report bundle), keeping cumulative
# driver coverage complete at 234/234; the other 43 are the STALEST
# standing verdicts, computed by joining CORRECTNESS_r01..r08 for each
# query's newest green round — 43 of the 44 remaining r3-era verdicts.
# The one r3-era query left out for space, pack_greedy_shardlocal, was
# independently strict-oracle-verified by the round-8 judge this round
# (VERDICT.md spot-check, 8/8 green) and is pinned by a recursive-CTE
# oracle pytest; it rotates in next round with the r4 cohort.
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
    "xml_roundtrip_hetero_meta",
    "xml_roundtrip_hetero_meta_jvm",
    "dedup_report_bundle",
    # stalest re-checks: last driver green was round 3
    "agg_stats_moments",
    "analytic_weekly_retention_cohorts",
    "analytic_zscore_anomalies",
    "dedup_connected_components",
    "dedup_embedding_cosine_pairs_lsh",
    "dedup_levenshtein_pairs",
    "dedup_simhash_signatures",
    "dedup_simhash_wide_signatures",
    "graph_components_dup_groups",
    "json_variant_shred_props",
    "lateral_top2_orders_per_customer",
    "merge_upsert_orders",
    "mix_weighted_corpus",
    "multimodal_audio_framing",
    "multimodal_image_features",
    "multimodal_image_resize_plan",
    "q11_important_stock",
    "q20_excess_shippers",
    "q2_min_cost_supplier",
    "sample_stratified_quota",
    "scalar_map_functions",
    "scd2_customer_priority_history",
    "sessionize_events_30m",
    "setop_except_all_statuses",
    "similarity_centroid_per_label",
    "similarity_ivf_assign_cells",
    "similarity_rplsh_signatures",
    "similarity_topk_ivf_multiprobe",
    "temporal_gapfill_interpolate",
    "temporal_gapfill_locf",
    "text_decontaminate_overlap",
    "text_langid_confusion",
    "text_pii_scrub",
    "text_quality_filter",
    "text_repetition_filter",
    "text_rolling_hash_fingerprint",
    "text_token_count_bpe",
    "unpivot_lineitem_measures",
    "window_lag_lead_order_gaps",
    "window_range_frame_value_band",
    "window_rank_dense_ntile",
    "window_running_total_per_customer",
    "window_sliding_1h_30m_events",
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
