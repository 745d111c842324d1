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
# the head of the ordering is a per-round curated window.  Round 2's window
# covered one representative per family (all 50 green in
# CORRECTNESS_r02.json); round 3 keeps the 4 XML round-trips pinned (the
# reference-derived §2A surface must stay checked every round) and rotates
# the other 46 slots to queries with NO driver verdict in any prior round,
# plus every query whose semantics changed this round (the PPM-decoding
# image features, the wide-signature connected components, the
# exact-vs-LSH cosine pair split).  COVERAGE GAP (by design of the 50-slot
# window): the ~90 out-of-window queries are verified only by the local
# strict gate — run `python tools/check_correctness.py` (all queries,
# same compare as the driver) before shipping a round; rotation retires
# the gap across rounds.  Queries ADDED in round 3 after the window was
# fixed (dedup_substring_spans/_coverage_by_source/_cut_text,
# similarity_recall_vs_exact, dedup_minhash_signatures) are strict-gate
# green and first in line for the round-4 window.
_PRIORITY = [
    # §2A reference surface (pinned every round)
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_lineitem_array",
    # new/changed semantics this round
    "multimodal_image_features",
    "dedup_connected_components",
    "dedup_simhash_wide_signatures",
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_cosine_pairs_lsh",
    # TPC-H shapes never driver-checked
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_excess_shippers",
    # relational tail: json/setops/aggs/unpivot/lateral/scalar
    "json_variant_shred_props",
    "setop_except_all_statuses",
    "agg_histogram_totalprice",
    "agg_stats_moments",
    "unpivot_lineitem_measures",
    "lateral_top2_orders_per_customer",
    "scalar_map_functions",
    # window/analytic tail
    "window_rank_dense_ntile",
    "window_running_total_per_customer",
    "window_lag_lead_order_gaps",
    "window_range_frame_value_band",
    "window_sliding_1h_30m_events",
    "analytic_weekly_retention_cohorts",
    "analytic_zscore_anomalies",
    # mutation / temporal tail
    "merge_upsert_orders",
    "scd2_customer_priority_history",
    "sessionize_events_30m",
    "temporal_gapfill_locf",
    "temporal_gapfill_interpolate",
    # dedup/similarity/graph tail
    "dedup_simhash_signatures",
    "dedup_levenshtein_pairs",
    "graph_components_dup_groups",
    "similarity_centroid_per_label",
    "similarity_rplsh_signatures",
    "similarity_ivf_assign_cells",
    "similarity_topk_ivf_multiprobe",
    # text tail
    "text_token_count_bpe",
    "text_rolling_hash_fingerprint",
    "text_quality_filter",
    "text_pii_scrub",
    "text_decontaminate_overlap",
    "text_langid_confusion",
    "text_repetition_filter",
    # multimodal / mixing / packing tail
    "multimodal_audio_framing",
    "multimodal_image_resize_plan",
    "mix_weighted_corpus",
    "sample_stratified_quota",
    "pack_greedy_shardlocal",
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
