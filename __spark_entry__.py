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
# the head of the ordering is a per-round curated window.  ROUND-11 window
# (r10 verdict task #2 + r10 advice #4): 6 slots are the queries ADDED in
# round 11 (the iterative BPE trainer, its apply/encode counterpart, the
# containment delta path, the MRL prefix-recall report + its two-stage
# rerank serving twin, and the snapshot
# reconciliation diff), keeping
# cumulative driver coverage complete at 244/244; 4 slots re-pin
# the XML round-trips (xml_roundtrip_orders_struct[,_jvm],
# xml_roundtrip_wildcard_tag_events[,_jvm]) after their promised
# one-round rotation out; the other 40 are the r6-stale cohort (newest
# driver verdict r6, computed by joining CORRECTNESS_r01..r10).  The r6
# cohort has 46 members — six short of fitting beside the new queries —
# so the six members that were independently strict-oracle-verified by
# the r10 judge AND whose code paths are untouched by this round's
# changes (agg_approx_percentile_accuracy, tokenizer_vocab_coverage,
# analytic_cohort_ltv_triangle, multimodal_image_features_png,
# window_sliding_24h_distinct_users, similarity_topk_ivfpq_residual_adc
# — the last one lives in a module this round touched, but purely
# additively: no helper it consumes changed) carry to
# the r12 window; every other r6 query rotates in now, including every
# consumer of the exact-Jaccard kernel this round modifies
# (dedup_ngram_jaccard_pairs, dedup_winnowing_pairs,
# dedup_containment_pairs, dedup_threshold_sweep).
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # new queries this round (never driver-checked)
    "tokenizer_bpe_train_k_merges",
    "tokenizer_bpe_encode_corpus",
    "dedup_containment_delta",
    "similarity_mrl_prefix_recall",
    "similarity_topk_mrl_rerank",
    "dq_snapshot_diff",
    # the 4 XML round-trips, re-pinned after their one-round rotation
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_wildcard_tag_events_jvm",
    # stalest re-checks: last driver green was round 6 (40 of 46; see note)
    "agg_mode_status_by_priority",
    "analytic_basket_lift",
    "analytic_burst_rate_outliers",
    "analytic_event_path_top3",
    "analytic_interpurchase_gaps",
    "analytic_order_backlog_sweep",
    "analytic_time_to_convert",
    "analytic_user_survival_weeks",
    "analytic_yoy_revenue_growth",
    "dedup_containment_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_group_lang_purity",
    "dedup_group_size_histogram",
    "dedup_ngram_jaccard_pairs",
    "dedup_source_overlap_matrix",
    "dedup_threshold_sweep",
    "dedup_winnowing_pairs",
    "dq_contract_orders",
    "dq_referential_orphans",
    "embedding_pq_residual_encode",
    "embedding_unitnorm_check",
    "mix_epoch_plan",
    "mix_soft_dedup_weights",
    "pack_efficiency_report",
    "profile_documents_table",
    "similarity_index_delta_assign",
    "similarity_ivf_cell_balance",
    "similarity_knn_mutual_degree",
    "similarity_pq_distortion",
    "similarity_pq_residual_distortion",
    "similarity_triplet_hardest",
    "similarity_triplet_lsh_negatives",
    "temporal_seasonality_dow_hour",
    "text_cms_heavy_hitters",
    "text_dedup_effective_tokens",
    "text_jsd_by_source",
    "text_length_histogram",
    "text_ngram_novelty",
    "text_unigram_entropy",
    "text_zipf_slope",
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
