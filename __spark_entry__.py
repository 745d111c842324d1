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
# the head of the ordering is a per-round curated window.  ROUND-10 window
# (r9 verdict task #2): 4 slots are the queries ADDED in round 10 (the two
# xspxml-DataSource round-trips — the r9 verdict's headline task — the
# similarity index bundle, and the winnowing bucket-stats gate), keeping
# cumulative driver coverage complete at 238/238; the other 46 are the
# ENTIRE remaining stale cohort — every query whose newest driver verdict
# is r4 (45 queries) or r3 (pack_greedy_shardlocal, carried over as
# promised in the r8/r9 window notes) — computed by joining
# CORRECTNESS_r01..r09 for each query's newest green round.  After this
# round no query's newest driver verdict is older than r6 (the r9 verdict
# task's done-condition).  The 4 XML round-trips that previous rounds
# pinned are all r9-fresh and rotate out for exactly one round to make
# the arithmetic work: 4 new + 46 stale = 50.
# COVERAGE GAP (by design of the 50-slot window): out-of-window queries
# are verified only by the local strict gate — run `python
# tools/check_correctness.py` (all queries, same compare as the driver)
# before shipping a round.
_PRIORITY = [
    # new queries this round (never driver-checked)
    "xspxml_roundtrip_orders",
    "xspxml_partition_pruned_read",
    "similarity_index_bundle",
    "dedup_winnowing_bucket_stats",
    # stalest re-checks: last driver green was round 3
    "pack_greedy_shardlocal",
    # stalest re-checks: last driver green was round 4
    "agg_approx_distinct",
    "agg_string_concat_nations",
    "analytic_active_users_dau_wau",
    "analytic_copurchase_part_pairs",
    "analytic_event_pareto_share",
    "analytic_event_transition_matrix",
    "analytic_funnel_view_click_purchase",
    "analytic_rfm_segments",
    "dedup_chunk_exact",
    "dedup_drop_list",
    "dedup_keeper_by_quality",
    "dedup_minhash_delta_pairs",
    "dedup_minhash_estimate_accuracy",
    "dedup_minhash_signatures",
    "dedup_rate_by_source",
    "dedup_semantic_groups",
    "dedup_substring_coverage_by_source",
    "dedup_substring_cut_text",
    "dedup_substring_spans",
    "embedding_pq_encode",
    "interval_join_bucketized_incidents",
    "join_salted_skewed_events_segment",
    "mix_temperature_rates",
    "mix_token_budget_by_quality",
    "mix_weighted_proportions",
    "multimodal_frame_dedup",
    "multimodal_resize_to_box",
    "pipeline_chunk_pack",
    "profile_orders_table",
    "setop_intersect_all_statuses",
    "shuffle_deterministic_order",
    "similarity_recall_vs_exact",
    "similarity_rplsh_bucket_stats",
    "similarity_topk_pq_adc",
    "text_bm25_topk",
    "text_chunk_sliding_window",
    "text_decontaminate_bloom",
    "text_fingerprint_documents",
    "text_lm_bigram_score",
    "text_ngram_top100",
    "tokenizer_bpe_first_merges",
    "window_first_last_value",
    "window_moving_avg_rows_frame",
    "window_percent_rank_cume_dist",
    "window_running_distinct_statuses",
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
