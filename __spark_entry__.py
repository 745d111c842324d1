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
# the head of the ordering is a per-round curated window.  Rounds 2+3
# together put a green driver verdict on 126 of the 147 registered queries;
# round 4's window closes the gap: the 4 XML round-trips stay pinned (the
# reference-derived §2A surface must stay checked every round), the next 21
# slots are every query that has NEVER had a driver verdict (the round-3
# late additions plus 15 rotation leftovers, and agg_approx_distinct — the
# one ever-checked-never-green row, r1 `err: no_oracle`, which has an exact
# oracle since round 2), then every query ADDED in round 4 (incremental
# MinHash, token-budget mix, semantic groups, DAU/WAU, temperature mixing,
# deterministic shuffle, sliding-window chunking, chunk-level + frame-level
# dedup, bucketized interval join, Bloom decontamination, BM25 retrieval,
# bigram-LM perplexity filter, quality keeper, salted skew join, chunk->pack
# pipeline, Markov transition matrix, PQ encode + ADC search), and the
# remaining slots re-check queries whose
# code round 4 touched (cosine-pair size guardrail, jaccard lineage-sever,
# connected-components driver-finisher threshold, streaming source probe).
# Rotated OUT to make room — all with green driver verdicts from earlier
# rounds: q1/q3/q9/q18/q21, asof_join_purchase_last_view,
# sessionize_events_30m, window_tumbling/sliding.  After this window lands
# green, all pre-round-4 registry entries have >=1 green driver verdict
# across rounds 2-4.  COVERAGE GAP (by design of the 50-slot
# window): out-of-window queries are verified only by the local strict gate
# — run `python tools/check_correctness.py` (all queries, same compare as
# the driver) before shipping a round.
_PRIORITY = [
    # §2A reference surface (pinned every round)
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_lineitem_array",
    # never driver-checked in any round (20) + never-green (1)
    "profile_orders_table",
    "setop_intersect_all_statuses",
    "agg_string_concat_nations",
    "agg_approx_distinct",
    "window_moving_avg_rows_frame",
    "window_first_last_value",
    "window_percent_rank_cume_dist",
    "window_running_distinct_statuses",
    "analytic_funnel_view_click_purchase",
    "dedup_minhash_signatures",
    "similarity_rplsh_bucket_stats",
    "similarity_recall_vs_exact",
    "dedup_substring_spans",
    "dedup_substring_coverage_by_source",
    "dedup_substring_cut_text",
    "dedup_drop_list",
    "dedup_rate_by_source",
    "text_fingerprint_documents",
    "text_ngram_top100",
    "multimodal_resize_to_box",
    "mix_weighted_proportions",
    # new queries this round (incremental MinHash maintenance,
    # quality-ranked token-budget selection, semantic dedup groups)
    "dedup_minhash_delta_pairs",
    "mix_token_budget_by_quality",
    "dedup_semantic_groups",
    "analytic_active_users_dau_wau",
    "mix_temperature_rates",
    "shuffle_deterministic_order",
    "text_chunk_sliding_window",
    "dedup_chunk_exact",
    "interval_join_bucketized_incidents",
    "text_decontaminate_bloom",
    "text_bm25_topk",
    "dedup_keeper_by_quality",
    "join_salted_skewed_events_segment",
    "text_lm_bigram_score",
    "pipeline_chunk_pack",
    "analytic_event_transition_matrix",
    "embedding_pq_encode",
    "similarity_topk_pq_adc",
    "multimodal_frame_dedup",
    "tokenizer_bpe_first_merges",
    "analytic_copurchase_part_pairs",
    "analytic_rfm_segments",
    "dedup_minhash_estimate_accuracy",
    "analytic_event_pareto_share",
    # code touched this round: cosine guardrail, jaccard lineage-sever,
    # graph finisher threshold, streaming probe/restart work
    "dedup_embedding_cosine_pairs",
    # re-checks: oldest-evidence heavy hitters (r1/r2-only verdicts);
    # q1/q3/q9 rotated out this round to make room for the three new
    # training-pipeline queries above (they are r1+r2 double-green);
    # q18/q21 likewise rotated out for dedup_chunk_exact and the
    # bucketized interval join; asof re-check rotated out for the bloom
    # decontaminate
]

# QUEUED FOR THE ROUND-5 WINDOW — the 33 queries added after the round-4
# window froze, all strict-gate green locally but never driver-checked:
# analytic_{time_to_convert, burst_rate_outliers, cohort_ltv_triangle,
# interpurchase_gaps, event_path_top3, user_survival_weeks},
# temporal_seasonality_dow_hour, window_sliding_24h_distinct_users,
# embedding_unitnorm_check, similarity_{pq_distortion, knn_mutual_degree,
# ivf_cell_balance, triplet_hardest}, dedup_{threshold_sweep,
# winnowing_pairs, group_size_histogram, source_overlap_matrix,
# group_lang_purity}, mix_epoch_plan, text_{unigram_entropy,
# length_histogram, jsd_by_source, zipf_slope}, profile_documents_table,
# tokenizer_vocab_coverage, agg_mode_status_by_priority,
# pack_efficiency_report, mix_soft_dedup_weights, analytic_yoy_revenue_growth,
# dq_referential_orphans, similarity_triplet_lsh_negatives,
# text_cms_heavy_hitters, analytic_order_backlog_sweep.


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
