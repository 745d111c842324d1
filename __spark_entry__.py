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
# the head of the ordering is a per-round curated window.  Rounds 2-4 put a
# green driver verdict on 171 of the 204 round-4 registry entries (0 red,
# cumulative).  The ROUND-5 window (exactly 50): the 4 XML round-trips stay
# pinned (the reference-derived §2A surface must stay checked every round),
# the next 33 slots are EVERY query that had no driver verdict in rounds
# 1-4 (the round-4 late additions, per VERDICT r4 gap #1), 2 slots re-check
# the pair-memo path round 5 rekeyed (its other consumers — drop_list,
# rate_by_source, keeper_by_quality — already hold r2-r4 green verdicts and
# yielded their slots), and the final 11 slots are every query ADDED in
# round 5.  A green window therefore gives every registry entry as of the
# window freeze >=1 driver verdict across rounds 2-5; queries added after
# the freeze (formats_partition_pruned_read) are strict-gate green locally
# and queued for the round-6 window.
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
    # the 33 never-driver-checked round-4 late additions (VERDICT r4 #1)
    "analytic_time_to_convert",
    "analytic_burst_rate_outliers",
    "analytic_cohort_ltv_triangle",
    "analytic_interpurchase_gaps",
    "analytic_event_path_top3",
    "analytic_user_survival_weeks",
    "analytic_yoy_revenue_growth",
    "analytic_order_backlog_sweep",
    "temporal_seasonality_dow_hour",
    "window_sliding_24h_distinct_users",
    "embedding_unitnorm_check",
    "similarity_pq_distortion",
    "similarity_knn_mutual_degree",
    "similarity_ivf_cell_balance",
    "similarity_triplet_hardest",
    "similarity_triplet_lsh_negatives",
    "dedup_threshold_sweep",
    "dedup_winnowing_pairs",
    "dedup_group_size_histogram",
    "dedup_source_overlap_matrix",
    "dedup_group_lang_purity",
    "mix_epoch_plan",
    "mix_soft_dedup_weights",
    "text_unigram_entropy",
    "text_length_histogram",
    "text_jsd_by_source",
    "text_zipf_slope",
    "text_cms_heavy_hitters",
    "profile_documents_table",
    "tokenizer_vocab_coverage",
    "agg_mode_status_by_priority",
    "pack_efficiency_report",
    "dq_referential_orphans",
    # re-checks: code round 5 touched the pair-memo keying + bounded dict
    # (jaccard chain) and the cosine count-cache clear hook; these two
    # consume that memo path (drop_list/rate_by_source/keeper_by_quality,
    # also memo consumers, already have r2-r4 green verdicts and yielded
    # their slots to the never-checked round-5 queries below)
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_cosine_pairs",
    # new queries this round (never driver-checked)
    "multimodal_image_features_png",
    "similarity_index_delta_assign",
    "embedding_pq_residual_encode",
    "similarity_pq_residual_distortion",
    "text_ngram_novelty",
    "dedup_containment_pairs",
    "analytic_basket_lift",
    "dq_contract_orders",
    "text_dedup_effective_tokens",
    "similarity_topk_ivfpq_residual_adc",
    "agg_approx_percentile_accuracy",
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
