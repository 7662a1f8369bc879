"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_ender_turing_spark``; this file only adapts
the engine's query catalog to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_ender_turing_spark.plans import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-way join + agg
    (broadcast dims, decimal-exact sums) — q5_revenue_by_nation."""
    return CATALOG["q5_revenue_by_nation"].builder(spark, "/root/testdata/sf0.001")


# The driver verifies queries in dict order and stops at a budget cutoff
# (~50 queries). Surface queries with no green certification yet FIRST, so
# a cutoff lands on already-proven ones instead of leaving the newest
# operators as unverified claims.
_VERIFY_FIRST: tuple[str, ...] = (
    # never driver-certified (registered past earlier rounds' cutoffs, or
    # ERR'd): these 9 lead round 4; cheapest first so a TIME-based cutoff
    # also gets through them
    "q_stats_moments", "q_group_token_budget", "q_kmeans_one_step",
    "q_embed_pq_codes", "q_embed_pq_topk", "q_embed_ann_multiprobe",
    "q_dedup_prefix_jaccard", "q_incremental_dedup_verified",
    "q_embed_ivf_kmeans",
    # new in round 4 (never driver-run)
    "q_gopher_rules", "q_source_head_cap", "q_weighted_sample",
    "q_stream_enriched_segments", "q_span_dedup_stats",
    "q_quality_classifier", "q_bm25_topk", "q_cross_source_dups",
    "q_hybrid_rrf", "q_stream_click_attribution",
    "q_funnel_conversion", "q_cohort_retention", "q_scd2_intervals",
    "q_unpivot_metrics", "q_sliding_window_counts",
    "q_bm25_from_index", "q_embed_ivf_from_index", "q_dedup_containment", "q_bigram_coherence", "q_equidepth_histogram", "q_hourly_anomalies", "q_stream_sliding_counts", "q_constraint_audit", "q_dedup_keep_best", "q_table_reconcile", "q_temperature_mixture", "q_embed_matryoshka_topk",
    "q_embed_binary_topk", "q_k_anonymity", "q_train_val_test_split", "q_funnel_windowed",
    "q_chi_square_lang_source", "q_lsh_recall_check", "q_ann_recall_check", "q_compressed_ann_recall", "q_minhash_estimate_error", "q_dup_cluster_stats",
    # driver-red in r3, fixed this round (BIGINT cast / array->csv), plus
    # q_date_spine_orders whose output type changed (date -> timestamp)
    "q_sessionize_events", "q_embed_quantize", "q_date_spine_orders",
    # green in r2 but not re-run since (rotate proofs fresh)
    "q_json_extract_props", "q_scalar_functions", "q_pivot_event_types",
    "q_set_intersect_except", "q_count_pushdown", "q_explode_part_tokens",
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_dedup_simhash_pairs", "q_dedup_ngram_jaccard", "q_dedup_lsh_jaccard",
    "q_dup_clusters", "q_dedup_keep_canonical", "q_dedup_embed_cosine",
    "q_embed_cosine_topk", "q_embed_lsh_buckets", "q_embed_ivf_cells",
    "q_embed_ivf_topk", "q_embed_ann_lsh_topk", "q_text_quality",
    "q_lang_id", "q_token_count", "q_repetition_signals", "q_decontaminate",
)


def _ordered() -> list[str]:
    first = [n for n in _VERIFY_FIRST if n in CATALOG]
    return first + [n for n in CATALOG if n not in _VERIFY_FIRST]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: CATALOG[name].builder for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops
    → driver records a weaker rows-only check)."""
    return {name: CATALOG[name].oracle for name in _ordered()
            if CATALOG[name].oracle is not None}
