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
    # --- round-9 order (VERDICT r8 'Next round' #1): brand-new queries
    # with NO driver proof first ---
    "q_er_candidate_pairs", "q_er_clusters", "q_er_golden_record",
    "q_zip_members", "q_bloom_prune_scan", "q_image_phash_bmp",
    "q_triangle_stats", "q_cms_heavy_hitters", "q_stream_zip_gate",
    "q_er_match_increment", "q_zorder_pruning", "q_frequent_itempairs",
    "q_audio_g711_stats", "q_bm25_prf", "q_image_phash_ppm",
    "q_als_half_step", "q_stream_er_gate", "q_stream_cms",
    "q_quality_clf_from_model", "q_bloom_from_store", "q_flac_meta",
    "q_hll_distinct", "q_holt_forecast", "q_personalized_pagerank",
    "q_l_diversity", "q_local_clustering", "q_range_join_events",
    "q_market_share", "q_er_supplier_pairs",
    "q_trimmed_mean_prices", "q_markov_transitions",
    "q_benford_prices", "q_revenue_gini", "q_hll_merge",
    "q_decile_bins", "q_abc_classification", "q_new_vs_repeat",
    "q_bpe_from_merges", "q_unigram_from_vocab", "q_video_frag_hashes",
    "q_li_recall_check", "q_incremental_image_dedup", "q_image_phash_gif",
    # --- plans changed in round 9 (values unchanged, re-certify):
    # decimal-accumulated JL sums; video_neardup's frame-coverage
    # joins (+ its cluster consumer); the value-histogram cardinality
    # guard's eager checkpoint in curriculum/PSI ---
    "q_embed_random_projection", "q_video_neardup",
    "q_video_dup_clusters", "q_curriculum_order", "q_psi_drift",
    # --- newest green row is ROUND 4 (the 20 the r8 budget cut),
    # cheapest first per a same-day sf0.01 sweep, streaming last ---
    "q_kmeans_one_step", "q_cross_source_dups", "q_bm25_topk",
    "q_embed_ann_multiprobe", "q_hybrid_rrf", "q_dedup_containment",
    "q_compressed_ann_recall", "q_embed_pq_topk",
    "q_incremental_dedup_verified", "q_ann_recall_check",
    "q_dedup_keep_best", "q_bm25_from_index", "q_dedup_prefix_jaccard",
    "q_embed_ivf_from_index", "q_dup_cluster_stats",
    "q_minhash_estimate_error", "q_lsh_recall_check",
    "q_embed_ivf_kmeans", "q_stream_sliding_counts",
    "q_stream_click_attribution",
    # --- the next-oldest tier (newest green row ROUND 5, 43 rows):
    # head of it here up to the ~50-row budget, cheapest first by
    # recorded bench floors; the cutoff's tail rotates forward in r10 ---
    "q_repetition_signals", "q_text_quality", "q_explode_part_tokens",
    "q_dedup_latest_event", "q_zipf_slope", "q_topk_orders_per_segment",
    "q_dedup_embed_cosine", "q_decontaminate", "q_knn_graph",
    "q5_revenue_by_nation", "q_incremental_dedup", "q_dedup_minhash_lsh",
    "q_char_entropy", "q_semdedup_keep", "q2_filter_projection",
    "q_count_pushdown", "q_scalar_functions", "q_token_count",
    "q_lang_id", "q_semi_join_reviewed", "q_anti_join_no_orders",
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
