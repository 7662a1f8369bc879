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
    # --- round-8 order (VERDICT r7 'Next round' #1): brand-new queries
    # with NO driver proof first, then the one whose PLAN changed this
    # round, then the r4-stale rotation ---
    "q_span_longest_match", "q_quality_classifier_fit",
    "q_quality_clf_fitted_scores", "q_stream_warc_gate",
    "q_image_phash_jpeg", "q_audio_fingerprint", "q_audio_neardup",
    "q_video_frame_hashes", "q_video_neardup", "q_stream_audio_gate",
    "q_multimodal_training_set", "q_stream_video_gate",
    "q_image_phash_png", "q_embed_random_projection", "q_mp3_meta",
    "q_webdataset_pairs", "q_stream_wds_gate", "q_video_dup_clusters",
    "q_warc_gz_records", "q_late_interaction_topk", "q_ngram_novelty",
    # plan changed in round 8: the stream-static enrichment dropped its
    # scaling-table broadcast hint (values identical, plan re-gated) —
    # VERDICT r7 asks for an explicit re-certification; it is also in
    # the r4-stale tier below
    "q_stream_enriched_segments",
    # --- newest green row is ROUND 4 (48 remaining after the one
    # promoted above): the ~50-row budget covers all but the tail;
    # cheapest first, streaming last — whatever the cutoff misses
    # rotates to the front in r9 ---
    "q_date_spine_orders", "q_unpivot_metrics", "q_json_extract_props",
    "q_stats_moments", "q_k_anonymity", "q_equidepth_histogram",
    "q_chi_square_lang_source", "q_funnel_conversion", "q_cohort_retention",
    "q_funnel_windowed", "q_hourly_anomalies", "q_sliding_window_counts",
    "q_scd2_intervals", "q_constraint_audit", "q_table_reconcile",
    "q_gopher_rules", "q_bigram_coherence", "q_weighted_sample",
    "q_source_head_cap", "q_temperature_mixture", "q_train_val_test_split",
    "q_group_token_budget", "q_quality_classifier", "q_span_dedup_stats",
    "q_embed_quantize", "q_embed_binary_topk", "q_embed_matryoshka_topk",
    "q_embed_pq_codes", "q_embed_pq_topk", "q_embed_ann_multiprobe",
    "q_ann_recall_check", "q_compressed_ann_recall", "q_kmeans_one_step",
    "q_embed_ivf_kmeans", "q_embed_ivf_from_index", "q_bm25_topk",
    "q_bm25_from_index", "q_hybrid_rrf", "q_minhash_estimate_error",
    "q_lsh_recall_check", "q_dedup_containment", "q_dedup_keep_best",
    "q_dedup_prefix_jaccard", "q_dup_cluster_stats", "q_cross_source_dups",
    "q_incremental_dedup_verified",
    "q_stream_sliding_counts", "q_stream_click_attribution",
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
