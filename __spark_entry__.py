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
    # --- round-11 rotation (r10 VERDICT 'Next round' #1 + ADVICE #4).
    # Plan-CHANGED queries lead (their newest driver rows certify the
    # old plans): the four ER paths re-shaped this round (star-fallback
    # CSE fix + short-zone sentinel bucket; probe-length pruning +
    # distinct removal + single-scan feed), the JL projection (BIGINT
    # grid fold r10 + the |v| bound guard this round), and the two
    # remaining r10 plan changes ADVICE flagged as never re-certified
    # (round6s Holt spelling, integer-div z-order file ids).
    # round-11's one genuinely new row leads (no driver proof at all):
    # the cross-epoch golden fold-back certification
    "q_er_golden_cross_epoch",
    "q_er_indel_pairs", "q_er_match_increment", "q_er_golden_increment",
    "q_stream_er_gate", "q_embed_random_projection", "q_holt_forecast",
    "q_zorder_pruning",
    # plan-changed late in round 11: the persisted symmetrized edge
    # list under the triangle machinery, and the single-scan
    # dirty_customers fixture under the 4-stage linkage chain
    "q_local_clustering", "q_triangle_stats",
    "q_er_golden_record", "q_er_clusters", "q_er_candidate_pairs",
    # --- newest driver row = ROUND 5 (19), cheapest-first by the r10
    # full-sweep sf0.01 timings — the tier this round must drain to 0 ---
    "q_dedup_minhash_lsh", "q_semi_join_reviewed", "q_dedup_embed_cosine",
    "q_semdedup_keep", "q_event_lag_chain", "q_embed_ivf_topk",
    "q_rank_battery", "q_topk_orders_per_segment", "q_dedup_lsh_jaccard",
    "q_dedup_exact", "q_dedup_keep_canonical", "q_lang_id",
    "q_rolling_30d_window", "q_dedup_ngram_jaccard", "q_dedup_simhash",
    "q_dup_clusters", "q_dedup_simhash_pairs", "q5_revenue_by_nation",
    "q_dedup_multi_signal",
    # --- newest driver row = ROUND 6 (45), cheapest-first: the budget
    # tail lands here (~24 of 45; round 12 finishes the drain) ---
    "q_html_extract", "q_corpus_manifest", "q_shard_balance",
    "q_card_redact", "q_pack_efficiency", "q_url_dedup",
    "q_bpe_pair_counts", "q_sitemap_urls", "q_extract_links",
    "q_url_parse", "q_rollup_order_status", "q_unimax_allocation",
    "q_ngram_lm_counts", "q_hourly_event_rollup", "q_class_tfidf",
    "q_robots_filter", "q_domain_stats", "q_asof_prev_purchase",
    "q_paragraph_dedup", "q_skew_salted_distinct", "q_embed_drift",
    "q_anchor_terms", "q_domain_blocklist", "q_contamination_report",
    "q_margin_mining", "q_dsir_topk", "q_unimax_sample",
    "q_prototype_prune", "q_dsir_weights", "q_stream_source_cap",
    "q_curation_attrition", "q_lm_scores", "q_doremi_step",
    "q_lang_confusion", "q_quality_ensemble", "q_bpe_merges", "q_text_nfc",
    "q_lm_ccnet_gate", "q_stream_neardup_gate", "q_bpe_encode",
    "q_tokenizer_fertility", "q_domain_pagerank", "q_ccnet_buckets",
    "q_llm_training_set", "q_stream_lm_scores",
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
