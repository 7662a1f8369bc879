"""Scaling probe: how do the heavy operators behave as data grows?

Usage: python tools/scale_probe.py [sf_dir]   (default /root/testdata/sf0.1)

Replicates the documents/embeddings tables K× (ids offset to stay unique)
and times the dedup/similarity operators at 1x/2x/4x/8x volume, printing
wall seconds and the growth ratio step-over-step. Near-linear ratios
(~2.0 per doubling) are the evidence that the candidate-pruned designs
avoid the O(n²) cliff; the brute-force ANN baseline is included as the
contrast (it scans linearly too, but its cross-join row count doubles —
at real scale only the bucketed variants survive).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# the package re-exports a conform() FUNCTION that shadows the conform
# SUBMODULE on every import-as spelling — import the function directly
from etl_ender_turing_spark.operators.conform import corpus_manifest as _manifest
from etl_ender_turing_spark.operators.conform import psi_drift as _psi
from etl_ender_turing_spark.operators.conform import snapshot_diff
from etl_ender_turing_spark.functions.text_codec import nfc_normalize as _nfc
from etl_ender_turing_spark.operators import bpe
from etl_ender_turing_spark.operators import feature_hash as fh
from etl_ender_turing_spark.operators import multimodal as mm
from etl_ender_turing_spark.operators import unigram as ug
from etl_ender_turing_spark.sources import warc as wc
from etl_ender_turing_spark.operators import curation as cu
from etl_ender_turing_spark.operators import dedup as dd
from etl_ender_turing_spark.operators import dsir as dsr
from etl_ender_turing_spark.operators import graph as gr
from etl_ender_turing_spark.operators import linkage as lk
from etl_ender_turing_spark.operators import lm
from etl_ender_turing_spark.operators import sampling as sp
from etl_ender_turing_spark.operators import similarity as sim
from etl_ender_turing_spark.operators import terms as tm
from etl_ender_turing_spark.operators import textstats as ts
from etl_ender_turing_spark.operators import web as wb
from etl_ender_turing_spark.session import get_spark
from etl_ender_turing_spark.sources.readers import read_table


def force(df):
    """Evaluate the FULL rows via the noop sink — count() would let
    Catalyst prune compute-only projection columns (a pure-projection op
    like repetition_signals would time as a bare scan)."""
    df.write.format("noop").mode("overwrite").save()


def replicate(df, k: int, id_col: str):
    """k copies with disjoint id ranges (content identical per copy —
    a worst case for dedup ops: every doc gains k-1 exact near-dups)."""
    span = 10_000_000
    out = df
    for i in range(1, k):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + i * span))
    return out


def replicate_customers(cust, k: int):
    """k customer copies for the ER probes: ids offset by 1e9 (clear of
    the 10M..100M variant-offset convention) and replica NAMES
    regenerated from md5 of the new key — so copies do NOT cross-match
    (two hex zones at lev <= 2 are vanishingly rare) and the probe
    measures the ALGORITHM's growth, not a by-construction quadratic
    true-match set (identical-name replication makes the correct output
    itself O(k^2) per name)."""
    span = 1_000_000_000
    out = cust
    for i in range(1, k):
        out = out.unionByName(
            cust.withColumn("c_custkey", F.col("c_custkey") + i * span)
            .withColumn("c_name", F.expr(
                "concat('Customer#', substr(md5(CAST(c_custkey AS STRING"
                ")), 1, 9))")))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = read_table(spark, sf_dir, "documents")
    emb0 = read_table(spark, sf_dir, "embeddings")
    ev0 = read_table(spark, sf_dir, "events")
    cust0 = read_table(spark, sf_dir, "customer")
    docs0.count(), emb0.count(), ev0.count(), cust0.count()  # warm
    held = {}   # per-k side tables for ops outside the (d, e, ev) trio

    ops = {
        "exact_dedup": lambda d, e, ev: force(dd.exact_dedup_groups(d)),
        "minhash_lsh": lambda d, e, ev: force(dd.minhash_band_pairs(
            dd.minhash_signatures_inline(d))),
        "simhash_pairs": lambda d, e, ev: force(dd.simhash_pairs(
            dd.simhash_inline(d))),
        "embed_neardup": lambda d, e, ev: force(sim.neardup_pairs(e)),
        "embed_lsh_ann": lambda d, e, ev: force(sim.ann_bucketed_topk(
            e, query_id=0, k=10)),
        "repetition": lambda d, e, ev: force(ts.repetition_signals(d)),
        "decontaminate": lambda d, e, ev: force(dd.contaminated_docs(
            d.filter(F.col("doc_id") % 10_000_000 >= 20),
            d.filter(F.col("doc_id") % 10_000_000 < 20), n=5)),
        # round-3 ops: replication is the worst case for all three (every
        # copy is an exact semantic/content dup of its source row)
        "semdedup": lambda d, e, ev: force(sim.semantic_dedup_keep(e)),
        "knn_graph": lambda d, e, ev: force(sim.knn_graph(e, k=3)),
        "incr_dedup": lambda d, e, ev: force(dd.incremental_dedup_pairs(
            dd.minhash_signatures_inline(
                d.filter(F.col("doc_id") % 10_000_000 < 400)),
            dd.minhash_signatures_inline(
                d.filter(F.col("doc_id") % 10_000_000 >= 400)))),
        # round-4 ops: bm25's tf shuffle is query-term-sparse, so growth
        # should track the scan, not the token stream; the cross-source
        # matrix rides the minhash pair generator
        "bm25": lambda d, e, ev: force(tm.bm25_topk(
            d, ("vector", "stream", "join", "window"), k=5)),
        "cross_src_dups": lambda d, e, ev: force(dd.cross_source_dup_matrix(d)),
        # round-5/6 ops: url dedup is one hash shuffle (2 URL variants per
        # doc, every replica an exact canonical dup); the composed web
        # pipeline stacks every curation stage, so its ratio is the
        # whole-family scale answer; paragraph dedup's replication worst
        # case makes every paragraph k-ways duplicated; snapshot_diff
        # full-outer-joins two same-size snapshots with 10% churn
        "url_dedup": lambda d, e, ev: force(wb.url_dedup_groups(
            wb.synthesize_noisy_url_variants(d.select("doc_id")))),
        "web_curation": lambda d, e, ev: force(wb.curate_web_corpus(
            d, d.sparkSession.createDataFrame(
                [("example-1.com",), ("example-2.co.uk",)],
                "reg_domain string"))),
        "paragraph_dedup": lambda d, e, ev: force(dd.paragraph_dedup(d)),
        "snapshot_diff": lambda d, e, ev: force(snapshot_diff(
            d, d.withColumn("n_chars",
                            F.when(F.col("doc_id") % 10 == 0,
                                   F.col("n_chars") + 1)
                            .otherwise(F.col("n_chars"))),
            ["doc_id"])),
        # replication offsets user_id -> k disjoint key spaces: the
        # per-key windows multiply in count, never in size
        "consec_dedup": lambda d, e, ev: force(dd.consecutive_dedup(ev)),
        # round-6 ops: LM scoring joins a vocab-scale (replication-
        # invariant) count table against a linearly-growing position
        # stream; DSIR reduces a broadcast B-row model; BPE rounds work
        # on the distinct-word table, which replication does NOT grow —
        # its times should stay near-flat after the word_freqs scan
        # round-6 embedding additions: margin rides the bucketed knn
        # self-join (replication densifies buckets — the capped-quadratic
        # profile); prototype-prune is assignment + one melt agg + a
        # per-cell window, all ~linear with cells fixed
        "margin_mine": lambda d, e, ev: force(sim.margin_mine(
            e, k=4, n_planes=8)),
        "prototype_prune": lambda d, e, ev: force(sim.prototype_prune(
            e, k=16, per_cell=5)),
        # domain graph: replication grows the link stream linearly but
        # the node set stays domain-cardinality (28 planted domains), so
        # the 3 PageRank iterations are volume-invariant — growth should
        # track the extraction scan + one edge aggregation
        "domain_pagerank": lambda d, e, ev: force(gr.pagerank(
            wb.domain_edges(
                wb.parse_urls(wb.synthesize_planted_urls(
                    d.select("doc_id"))),
                wb.extract_links(wb.synthesize_planted_links(
                    d.select("doc_id")))),
            iters=3)),
        "lm_scores": lambda d, e, ev: force(lm.stupid_backoff_scores(
            d, lm.train_ngram_counts(d))),
        "dsir_weights": lambda d, e, ev: force(dsr.dsir_weights(
            d, n_buckets=1024)),
        "bpe_learn": lambda d, e, ev: force(bpe.bpe_learn(d, rounds=2)),
        # round-6 late additions: curriculum's value-histogram stays
        # token-length-cardinality (replication-invariant) and the
        # position pass is one range shuffle + per-partition windows, so
        # growth should track the scan; anchor profiles explode 2 planted
        # anchors/doc into a (domain, term)-keyed agg (domain set fixed
        # at 28 -> per-domain top-k frames grow linearly); the attrition
        # funnel re-times the whole q_training_set chain plus 5 stage
        # counts over checkpoint-cut frames — its ratio is the composed
        # answer, and a super-linear step here means a stage lost its cut
        "curriculum": lambda d, e, ev: force(sp.curriculum_order(
            d.select("doc_id", F.col("n_chars").alias("score")),
            "score")),
        "anchor_terms": lambda d, e, ev: force(wb.anchor_domain_terms(
            wb.extract_anchors(wb.synthesize_planted_anchors(
                d.select("doc_id"))))),
        "attrition": lambda d, e, ev: force(cu.curation_attrition(
            d, rates={}, default_rate=0.5)),
        # round-7 probes for the previously-unprobed round-6 families:
        # psi is two scans + a bucket-cardinality agg; the manifest is a
        # source-cardinality XOR reduce; robots is a broadcast-rules
        # non-equi anti join over the URL stream; crawl_budget's
        # post-corpus frames are domain-cardinality (28 planted domains),
        # so only the extraction scans should grow; shard balance is one
        # hash agg over n_shards keys; nfc is the sanctioned Arrow stage
        # (pure per-row); the span rewrite adds a gram-keyed min-owner
        # agg + an id join (replication makes every gram k-ways owned —
        # the dedup worst case); image near-dup decodes every planted PGM
        # and bands 60-bit hashes (replicas are exact hash dups)
        "psi_drift": lambda d, e, ev: force(_psi(
            d.filter(F.col("doc_id") % 10_000_000 < 400),
            d.filter(F.col("doc_id") % 10_000_000 >= 400))),
        "corpus_manifest": lambda d, e, ev: force(_manifest(d)),
        "robots_filter": lambda d, e, ev: force(wb.robots_filter(
            wb.parse_urls(wb.synthesize_planted_urls(d.select("doc_id"))),
            wb.parse_robots(wb.synthesize_planted_robots(
                d.select("doc_id"))))),
        "crawl_budget": lambda d, e, ev: force(gr.crawl_budget(
            gr.pagerank(wb.domain_edges(
                wb.parse_urls(wb.synthesize_planted_urls(
                    d.select("doc_id"))),
                wb.extract_links(wb.synthesize_planted_links(
                    d.select("doc_id")))), iters=3),
            wb.parse_urls(wb.synthesize_planted_urls(d.select("doc_id")))
            .join(d.select("doc_id", "n_chars"), "doc_id")
            .groupBy(F.col("reg_domain").alias("domain"))
            .agg(F.sum("n_chars").alias("qsum")),
            n_slots=1000)),
        "shard_balance": lambda d, e, ev: force(cu.shard_balance(
            d, n_shards=16)),
        "text_nfc": lambda d, e, ev: force(d.select(
            "doc_id", F.md5(_nfc("text")).alias("nfc_md5"))),
        "span_rewrite": lambda d, e, ev: force(dd.span_dedup_rewrite(d)),
        "image_neardup": lambda d, e, ev: force(dd.simhash_pairs(
            mm.image_dhash(mm.synthesize_planted_pgm(d.select("doc_id"))),
            max_hamming=3)),
        # round-7 second batch: the unigram trainer works on the
        # distinct-word table (replication-invariant after the word
        # count — the BPE profile); WARC parse is per-chunk Arrow work;
        # the hashed embedding is one explode + one uniform (doc, slot)
        # agg; audio decode is per-row
        "unigram_lm": lambda d, e, ev: force(ug.unigram_lm_vocab(
            d, rounds=1, v_multi=100)),
        "warc_parse": lambda d, e, ev: force(wc.parse_warc_records(
            wc.synthesize_planted_warc(d.select("doc_id", "text")))),
        "hash_embed": lambda d, e, ev: force(fh.text_hash_embed(d)),
        "audio_stats": lambda d, e, ev: force(mm.audio_sample_stats(
            mm.synthesize_planted_wav_pcm(d.select("doc_id")))),
        # round-8 probes: acoustic near-dup decodes every planted WAV
        # pair and bands 63-bit fingerprints (replicas are exact
        # fingerprint dups — the banding worst case, like image_neardup);
        # video near-dup walks the MP4 sample table, entropy-decodes 3
        # JPEG frames per doc and sums frame-aligned hamming over
        # (frame, band)-bucketed candidates; the multimodal capstone
        # stacks the text gate + both perceptual dedups + the manifest
        # joins — its ratio is the composed answer
        "audio_neardup": lambda d, e, ev: force(dd.banded_hamming_pairs(
            mm.audio_fingerprint(mm.synthesize_planted_wav_pairs(
                d.select("doc_id"))),
            sig_col="fp", n_bands=4, band_bits=16, max_hamming=3)),
        "video_neardup": lambda d, e, ev: force(mm.video_neardup(
            mm.video_frame_hashes(mm.synthesize_planted_mjpeg(
                d.select("doc_id"))),
            max_total_hamming=4)),
        "mm_training_set": lambda d, e, ev: force(
            cu.prepare_multimodal_training_set(d)),
        # round-10 ER probes (r9 verdict #6), riding the md5-renamed
        # customer replication in `held` (replicas never cross-match, so
        # the true match set grows linearly and the ratio measures the
        # blocking/verify machinery): the 4-stage candidate path, the
        # indel-tolerant PassJoin path, and the store-streams/batch-
        # broadcast increment matcher
        "er_pairs": lambda d, e, ev: force(lk.er_candidate_pairs(
            lk.dirty_customers(held["cust"]))),
        "er_indel_pairs": lambda d, e, ev: force(lk.er_indel_pairs(
            lk.indel_customers(held["cust"]))),
        "er_increment": lambda d, e, ev: force(lk.er_match_increment(
            held["cust"].select(
                F.col("c_custkey").alias("entity_id"),
                F.col("c_name").alias("name"),
                F.col("c_nationkey").alias("nationkey"),
                F.col("c_acctbal").alias("bal")),
            lk.increment_feed(held["cust"]))),
        # the production contract: the nightly batch is BOUNDED while
        # the store grows — only the store side scales here, so this is
        # the increment matcher's real 100 TB profile (er_increment
        # above grows both sides, incl. the broadcast batch)
        "er_incr_store": lambda d, e, ev: force(lk.er_match_increment(
            held["cust"].select(
                F.col("c_custkey").alias("entity_id"),
                F.col("c_name").alias("name"),
                F.col("c_nationkey").alias("nationkey"),
                F.col("c_acctbal").alias("bal")),
            lk.increment_feed(held["cust0_fixed"]))),
        # round-11 (r10 verdict #6): golden-record increment maintenance
        # under the same production contract — bounded batch, growing
        # store. Survivorship must stay TOUCHED-entities-only: the
        # re-aggregation reads the store through one semi-join, so the
        # ladder should track the store scan + match path, never the
        # full-store groupBy
        "golden_incr_store": lambda d, e, ev: force(lk.golden_increment(
            held["cust"].select(
                F.col("c_custkey").alias("entity_id"),
                F.col("c_name").alias("name"),
                F.col("c_nationkey").alias("nationkey"),
                F.col("c_acctbal").alias("bal")),
            lk.increment_feed(held["cust0_fixed"]))),
    }

    only = set(sys.argv[2:])   # optional op names: probe just those
    if only:
        ops = {n: f for n, f in ops.items() if n in only}
    # SCALE_PROBE_KS=1,2,4,8,16,32 extends the doubling ladder (the
    # default stops at 8x; steep profiles get re-probed deeper)
    ks = tuple(int(x) for x in
               os.environ.get("SCALE_PROBE_KS", "1,2,4,8").split(","))
    print(f"{'op':<15} " + " ".join(f"{k}x".rjust(8) for k in ks)
          + "   ratios (per doubling)")
    for name, fn in ops.items():
        times = []
        for k in ks:
            d = replicate(docs0, k, "doc_id")
            e = replicate(emb0, k, "vec_id")
            ev = replicate(ev0, k, "user_id")
            # the ER probes scan the store 2-3x (length pull, index
            # melt, survivorship semi-join); a real store is PARQUET,
            # so materialize the replica ONCE before timing — otherwise
            # the ladder measures k md5-rename projections per scan,
            # not the operator
            held["cust"] = replicate_customers(cust0, k).localCheckpoint()
            held["cust0_fixed"] = cust0
            t0 = time.perf_counter()
            fn(d, e, ev)
            times.append(time.perf_counter() - t0)
        ratios = [times[i + 1] / times[i] for i in range(len(ks) - 1)]
        print(f"{name:<15} " + " ".join(f"{t:8.2f}" for t in times)
              + "   " + " ".join(f"{r:.2f}" for r in ratios))
    spark.stop()


if __name__ == "__main__":
    main()
