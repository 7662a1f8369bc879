"""Skew probe: do the dedup bucket caps hold under Zipf-distributed text?

tools/scale_probe.py replicates real documents UNIFORMLY; real corpora are
Zipf-skewed — a handful of boilerplate shingles appear in most documents,
so LSH band buckets concentrate instead of spreading md5-uniformly. This
probe synthesizes documents whose tokens follow a Zipf(s=1) law over a
small vocabulary (deterministic inverse-CDF over md5 bits — no RNG), then
measures, at growing corpus sizes:

  * the LARGEST minhash band bucket (how hard the skew presses on the cap),
  * candidate-pair counts with the default ``max_bucket`` cap vs uncapped,
  * wall time per scale.

The evidence sought: uncapped pairs grow ~quadratically with corpus size
(the O(n^2) cliff a skewed bucket causes), while the capped run's pairs
grow ~linearly because oversized buckets emit star edges — i.e. the
``max_bucket`` fallback is what keeps Zipf corpora feasible at 100 TB.

Usage: python tools/skew_probe.py [n_docs_base]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_ender_turing_spark.operators import dedup as dd
from etl_ender_turing_spark.session import get_spark

N_TEMPLATES = 50       # boilerplate templates, popularity Zipf(s=1)
BOILER_TOKENS = 10     # shared boilerplate prefix length
TAIL_TOKENS = 20       # per-doc unique tail (keeps docs DISSIMILAR)


def zipf_docs(spark, n_docs: int):
    """n_docs documents = a shared boilerplate prefix (template chosen
    Zipf(s=1) over N_TEMPLATES via inverse-CDF on md5 bits — template 0
    covers ~25%% of the corpus) + a per-doc unique tail. Jaccard between
    two same-template docs is ~BOILER/(BOILER+2*TAIL) ≈ 0.2 — NOT
    near-dups — yet their minhash band minima often land in the shared
    boilerplate shingles, so band buckets concentrate on the popular
    templates and grow LINEARLY with the corpus: exactly the skew that
    makes uncapped in-bucket pair expansion quadratic. Deterministic,
    executor-side, no RNG."""
    u = ("(conv(substring(md5(concat('t', cast(id AS string))), 1, 8),"
         " 16, 10) / 4294967296.0)")
    template = f"cast(floor(pow({N_TEMPLATES}, {u})) AS string)"
    boiler = (f"concat_ws(' ', transform(sequence(1, {BOILER_TOKENS}),"
              f" p -> concat('b', {template}, '_', cast(p AS string))))")
    tail = (f"concat_ws(' ', transform(sequence(1, {TAIL_TOKENS}),"
            f" p -> concat('u', cast(id AS string), '_',"
            f" cast(p AS string))))")
    return (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.expr(f"concat({boiler}, ' ', {tail})").alias("text")))


def probe(spark, n_docs: int) -> dict:
    docs = zipf_docs(spark, n_docs)
    sigs = dd.minhash_signatures_inline(docs).persist()
    sigs.count()

    stack = ", ".join(f"'{b}', concat(h{2 * b}, h{2 * b + 1})"
                      for b in range(4))
    max_bucket = (sigs.select(F.expr(f"stack(4, {stack}) AS (band, h)"))
                  .groupBy("band", "h").count()
                  .agg(F.max("count")).first()[0])

    # cap=100 (vs the default 1000) so the star fallback demonstrably
    # engages at probe-reachable sizes; at production scale the same
    # engagement happens against the default cap once buckets pass it
    t0 = time.perf_counter()
    capped = dd.minhash_band_pairs(sigs, max_bucket=100).count()
    t_capped = time.perf_counter() - t0
    t0 = time.perf_counter()
    uncapped = dd.minhash_band_pairs(sigs, max_bucket=10**9).count()
    t_uncapped = time.perf_counter() - t0
    sigs.unpersist()
    return {"n_docs": n_docs, "max_bucket": max_bucket,
            "capped_pairs": capped, "uncapped_pairs": uncapped,
            "t_capped": t_capped, "t_uncapped": t_uncapped}


def probe_containment(spark, n_docs: int) -> dict:
    """Same Zipf corpus, containment candidate generation: uncapped
    shingle-sharing pairs grow quadratically (boilerplate shingles are
    shared corpus-wide); max_df excludes those from pair generation and
    growth falls to ~linear — the same cap discipline, different op."""
    docs = zipf_docs(spark, n_docs)
    sh = dd.shingle_select(docs).persist()
    sh.count()
    t0 = time.perf_counter()
    capped = dd.containment_pairs(sh, threshold=0.0, max_df=20).count()
    t_capped = time.perf_counter() - t0
    t0 = time.perf_counter()
    uncapped = dd.containment_pairs(sh, threshold=0.0).count()
    t_uncapped = time.perf_counter() - t0
    sh.unpersist()
    return {"n_docs": n_docs, "capped_pairs": capped,
            "uncapped_pairs": uncapped,
            "t_capped": t_capped, "t_uncapped": t_uncapped}


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'docs':>8} {'maxbkt':>8} {'capped':>12} {'uncapped':>12} "
          f"{'t_cap':>7} {'t_unc':>7}   pairs/doc (cap, unc)")
    prev = None
    for mult in (1, 2, 4, 8):
        r = probe(spark, base * mult)
        cap_rate = r["capped_pairs"] / r["n_docs"]
        unc_rate = r["uncapped_pairs"] / r["n_docs"]
        growth = ""
        if prev:
            growth = (f"   growth cap {r['capped_pairs'] / prev['capped_pairs']:.2f}x"
                      f" unc {r['uncapped_pairs'] / prev['uncapped_pairs']:.2f}x")
        print(f"{r['n_docs']:>8} {r['max_bucket']:>8} {r['capped_pairs']:>12}"
              f" {r['uncapped_pairs']:>12} {r['t_capped']:>7.2f}"
              f" {r['t_uncapped']:>7.2f}   {cap_rate:8.1f} {unc_rate:8.1f}"
              f"{growth}")
        prev = r
    print("containment (shingle-sharing gen, max_df=20 vs uncapped):")
    print(f"{'docs':>8} {'capped':>12} {'uncapped':>12} {'t_cap':>7} {'t_unc':>7}")
    prev = None
    for mult in (1, 2, 4):
        r = probe_containment(spark, base * mult)
        growth = ""
        if prev:
            growth = (f"   growth cap {r['capped_pairs'] / max(prev['capped_pairs'],1):.2f}x"
                      f" unc {r['uncapped_pairs'] / max(prev['uncapped_pairs'],1):.2f}x")
        print(f"{r['n_docs']:>8} {r['capped_pairs']:>12} {r['uncapped_pairs']:>12}"
              f" {r['t_capped']:>7.2f} {r['t_uncapped']:>7.2f}{growth}")
        prev = r
    spark.stop()


if __name__ == "__main__":
    main()
