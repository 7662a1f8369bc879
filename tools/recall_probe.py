"""ANN recall probe: how much recall does each approximate variant trade
for its speed?

Usage: python tools/recall_probe.py [sf_dir] [n_queries]
       (defaults /root/testdata/sf0.1, 20 query vectors)

For a deterministic sample of query ids, computes exact top-10 (brute
force) and the top-10 of each approximate variant (hyperplane-LSH bucket,
IVF nprobe=2, PQ reconstruction), reporting mean recall@10. This is the
counterpart of tools/scale_probe.py: speed numbers without recall numbers
overstate the approximate paths.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ender_turing_spark.operators import similarity as sim
from etl_ender_turing_spark.session import get_spark
from etl_ender_turing_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # deterministic spread of query ids across the corpus (skip codebook/
    # centroid seed ids so the approximate paths see ordinary vectors)
    qids = [16 + (i * (n - 16)) // n_q for i in range(n_q)]

    variants = {
        "lsh_bucket": lambda qid: sim.ann_bucketed_topk(emb, qid, k=10),
        "lsh_multiprobe": lambda qid: sim.ann_multiprobe_topk(emb, qid, k=10),
        "ivf_nprobe2": lambda qid: sim.ivf_topk(emb, qid, k=10),
        "pq_recon": lambda qid: sim.pq_topk(emb, qid, k=10),
    }
    recalls = {name: [] for name in variants}
    for qid in qids:
        exact = {r.vec_id for r in
                 sim.brute_force_topk(emb, qid, k=10).collect()}
        for name, fn in variants.items():
            got = {r.vec_id for r in fn(qid).collect()}
            recalls[name].append(len(exact & got) / max(1, len(exact)))
    print(f"recall@10 over {n_q} queries at {sf_dir} (n={n}):")
    for name, rs in recalls.items():
        print(f"  {name:<12} mean {sum(rs) / len(rs):.3f}"
              f"  min {min(rs):.2f}  max {max(rs):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
