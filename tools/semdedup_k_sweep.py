"""SemDeDup k-sweep: measured recall-vs-exact and wall as the cluster
count grows — the numbers behind the module's "size k to fit the pair
join" claim (arXiv 2303.09540 uses k ≈ n/10⁴; the cost model is
O(Σ|c|²) within-cluster pairs vs O(n²) global).

k=1 IS the exact global closure (pinned structurally in tests); for k>1
the sweep reports, at two thresholds:

- removed-set recall: |removed_k ∩ removed_1| / |removed_1| — the
  fraction of true semantic duplicates the scoped variant still removes
  (cross-cluster near-dups straddling a Voronoi boundary are the misses);
- wall seconds (one warm session, clearCache between runs).

High threshold (0.95, the paper's regime: near-identical embeddings land
in the same cell) runs on a 50-planted-twin corpus (the corpus's own
pairs never reach 0.95, which would make recall vacuous) and should hold
recall near 1 as k grows; the LOW-threshold row (0.45, the corpus's own
cosine structure) documents the regime where scoping loses
boundary-straddling pairs by design — that regime belongs to
embedding_near_dup_pairs / embedding_dedup_fused.

Usage: python tools/semdedup_k_sweep.py [sf_dir]
Prints one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from magiceye_spark.llmops import simsearch
    from magiceye_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("semdedup-k-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # the sf0.1 corpus has NO pairs above the paper's 0.95 regime (removed=0
    # → vacuous recall), so the high-threshold rows run on a planted corpus:
    # 50 ε-perturbed twins of existing vectors (the test_r7_ops protocol) —
    # the k-scoped prune must still find them (same Voronoi cell)
    twins = base.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.0001).cast("float")
        ).alias("embedding"),
    )
    planted = base.unionByName(twins)

    results = {}
    for thr in (0.95, 0.45):
        emb = planted if thr == 0.95 else base
        all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
        removed_exact = None
        for k in (1, 4, 16):
            t0 = time.perf_counter()
            kept = {
                r["vec_id"]
                for r in simsearch.semdedup_prune(
                    emb, k=k, threshold=thr
                ).select("vec_id").collect()
            }
            wall = round(time.perf_counter() - t0, 2)
            removed = all_ids - kept
            if k == 1:
                removed_exact = removed
            recall = (
                round(len(removed & removed_exact) / len(removed_exact), 3)
                if removed_exact
                else 1.0
            )
            results[f"thr{thr}_k{k}"] = {
                "wall_s": wall,
                "removed": len(removed),
                "recall_vs_k1": recall,
            }
            spark.catalog.clearCache()

    print("| threshold | k | wall | removed | recall vs k=1 |")
    print("|---|---|---|---|---|")
    for key, r in results.items():
        thr, k = key.replace("thr", "").split("_k")
        print(
            f"| {thr} | {k} | {r['wall_s']} s | {r['removed']} |"
            f" {r['recall_vs_k1']} |"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
