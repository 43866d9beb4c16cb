"""Dedup/graph-family scaling sweep: sf0.01 → sf0.1 → synthesized sf1.

BASELINE.md's r4 curve measured the HEADLINE queries across SFs; the r6
stats sweep covered the statistics family. This closes the remaining gap
the r6 verdict called out: "round count flat in data volume" and
"Σdf² bounded" for the dedup/graph family were argued, not measured past
sf0.1.

The synthesized sf1 is a 10× replication of sf0.1's documents where every
TOKEN of replica i carries an `xi` suffix (doc_id offset 10M·i, n_chars
recomputed). Token-suffixing keeps replicas pairwise shingle-DISJOINT, so
the corpus-wide duplication FACTOR stays constant as the corpus grows —
the realistic 10×-more-crawl shape. Naive replication (identical text)
would instead multiply every cluster size by 10 and measure a
true-positive explosion, not the operator (the documented unigram-LSH
pathology in BASELINE.md). Synthetic data is a scaling measurement input
only, never an oracle input.

Swept operators (one warm session, clearCache between):
- minhash_lsh_ngram_dups  — banded candidate gen + exact verify
- near_dedup_fused        — LSH components, no pair materialization
- allpairs_jaccard_join   — exact prefix-filter join (the lossless path)
- containment_near_dups_indexed — inverted-index containment
- lsh_closure             — minhash_lsh_pairs → connected_components, the
  documented 100 TB path behind dup_graph_components (whose registry row
  embeds the O(block²) all-pairs ORACLE TWIN by design — sweeping the twin
  would measure the twin's documented super-linearity, not the scale path)

Usage: python tools/dedup_scale_sweep.py [--skip-synth]
Prints one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SYNTH_ROOT = "/tmp/magiceye_dedup_sf1"


def build_synth_sf1(spark, base_dir: str) -> str:
    """10× token-suffixed replication of {base_dir}/documents.parquet."""
    from pyspark.sql import functions as F

    out = os.path.join(SYNTH_ROOT, "documents.parquet")
    if os.path.exists(out):
        return SYNTH_ROOT
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    reps = []
    for i in range(10):
        suffixed = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: F.concat(t, F.lit(f"x{i}")),
            ),
            " ",
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + (10_000_000 * i)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("int"))
        )
    allr = reps[0]
    for r in reps[1:]:
        allr = allr.unionByName(r)
    allr.repartition(32).write.mode("overwrite").parquet(out)
    return SYNTH_ROOT


def main() -> None:
    from magiceye_spark import registry
    from magiceye_spark.llmops import dedup, graph
    from magiceye_spark.session import get_spark

    spark = get_spark("dedup-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def lsh_closure(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, threshold=0.7, shingle_n=3
        )
        return graph.connected_components(
            pairs.select("doc_a", "doc_b"), src="doc_a", dst="doc_b"
        )

    ops = {
        "minhash_lsh_ngram_dups": qs["minhash_lsh_ngram_dups"],
        "near_dedup_fused": qs["near_dedup_fused"],
        "allpairs_jaccard_join": qs["allpairs_jaccard_join"],
        "containment_near_dups_indexed": qs["containment_near_dups_indexed"],
        "lsh_closure": lsh_closure,
    }

    sfs = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]
    if "--skip-synth" not in sys.argv:
        sfs.append(("sf1(synth)", build_synth_sf1(spark, "/root/testdata/sf0.1")))

    spark.range(1).count()  # session warm-up
    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for label, sf_dir in sfs:
        for name, fn in ops.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            results.setdefault(name, {})[label] = round(time.perf_counter() - t0, 2)
            rows.setdefault(name, {})[label] = n
            spark.catalog.clearCache()

    labels = [lbl for lbl, _ in sfs]
    print("| op | " + " | ".join(labels) + " | 100x cost | rows@each |")
    print("|---|" + "---|" * (len(labels) + 2))
    for name in ops:
        r = results[name]
        ratio = (
            round(r[labels[-1]] / r[labels[0]], 1)
            if labels[-1] in r and r[labels[0]] > 0
            else "-"
        )
        cells = " | ".join(f"{r.get(l, float('nan'))} s" for l in labels)
        rowcells = "/".join(str(rows[name].get(l, "-")) for l in labels)
        print(f"| {name} | {cells} | {ratio}x | {rowcells} |")
    print(json.dumps({"walls": results, "rows": rows}))


if __name__ == "__main__":
    main()
