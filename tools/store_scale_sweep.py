"""Persistent-store growth sweep: does per-OPERATION cost stay bounded as
the STORE grows, at fixed operation size?

The r7 dedup sweep measured operators against growing CORPORA; this one
measures the two persistent stores against growing STORE contents with
the per-call work held constant — the claims that were argued, not
measured, until r8:

- sigstore_delta_admit: admission wall vs store size at a FIXED 500-doc
  delta. The r8 one-sided band join makes candidate generation linear in
  the delta at fixed store bucket occupancy; what remains linear in the
  store is only the map-side banding scan of stored signatures (column-
  pruned, no re-shingling) + the bucket-size agg. Expect near-flat wall.
  (The r7 two-sided join would instead grow with the store's internal
  collision structure — the defect this sweep guards against reappearing.)
- ivf_index_topk / ivf_pq_index_topk: probe wall vs store size at a FIXED
  8-query batch and fixed n_probe/n_centroids. Postings are PARTITIONED BY
  cell, so a probe reads ~n_probe/n_centroids of the files whatever the
  store size — expect wall ∝ store/probe fraction (i.e. ~linear in the
  probed slice, flat in file-listing/driver overheads).

Store synthesis follows the r7 sweep's shape-preserving protocol:
documents replicate token-suffixed (shingle-disjoint replicas → constant
bucket occupancy per band bucket, the honest 10×-more-crawl shape);
embeddings replicate by id-offset with a per-replica dimension ROLL
(deterministic, norm-preserving) so replicas are not near-duplicates of
their source and cell occupancy grows roughly uniformly. Synthetic data
is a scaling measurement input only, never an oracle input.

Usage: python tools/store_scale_sweep.py [factor ...]   (default: 1 10)
Prints one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/magiceye_store_sweep"


def synth_docs(spark, factor: int):
    """factor× token-suffixed replication of the sf0.1 STORE portion
    (doc_id >= 500; ids < 500 are reserved as the fixed delta)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    store = docs.where(F.col("doc_id") >= 500)
    reps = []
    for i in range(factor):
        suffixed = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: F.concat(t, F.lit(f"x{i}")),
            ),
            " ",
        )
        reps.append(
            store.select(
                (F.col("doc_id") + (10_000_000 * i)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("int"))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def synth_embs(spark, factor: int):
    """factor× replication of sf0.1 embeddings with a per-replica
    dimension roll (deterministic, norm-preserving) so replicas spread
    across cells instead of stacking on their source's cell."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = len(emb.select("embedding").first()[0])
    reps = []
    for i in range(factor):
        rolled = F.concat(
            F.slice("embedding", (i % d) + 1, d - (i % d)),
            F.slice("embedding", 1, i % d),
        )
        reps.append(
            emb.select(
                (F.col("vec_id") + (10_000_000 * i)).alias("vec_id"),
                rolled.alias("embedding"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from magiceye_spark.llmops import annindex, sigstore
    from magiceye_spark.session import get_spark

    spark = get_spark("store-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    shutil.rmtree(ROOT, ignore_errors=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    delta = docs.where(F.col("doc_id") < 500)  # fixed 500-doc batch
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)  # fixed probe batch

    # warm-up: exercise every measured code path once (store build, band
    # join, closure, flat+pq probe) so the ×1 seats don't absorb first-use
    # JIT/codegen — without this the ×1 walls measure warmup, not the op
    wp = os.path.join(ROOT, "warm")
    widx = sigstore.write_minhash_index(
        docs.where(F.col("doc_id") >= 4500), os.path.join(wp, "sig")
    )
    sigstore.delta_dedup_admit_indexed(widx, delta.limit(50)).write.format(
        "noop"
    ).mode("overwrite").save()
    wflat = annindex.write_ivf_index(emb, os.path.join(wp, "ivf"), n_centroids=8)
    annindex.ivf_index_topk(wflat, queries, k=5, n_probe=2).write.format(
        "noop"
    ).mode("overwrite").save()
    wpq = annindex.write_ivf_index(
        emb, os.path.join(wp, "pq"), pq=True, n_centroids=8
    )
    annindex.ivf_pq_index_topk(wpq, queries, emb, k=5, n_probe=2).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()

    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    walls: dict[str, dict[str, float]] = {}
    meta: dict[str, dict[str, int]] = {}
    for factor in factors:
        label = f"store×{factor}"
        # Materialize the synthesized store inputs to parquet and read
        # back BEFORE any timed section: the synth frames are lineage,
        # and timing a build against lineage measures the synthesizer,
        # not the operator (the r11 rerank lesson, same file below).
        docs_path = os.path.join(ROOT, f"docs{factor}")
        if not os.path.exists(docs_path):
            synth_docs(spark, factor).write.parquet(docs_path)
        store_docs = spark.read.parquet(docs_path)
        corpus_path = os.path.join(ROOT, f"corpus{factor}")
        if not os.path.exists(corpus_path):
            synth_embs(spark, factor).write.parquet(corpus_path)
        store_emb = spark.read.parquet(corpus_path)

        # ---- sigstore: fixed delta vs growing store
        # build wall (r12 verdict ask #3: the r11 sweep predated
        # local_frame, which changed every store BUILD path — measure
        # builds, not just admission/probe)
        sp = os.path.join(ROOT, f"sig{factor}")
        t0 = time.perf_counter()
        idx = sigstore.write_minhash_index(store_docs, sp)
        walls.setdefault("sigstore_build", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        n_store = idx.signatures.count()
        t0 = time.perf_counter()
        sigstore.delta_dedup_admit_indexed(idx, delta).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.setdefault("sigstore_delta_admit", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        meta.setdefault("sigstore_store_rows", {})[label] = n_store
        spark.catalog.clearCache()

        # ---- Hamming store: fixed signed batch vs growing store
        from magiceye_spark.llmops import dedup as dedup_ops
        from magiceye_spark.llmops import hamstore

        hp = os.path.join(ROOT, f"ham{factor}")
        store_sigs = dedup_ops.simhash_signatures(store_docs)
        t0 = time.perf_counter()
        hidx = hamstore.write_hamming_index(store_sigs, hp, kind="simhash")
        walls.setdefault("hamstore_build", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        delta_sigs = dedup_ops.simhash_signatures(delta)
        t0 = time.perf_counter()
        hamstore.delta_hamming_admit_indexed(hidx, delta_sigs).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.setdefault("hamstore_delta_admit", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        spark.catalog.clearCache()

        # ---- ANN stores: fixed query batch vs growing postings
        from magiceye_spark.fsops import fs_count_files

        fp = os.path.join(ROOT, f"ivf{factor}")
        t0 = time.perf_counter()
        flat = annindex.write_ivf_index(store_emb, fp, n_centroids=32)
        walls.setdefault("ivf_build_flat", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        # file-count diagnostic (r8 verdict: probe wall grew 1.59x at 100x
        # where the claim is ~flat): write_ivf_index spreads the encode over
        # defaultParallelism tasks before partitionBy(cell), so each cell
        # dir holds up to that many files — file count grows with store
        # size until tasks saturate, and probe wall pays listing+open per
        # file. Measure the probe before AND after compaction (1 file/cell)
        # to split "more files" from "more probed rows".
        meta.setdefault("ivf_postings_files", {})[label] = fs_count_files(
            spark, os.path.join(fp, "postings")
        )
        t0 = time.perf_counter()
        annindex.ivf_index_topk(flat, queries, k=10, n_probe=8).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.setdefault("ivf_index_topk", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        annindex.ivf_index_compact(spark, fp)
        meta.setdefault("ivf_postings_files_compacted", {})[label] = (
            fs_count_files(spark, os.path.join(fp, "postings"))
        )
        flat = annindex.read_ivf_index(spark, fp)
        t0 = time.perf_counter()
        annindex.ivf_index_topk(flat, queries, k=10, n_probe=8).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.setdefault("ivf_index_topk_compacted", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        pp = os.path.join(ROOT, f"pq{factor}")
        t0 = time.perf_counter()
        pq = annindex.write_ivf_index(store_emb, pp, pq=True, n_centroids=32)
        walls.setdefault("ivf_build_pq", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        t0 = time.perf_counter()
        annindex.ivf_pq_index_topk(
            pq, queries, store_emb, k=10, n_probe=8
        ).write.format("noop").mode("overwrite").save()
        walls.setdefault("ivf_pq_index_topk", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        # ---- PQ-store ADMISSION with external-corpus rerank (r10): fixed
        # 500-vector delta vs growing PQ store. Candidate scoping reads the
        # compact code postings (partition-pruned); the rerank joins the
        # ORIGINAL-vector corpus — which in production is a parquet table
        # in the lake, so materialize the synth frame first (passing the
        # 100-replica synthesis LINEAGE as rerank would re-execute the
        # whole array-roll transform inside the admission job and measure
        # the synthesizer, not the operator; first measured that way:
        # 4.6/7.9/38.5 s — the 38.5 was synth recompute)
        rerank_corpus = store_emb  # already a materialized-parquet read
        ann_delta = emb.select(
            (F.col("vec_id") + 900_000_000).alias("vec_id"), "embedding"
        ).limit(500)
        t0 = time.perf_counter()
        annindex.delta_ann_admit_indexed(
            pq, ann_delta, threshold=0.95, n_probe=8, rerank=rerank_corpus
        ).write.format("noop").mode("overwrite").save()
        walls.setdefault("pq_admit_rerank", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        # ---- r11 production path: rerank from the store's OWN
        # cell-partitioned originals table (rerank=None), whose scan is
        # statically pruned to the probed cells. Versus pq_admit_rerank
        # (external corpus, un-pruned scan + corpus-wide shuffle), this is
        # the per-batch-work-proportional-to-probed-slice claim — the two
        # walls' growth curves side by side are the attribution the r10
        # verdict asked for.
        t0 = time.perf_counter()
        annindex.delta_ann_admit_indexed(
            pq, ann_delta, threshold=0.95, n_probe=8
        ).write.format("noop").mode("overwrite").save()
        walls.setdefault("pq_admit_store", {})[label] = round(
            time.perf_counter() - t0, 2
        )
        meta.setdefault("ann_store_rows", {})[label] = store_emb.count()
        spark.catalog.clearCache()

    labels = [f"store×{f}" for f in factors]
    print(
        "| op | " + " | ".join(labels)
        + f" | {factors[-1]}× store cost |"
    )
    print("|---|" + "---|" * (len(labels) + 1))
    for name, r in walls.items():
        ratio = round(r[labels[-1]] / r[labels[0]], 2) if r[labels[0]] > 0 else "-"
        print(
            f"| {name} | " + " | ".join(f"{r[l]} s" for l in labels)
            + f" | {ratio}x |"
        )
    print(json.dumps({"walls": walls, "meta": meta}))


if __name__ == "__main__":
    main()
