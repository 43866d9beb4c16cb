"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its FULL plan into the noop sink (no driver collect of
large results, no laziness shortcuts). One measured run per query after a
session warm-up; BASELINE.md records the protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from magiceye_spark.streaming import drain  # noqa: E402  (needs sys.path)

HEADLINE = [
    "schema_diff_full",
    "datadiff_lineitem",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "events_hourly_rollup",
    "top_users_by_events",
    "q18_large_volume_customers",
    "events_sessionize",
    "purchase_last_click_asof",
    "vocab_topk",
]

# Expensive operator families, measured so a regression is visible in
# BENCH_r*.json instead of only in a manual audit (the 458 s winnowing
# nested-HOF pathology was invisible to the headline set). One warm run
# each; committed values live in BASELINE.md. minhash_lsh_near_dups
# (1-gram) is deliberately absent: unigram Jaccard saturates on the
# synthetic 30-word vocabulary (BASELINE.md), so its ~112 s measures a
# true-positive explosion, not the operator.
FAMILIES = {
    "dedup_ladder": [
        "dedup_exact_corpus",
        "jaccard_near_dups",
        "minhash_lsh_ngram_dups",
        "simhash_near_dups",
        "near_dedup_fused",
        "allpairs_jaccard_join",
    ],
    "containment": ["containment_near_dups", "containment_near_dups_indexed"],
    "span_dedup": ["duplicate_spans", "span_cleaned_corpus"],
    "retrieval": ["bm25_topk", "winnow_overlap_pairs"],
    "edit_distance": ["edit_distance_near_dups"],
    "ann": [
        "cosine_topk",
        "ivf_ann_topk",
        "ivf_pq_ann_topk",
        "hard_negatives_topk_indexed",
    ],
    "multimodal": ["media_catalog", "phash_near_dups", "phash_indexed_pairs"],
    # graph family: measured through ONE shared, persisted pair relation
    # (near_dup_pairs_shared seat) — the production pipeline shape, where
    # components + keep-one + delta-admit all consume the same edge set
    # instead of re-shingling per op (r6 spent 36.4 s computing the same
    # pair stage three times). The registry queries stay self-contained
    # (each recomputes pairs) so the driver's oracle rows are unchanged.
    "graph": ["dup_graph_components", "dedup_keep_per_cluster", "delta_dedup_admit"],
    "cdc": ["cdc_chunk_near_dups"],
    "bitext": ["bitext_margin_pairs", "bitext_margin_pairs_indexed"],
    # persistent MinHash store: build untimed (one-off), admission timed —
    # the per-ingest-batch number that matters at build-once/admit-many
    # scale (special runner, like the stored-ANN probe seats)
    "sigstore": [],
    # continuous-ingest loops (r9): 3 growing-store foreachBatch
    # micro-batches drained through each store's streaming entry point
    "ingest_loop": [],
    # late-r6 statistics/ML layer: the queries with corpus-sized joins or
    # driver-side fits (the trend/corr/KS family is daily-rollup-sized and
    # stays out; snm includes the two-phase global rank; the agreement
    # query embeds the O(block²) all-pairs twin — audit-scale by design)
    "stats": [
        "snm_near_dups",
        "snm_vs_allpairs_agreement",
        "nb_source_confusion",
        "nb_crossval_accuracy",
        "embedding_covariance",
        "embedding_outlier_scores",
        "embedding_pca_project",
    ],
}

# Committed family baselines at sf0.1 on the bench machine, recommitted
# late-r6 from a clean solo run after the stage-spread wave (bag-distance
# edit-distance screen, explicit repartitions before CPU-dense
# projections, explode_outer pushdown guard — see PLANS.md "CPU-dense
# stages vs byte-based sizing"; families total 179.1 s r5 → 118.6 s).
# The committed table lives in BASELINE.md. A measured value > 2x its
# committed value at sf0.1 lands in the output's "regressions" list —
# the gate the headline set already has via BASELINE.md's 2x rule.
FAMILY_BASELINE = {
    "dedup_exact_corpus": 0.40,
    "jaccard_near_dups": 2.98,
    # r10 recommit after the r9 driver gate trip (driver 6.68 s vs 3.15
    # committed): a 4-run solo re-measure found no plan change — warm runs
    # 2.55-2.66 s — but the FIRST family run of a session (what the driver
    # times) pays ~1.8 s of first-touch shingle/codegen cost (4.36 s cold).
    # Committed = the measured cold-run value, so the 2x gate (8.7 s)
    # tolerates driver-machine contention without hiding a real 2x warm
    # regression (which would land >5 s even cold).
    "minhash_lsh_ngram_dups": 4.36,  # was 3.15 (warm-run); 9.14 pre-spread
    "simhash_near_dups": 4.77,  # was 7.96
    "near_dedup_fused": 4.23,  # was 9.52
    # exact global prefix-filter join; postings spread before the shingle
    # transform (5.9 s single-task shingling otherwise)
    "allpairs_jaccard_join": 3.30,
    # r10: same cold-run convention as minhash_lsh_ngram_dups — the twin
    # leads its family and pays first-touch shingle codegen (15.0/11.1/9.7
    # across 3 solo runs); committed = cold top so one contended driver
    # cold run stays inside the gate
    "containment_near_dups": 15.04,  # was 9.33 (warm-run)
    "containment_near_dups_indexed": 4.07,  # was 22.92
    "duplicate_spans": 1.87,  # was 2.74
    "span_cleaned_corpus": 2.28,
    "bm25_topk": 0.98,
    "winnow_overlap_pairs": 2.14,  # was 4.56
    # 75.75 unbounded (r5) → 44.72 bounded DP → 3.87 with the
    # bag-distance screen + explicit verify repartition
    "edit_distance_near_dups": 3.87,
    "cosine_topk": 1.01,
    # r7 recommit: the per-element F.lit -> nested-literal rewrite removed
    # seconds of pure driver-side expression construction per call
    # second recommit late-r7: expr-rendered literals (one JVM parse)
    # replaced the nested-F.lit path, which still paid py4j per element.
    # Committed at the max of two post-rewrite samples (3.53/3.63 etc.) —
    # same noise-headroom convention as the sub-second graph seats
    "ivf_ann_topk": 3.70,  # was 10.41 pre-rewrite
    "ivf_pq_ann_topk": 7.30,  # was 14.05
    # NEW r13: IVF-probed hard-negative mining (whole corpus as anchors,
    # cell-co-partitioned join, sqrt-n cell sizing); committed from the
    # first-pass cold value on a machine-slow session (9.68 measured)
    "hard_negatives_topk_indexed": 12.00,
    # stored-index probe-only seats (index built untimed; the 100 TB shape)
    "ivf_indexed_probe": 2.50,  # measured 1.91-2.01
    "ivf_pq_indexed_probe": 5.00,  # measured 4.61-4.95
    "media_catalog": 2.11,  # kept: bench-order warmup varies 0.2-2.1
    "phash_near_dups": 5.72,  # was 7.52
    # stored-Hamming-index variant: fresh signing + store write + pairs
    # from stored bits (r8; the build seat — probes are amortized)
    # r12 recommit post-local_frame (the seat's two store builds each
    # paid a ~6 s plain-createDataFrame params write): measured 3.54
    "phash_indexed_pairs": 4.50,  # was 9.50
    # r7 protocol change: graph family measured through ONE shared pair
    # relation and ONE shared closure (see _bench_graph_shared) — r6 spent
    # 36.4 s computing the same pair stage three times and the fixpoint
    # three times. Components' seat pays the ~5 pointer-jump rounds once.
    "near_dup_pairs_shared": 3.07,
    "dup_graph_components": 7.49,  # closure only (pairs shared); was 15.11
    # label-frame consumers: sub-second measured (0.15/0.41); committed
    # with headroom because the 2x gate is noise-brittle below ~0.5 s
    "dedup_keep_per_cluster": 0.60,
    "delta_dedup_admit": 1.00,
    "bitext_margin_pairs": 4.85,  # was 9.03 (B-side barrier: was 20.3)
    # candidate-based production path (r8): at this corpus size the wall is
    # fixed-cost-dominated (two IVF k-NN joins vs one broadcast cross join)
    # — the win is asymptotic (n_probe/n_centroids scan fraction vs |A|·|B|)
    "bitext_margin_pairs_indexed": 7.00,  # measured 6.47
    # per-batch indexed admission (one-sided delta band join + closure);
    # ~flat in store size at fixed batch — store-growth sweep in BASELINE.md
    "sigstore_delta_admit": 6.50,  # r12 recommit (local_frame): measured 5.65
    # continuous-ingest drains (r9): 3 growing-store foreachBatch batches
    # (~500 docs / ~200 vectors) through each store's streaming loop —
    # admission + append + engine overhead per batch. Recommitted r10
    # after the driver-side union-find fast path cut the per-batch
    # closure fixpoint (hamstore 35.7 -> 21.5-29.2 measured, sigstore
    # 14.2, annindex 16.4); committed = top of the measured spread so
    # the 2x gate catches a real regression instead of sitting at the
    # obsolete pre-fast-path level.
    # Recommitted r12 after io.local_frame (store model tables through
    # Arrow LocalRelation instead of parallelize+Python-worker — ~6 s of
    # fixed cost removed per store build/bootstrap): measured clean
    # first-pass 13.6 / 17.4 / 18.5; committed at round numbers 8-15%
    # above the measurement (the 2x gate supplies the real contention
    # margin — gates 30 / 40 / 40 s).
    "sigstore_ingest_loop": 15.00,
    "hamstore_ingest_loop": 20.00,
    "annindex_ingest_loop": 20.00,
    # r11: PQ loop over the store-side cell-partitioned rerank table —
    # admission + PQ encode + TWO lockstep appends (codes + originals)
    # per batch, so ~2× the flat loop's wall at the same batch sizes.
    # r12 recommit post-local_frame: measured 28.24 clean first-pass
    # (was 33.44), committed with headroom.
    "annindex_pq_ingest_loop": 30.00,
    "cdc_chunk_near_dups": 1.59,  # was 11.21 (chunking pass now spread)
    # stats family, committed from a clean solo run at sf0.1 (late r6)
    "snm_near_dups": 8.68,  # two-phase global rank + n·window bucket join
    "snm_vs_allpairs_agreement": 6.63,  # embeds the all-pairs twin (audit)
    "nb_source_confusion": 5.08,
    # r12 recommit: explicit user-count barriers on the per-fold (doc,
    # term) and scoring aggregations (AQE byte-coalescing serialized the
    # CPU-dense collect_list scoring at bench sizes — stage audit
    # 66.9% -> 16.9% single-task); measured 2.41 clean first-pass
    "nb_crossval_accuracy": 3.00,  # was 5.39
    "embedding_covariance": 2.90,  # n·d²/2 pair rows; explode spread (was 5.79 serialized)
    "embedding_outlier_scores": 1.60,  # explode spread: tiny wall cost, scan no longer serialized
    "embedding_pca_project": 4.60,  # two bounded driver fits + projection (was 7.29)
}


# seats produced by the special-cased family runners below, not by
# registry queries — they still carry committed baselines and feed the
# 2x regressions gate like every other seat
EXTRA_SEATS = {
    "near_dup_pairs_shared",   # _bench_graph_shared: shared pair stage
    "ivf_indexed_probe",       # _bench_ann_indexed: stored-index probe
    "ivf_pq_indexed_probe",
    "sigstore_delta_admit",    # _bench_sigstore: per-batch indexed admission
    "sigstore_ingest_loop",    # _bench_ingest_loops: 3-batch streaming drains
    "hamstore_ingest_loop",
    "annindex_ingest_loop",
    "annindex_pq_ingest_loop",
}


def _bench_sigstore(spark, sf_dir: str, out: dict[str, float]) -> None:
    """Per-batch admission against a PERSISTED MinHash store: the store is
    built once (untimed — the one-off ingest cost), then one incoming
    batch is admitted via the one-sided delta band join. This seat is what
    the r7 two-sided join defect was invisible without: its wall must
    track the BATCH, not the store (store-growth sweep in BASELINE.md)."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from magiceye_spark.llmops import sigstore

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = "/tmp/magiceye_bench_sigstore"
    shutil.rmtree(path, ignore_errors=True)
    idx = sigstore.write_minhash_index(docs.where(F.col("doc_id") < 400), path)
    batch = docs.where(F.col("doc_id") >= 400)
    t0 = _t.perf_counter()
    sigstore.delta_dedup_admit_indexed(idx, batch).write.format("noop").mode(
        "overwrite"
    ).save()
    out["sigstore_delta_admit"] = round(_t.perf_counter() - t0, 3)


def _bench_ingest_loops(spark, sf_dir: str, out: dict[str, float]) -> None:
    """The continuous-ingest entry points under a wall-clock gate: N
    foreachBatch micro-batches of fixed size drained through each store's
    streaming loop, the store GROWING across batches (batch k admits
    against everything batches 1..k-1 appended) — the production shape
    that had invariant tests but no bench seat until r9. Store seeding and
    source staging are untimed (one-off); the timed span is start→drain of
    the whole availableNow stream, i.e. N admissions + N appends +
    streaming-engine overhead."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from magiceye_spark.llmops import dedup, hamstore, sigstore

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_total = docs.count()
    seed_hi = max(n_total - 1500, n_total // 2)  # 3 batches of ~500 at sf0.1
    seed = docs.where(F.col("doc_id") < seed_hi)
    root = "/tmp/magiceye_bench_ingest"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    for lo in range(seed_hi, n_total, 500):
        docs.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 500)
        ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    sigstore.write_minhash_index(seed, f"{root}/sig")
    t0 = _t.perf_counter()
    q = sigstore.streaming_dedup_ingest(
        spark, f"{root}/sig", stream(), f"{root}/ckpt_sig"
    )
    drain(q, 600)
    out["sigstore_ingest_loop"] = round(_t.perf_counter() - t0, 3)

    hamstore.write_hamming_index(
        dedup.simhash_signatures(seed), f"{root}/ham", kind="simhash"
    )
    t0 = _t.perf_counter()
    q = hamstore.streaming_hamming_ingest(
        spark, f"{root}/ham", stream(), f"{root}/ckpt_ham", kind="simhash"
    )
    drain(q, 600)
    out["hamstore_ingest_loop"] = round(_t.perf_counter() - t0, 3)

    from magiceye_spark.llmops import annindex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_emb = emb.count()
    e_seed_hi = max(n_emb - 600, n_emb // 2)  # 3 batches of ~200 at sf0.1
    annindex.write_ivf_index(
        emb.where(F.col("vec_id") < e_seed_hi), f"{root}/ivf", n_centroids=32
    )
    esrc = f"{root}/esrc"
    for lo in range(e_seed_hi, n_emb, 200):
        emb.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 200)
        ).coalesce(1).write.mode("append").parquet(esrc)
    t0 = _t.perf_counter()
    q = annindex.streaming_ann_ingest(
        spark,
        f"{root}/ivf",
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(esrc),
        f"{root}/ckpt_ivf",
    )
    drain(q, 600)
    out["annindex_ingest_loop"] = round(_t.perf_counter() - t0, 3)

    # PQ variant (r11): the loop whose per-batch rerank assembly was the
    # r10 verdict's one scale flag — now reading the store's own
    # cell-partitioned originals, pruned to the probed cells. Seeded
    # store (cold-start is a correctness row, not a steady-state cost);
    # same 3 growing-store batches as the flat seat, so the two walls
    # isolate the rerank stage's cost.
    annindex.write_ivf_index(
        emb.where(F.col("vec_id") < e_seed_hi), f"{root}/ivfpq",
        pq=True, n_centroids=32,
    )
    t0 = _t.perf_counter()
    q = annindex.streaming_ann_ingest(
        spark,
        f"{root}/ivfpq",
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(esrc),
        f"{root}/ckpt_ivfpq",
        output_path=f"{root}/pq_out",
    )
    drain(q, 600)
    out["annindex_pq_ingest_loop"] = round(_t.perf_counter() - t0, 3)


def _bench_ann_indexed(spark, sf_dir: str, out: dict[str, float]) -> None:
    """The amortized ANN story the fit-per-call seats can't show: build
    the stored index ONCE (untimed here — the build seat is the one-off
    cost, already visible as ivf_ann_topk/ivf_pq_ann_topk's fit+encode),
    then time PROBE-ONLY against the cell-partitioned parquet. This is the
    number that matters at 100 TB, where the index is built once and
    probed per batch/request."""
    import time as _t

    from pyspark.sql import functions as F

    from magiceye_spark.llmops import annindex

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = corpus.where(F.col("vec_id") < 8)
    flat = annindex.write_ivf_index(
        corpus, "/tmp/magiceye_bench_ivf_flat", n_centroids=32
    )
    t0 = _t.perf_counter()
    annindex.ivf_index_topk(flat, q, k=10, n_probe=8).write.format("noop").mode(
        "overwrite"
    ).save()
    out["ivf_indexed_probe"] = round(_t.perf_counter() - t0, 3)
    pq = annindex.write_ivf_index(
        corpus, "/tmp/magiceye_bench_ivf_pq", pq=True, n_centroids=32
    )
    t0 = _t.perf_counter()
    annindex.ivf_pq_index_topk(pq, q, corpus, k=10, n_probe=8).write.format(
        "noop"
    ).mode("overwrite").save()
    out["ivf_pq_indexed_probe"] = round(_t.perf_counter() - t0, 3)


def _bench_graph_shared(spark, sf_dir: str, out: dict[str, float]) -> None:
    """Graph family under the shared-edge-set protocol: pair generation is
    computed and persisted ONCE (its cost is the near_dup_pairs_shared
    seat), then each closure op consumes the cached pairs via ``pairs=``.
    This is the honest production measurement — a pipeline that runs
    components, keep-one, and delta-admit over one corpus computes the
    pair relation once, not three times."""
    import time as _t

    from magiceye_spark.llmops import graph as graph_ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = _t.perf_counter()
    pairs = graph_ops.near_dup_pairs(docs).persist()
    pairs.write.format("noop").mode("overwrite").save()
    out["near_dup_pairs_shared"] = round(_t.perf_counter() - t0, 3)
    comps = None
    try:
        # the closure is EAGER (multi-round fixpoint) and is itself the
        # shared artifact: components' seat pays it once, the keep-one and
        # delta-admit seats consume the label frame (comps=) — measuring
        # the real pipeline, which never re-runs the fixpoint per consumer
        t0 = _t.perf_counter()
        comps = graph_ops.dup_graph_components(docs, pairs=pairs).persist()
        comps.write.format("noop").mode("overwrite").save()
        out["dup_graph_components"] = round(_t.perf_counter() - t0, 3)
        for name, fn in [
            ("dedup_keep_per_cluster", graph_ops.dedup_keep_per_cluster),
            ("delta_dedup_admit", graph_ops.delta_dedup_admit),
        ]:
            t0 = _t.perf_counter()
            fn(docs, comps=comps).write.format("noop").mode("overwrite").save()
            out[name] = round(_t.perf_counter() - t0, 3)
    finally:
        pairs.unpersist()
        if comps is not None:
            comps.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from magiceye_spark.session import get_spark
    from magiceye_spark import registry

    from pyspark.sql import functions as F

    spark = get_spark("magiceye-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warm-up: exercise the real execution paths once (parquet scan, shuffle
    # agg, broadcast join, noop sink) so per-query timings measure the query,
    # not first-use JIT/codegen/classloading of those operators.
    spark.range(1).count()
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # family section: build time counts too (some builders run bounded
    # driver-side fits); skippable for quick headline-only iteration
    families: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_FAMILIES", "1") != "0":
        for family, names in FAMILIES.items():
            families[family] = {}
            if family == "graph":
                _bench_graph_shared(spark, sf_dir, families[family])
                spark.catalog.clearCache()
                continue
            if family == "sigstore":
                _bench_sigstore(spark, sf_dir, families[family])
                spark.catalog.clearCache()
                continue
            if family == "ingest_loop":
                _bench_ingest_loops(spark, sf_dir, families[family])
                spark.catalog.clearCache()
                continue
            for name in names:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                families[family][name] = round(time.perf_counter() - t0, 3)
            if family == "ann":
                _bench_ann_indexed(spark, sf_dir, families[family])
            spark.catalog.clearCache()  # drop per-family persisted frames

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if families:
        out["families"] = families
        out["families_total"] = round(
            sum(t for f in families.values() for t in f.values()), 3
        )
        # gate: only meaningful under the committed protocol — sf0.1 on the
        # default local master (a multi-JVM local-cluster run has different
        # fixed overheads and would flag spurious regressions)
        master = os.environ.get("SPARK_GRAFT_MASTER", "")
        if out["sf"] == 0.1 and (not master or master.startswith("local[")):
            out["regressions"] = sorted(
                name
                for f in families.values()
                for name, t in f.items()
                if name in FAMILY_BASELINE and t > 2 * FAMILY_BASELINE[name]
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
