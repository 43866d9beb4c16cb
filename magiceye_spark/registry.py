"""Central query registry: every implemented operator exposed as a named
(spark_fn, oracle_sql) pair — the driver contract of ``__spark_entry__.py``.

Each spark_fn takes (spark, sf_dir) and returns a DataFrame; oracle_sql is
the DuckDB-equivalent ANSI SQL over the same parquet tables (None for
genuinely non-SQL-expressible ops, which the driver checks rows-only).
Column names/aliases match exactly between the two sides — the driver's
value-hash sorts columns by name before hashing.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


# The correctness driver verifies the FIRST 50 entries of queries() against
# their DuckDB oracles. Pure registration order let round-2 additions push
# previously-green queries (text_stats, language_id, ...) out of that window,
# so the window is pinned explicitly: one representative of every operator
# family, every entry oracle-backed (no `None`-oracle approximate queries —
# those have tolerance pins in pytest instead). Everything not listed follows
# in registration order; pytest's oracle-parity sweep covers the full set.
_DRIVER_WINDOW = [
    # ROTATION PLAN (r7 onward): the window is 50 seats; each round rotates
    # driver-attested family representatives OUT (they stay registered and
    # oracle-checked in pytest's full sweep) and never-driver-attested
    # queries IN, until every family's members have driver rows at sf0.01.
    # History: r7 swapped 18 seats (~100/229 oracle-backed had a driver row
    # after it); r8 swapped 17 (118/232 cumulative; both plans preserved in
    # git history of this comment).
    # r11 rotation: 32 seats swapped — every evictee is driver-attested
    # (green r10) and keeps pytest oracle coverage; every entrant was
    # pre-validated green at sf0.01 with the local harness, all with
    # non-zero rows and scalar-typed outputs (the new harness lint rejects
    # Array/Map/Struct seats — r10's only red row class). Swaps
    # (evicted → entrant):
    #   corpus_version_diff → corpus_hash_split3;
    #     phrase_search → bigram_continuations;
    #     profile_drift_lineitem → events_key_skew;
    #     fk_integrity_audit → q11_stock_value;
    #     source_report_card → supplier_scorecard;
    #     l_diversity_customers → customer_spend_gini;
    #     q12_shipmode_priority → q20_excess_stock;
    #     q16_supplier_counts → nation_trade_matrix;
    #     fd_audit_orders → pk_candidates_lineitem (FD/PK family);
    #     events_daily_lag_corr → events_winsorized_stats;
    #     events_type_corr_matrix → event_transition_matrix;
    #     events_ohlc_daily → quarterly_revenue_yoy;
    #     dup_pagerank → user_value_ewma;
    #     lineitem_bloom_semi → parts_abc_classes;
    #     chunk_dedup_stats → token_budget_plan;
    #     events_ks_drift → language_id_confusion;
    #     events_type_spearman_matrix → session_type_cooccurrence;
    #     session_concurrency → top_users_per_type;
    #     cross_source_perplexity → vocab_zipf_slope;
    #     user_activity_streaks → orders_new_vs_returning;
    #     media_resize_plan → media_frame_plan;
    #     repetition_stats → source_hapax_rate;
    #     doc_rolling_fingerprint → datadiff_changed_partitions;
    #     corpus_composition → corpus_length_buckets;
    #     leakage_safe_split → cohort_retention_triangle;
    #     decontaminated_corpus → boilerplate_ngrams;
    #     source_mixing_weights → embedding_norm_stats;
    #     embedding_random_projection → embedding_outlier_scores
    #   ann_ingest_loop_exact → ann_cold_start_loop_exact (NEW r11: the
    #     same loop oracle technique but bootstrapping from NO store —
    #     hash-checks the r11 cold-start batch-0 admission parity)
    #   sequence_packing → sig_ingest_loop_exact;
    #     phash_admit_indexed_exact → ham_ingest_loop_exact (NEW r11:
    #     the other two continuous loops hash-checked end-to-end,
    #     verdict ask #5 — batch-sequential recursive-CTE oracles over
    #     shingle Jaccard / dHash hamming)
    #   phash_dedup_keep → pq_ann_admit_store_exact (NEW r11: admission
    #     reranked from the store's OWN pruned originals table — the
    #     production path after the r10 scale-flag fix)
    #   (embedding_normalize → embedding_normalize_digest recorded below)
    # r10 rotation: 22 seats swapped — every evictee is driver-attested
    # (green r9) and keeps pytest oracle coverage; every entrant was
    # pre-validated green at sf0.01 with the local harness, all with
    # non-zero rows (evicted → entrant):
    #   q9_product_profit → q12_shipmode_priority;
    #     q2_min_cost_supplier → q16_supplier_counts (TPC-H)
    #   events_psi_stream_twin → events_value_psi_drift (PSI family;
    #     cusum stream twin keeps the streaming-twin seat)
    #   events_sessionize → session_concurrency;
    #     purchase_next_error_asof → events_debounce;
    #     daily_active_users → user_activity_streaks;
    #     events_anomalous_days → events_ohlc_daily (event ops/rollups)
    #   ivf_ann_exact → embedding_random_projection;
    #     bitext_margin_pairs → embedding_normalize (embedding family)
    #   gopher_quality_flags → cross_source_perplexity (text quality)
    #   heavy_hitters_cms → lineitem_bloom_semi (sketch family)
    #   doc_fingerprint → doc_rolling_fingerprint;
    #     duplicate_span_coverage → chunk_dedup_stats (fingerprint/chunk)
    #   corpus_global_ids → corpus_composition;
    #     decontamination_stopgram → decontaminated_corpus;
    #     customer_rfm → sequence_packing;
    #     basket_pair_lift → source_mixing_weights (pipeline curation)
    #   tfidf_top_terms → repetition_stats (text analysis)
    #   phash_band_stats → phash_dedup_keep;
    #     confusable_dup_clusters → media_resize_plan (multimodal/Hamming)
    #   ann_admit_indexed_exact → pq_ann_admit_indexed_exact (NEW r10:
    #     the SAME exhaustive-probe admission oracle but against the PQ
    #     store with external-corpus rerank — strictly more surface)
    #   events_quota_batch_twin → ann_ingest_loop_exact (NEW r10: the
    #     continuous ingest LOOP hash-checked end-to-end — two drained
    #     micro-batches vs a batch-SEQUENTIAL double recursive-CTE
    #     oracle; the first driver row covering a streaming loop OUTPUT)
    # r9 rotation: 19 seats swapped — every evictee is driver-attested
    # (green r8) and keeps pytest oracle coverage; every entrant was
    # pre-validated green against its DuckDB oracle at sf0.01 with the
    # local harness before seating (evicted → entrant):
    #   k_anonymity_customers → l_diversity_customers (privacy family)
    #   q6_forecast_revenue, q18_large_volume_customers →
    #     q9_product_profit, q2_min_cost_supplier (TPC-H family)
    #   events_daily_trend_robust, events_seasonal_decomp,
    #     events_segmented_trend → events_daily_lag_corr,
    #     events_type_corr_matrix, events_anomalous_days (the stats-family
    #     members the r8 verdict called out as never seated)
    #   nb_source_confusion → gopher_quality_flags (text-quality family)
    #   conversion_funnel → daily_active_users (events rollups)
    #   events_value_distribution → events_props_key_stats (JSON props)
    #   language_id → tfidf_top_terms; hybrid_rrf_topk → pii_scan;
    #     winnow_overlap_pairs → doc_fingerprint (text/fingerprint)
    #   purchase_last_click_asof → purchase_next_error_asof (as-of fwd)
    #   decontamination_overlap → corpus_global_ids;
    #     token_budget_waterfill → customer_rfm;
    #     corpus_pps_sample → basket_pair_lift (pipeline keeps
    #     split_leakage_audit + leakage_safe_split + stopgram)
    #   phash_indexed_pairs → phash_band_stats (Hamming-store family: the
    #     r8 band-occupancy diagnostic, never attested)
    #   dup_cluster_stats, dup_graph_triangles → heavy_hitters_cms (first
    #     sketch-family seat) + duplicate_span_coverage (spans family;
    #     graph keeps components + pagerank)
    #   ivf_indexed_exact (attested r8) → ann_admit_indexed_exact (NEW r9:
    #     the stored-index lifecycle PLUS the triad's closure admission
    #     under the recursive-CTE oracle — the first hash-checked
    #     admission row; strictly more surface than the probe-only row)
    #   containment_near_dups_indexed (attested r7/r8) →
    #     phash_admit_indexed_exact (NEW r9: the Hamming store's admission
    #     under the SAME recursive-CTE oracle — exact at the production
    #     banding, since ≤3-bit pigeonhole banding is lossless)
    # (exact_dup_clusters' 0-row gap closed r12 with planted clones; it
    # is seatable — and seated — below.)
    # r12 rotation: ALL 50 seats are first-time entrants — every r11 seat
    # is driver-attested (50/50 green r11) and evicted to pytest oracle
    # coverage; every entrant was pre-validated green at sf0.01 (this
    # round's full 271-query sweep + individual runs for the five new
    # rows), all scalar-typed with non-zero rows. Entrants: the 45
    # never-attested backlog rows below (verdict ask #1: seat >=30) plus
    # five NEW oracle rows (asks #2-#4): ann_ingest_loop_compacting_exact
    # (mid-stream ivf_index_compact proven result-invisible against the
    # identical loop oracle), ivf_index_stats_exact (pinned-centroid
    # fixture store, stats hash-checked), sig_admit_indexed_exact
    # (MinHash-store single-call admission vs exact-Jaccard closure),
    # events_sketch_error_bounded (HLL rollup estimate pinned within 5%
    # of exact per group), phash_delta_admit_indexed (converted from
    # rows-only: banded frame incl. band0..3 now hash-checked).
    # Deferred to r13 (green sweep, large compare outputs):
    # media_audio_windows, hard_negatives_topk, contrastive_negatives,
    # events_latest_per_user_day, span_cleaned_corpus
    # (+ embedding_normalize, permanently unseatable: Array output).
    # r13 rotation: the never-attested backlog CLOSES and oldest-first
    # re-attestation begins (r12 verdict asks #1-#2). All 50 r12 seats
    # are green r12 and evict to pytest oracle coverage. Entrants:
    #   (a) the 9 last never-attested seatable rows — the five deferred
    #       from r12 plus the four sketch-bound twins registered after
    #       the r12 window froze (approx_source_overlap_bounded's
    #       tolerance floor now scales with the HLL 3-sigma noise, so
    #       the seat is not SF-fragile — r12 advice);
    #   (b) the 41 STALEST attested rows, oldest-first by last driver
    #       record, alphabetical within a round (the auditable rule
    #       `tools/attestation_status.py --stale` prints): all of
    #       r2 (11) + r3 (4) + r4 (1) + r5 (12) + the first 13 of r6.
    #       Their plans have since been through the barrier /
    #       two-phase-window / local_frame waves with only pytest
    #       sf0.001 coverage — these are exactly the rows whose driver
    #       evidence is stalest.
    # embedding_normalize resolved: demoted to rows-only (Array output
    # is driver-unhashable by structure; the array-value oracle check
    # moved to tests/test_r13_ops.py and the scalar digest sibling
    # carries the driver row), so attestation_status can reach
    # driver_attested == oracle_backed.
    # (a) never-attested backlog — final 9
    "approx_source_overlap_bounded",
    "contrastive_negatives",
    "events_approx_percentiles_bounded",
    "events_approx_users_bounded",
    "events_latest_per_user_day",
    "hard_negatives_topk",
    "join_size_estimate_bounded",
    "media_audio_windows",
    "span_cleaned_corpus",
    # (b) stale re-attestation, oldest-first: last attested r2
    "datadiff_lineitem_hashmode",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q22_idle_balances",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    # last attested r3
    "datadiff_dataset_summary",
    "datadiff_fingerprint",
    "datadiff_lineitem_rowset",
    "datadiff_lineitem_summary",
    # last attested r4
    "user_running_stats",
    # last attested r5
    "clicks_before_purchase",
    "cohort_retention",
    "datadiff_lineitem_directional",
    "events_pivot_by_type",
    "events_props_rollup",
    "events_rollup_cascade",
    "events_value_histogram",
    "nation_coverage_setops",
    "orders_customer_rollup",
    "orders_rollup_hierarchy",
    "q21_sole_late_supplier",
    "quality_score",
    # last attested r6 (first 13 alphabetically; the rest queue for r14)
    "corpus_hash_split",
    "cosine_topk",
    "datadiff_incremental",
    "dedup_exact_corpus",
    "embedding_covariance",
    "embedding_near_dups",
    "events_hourly_rollup",
    "jaccard_near_dups",
    "media_catalog",
    "profile_lineitem",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
]


def _ordered() -> list[str]:
    window = [n for n in _DRIVER_WINDOW if n in _REGISTRY]
    if len(window) != len(_DRIVER_WINDOW):
        missing = sorted(set(_DRIVER_WINDOW) - set(_REGISTRY))
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    pinned = set(window)
    return [*window, *(n for n in _REGISTRY if n not in pinned)]


def queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name][0] for name in _ordered()}


def oracles() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _ordered()
        if _REGISTRY[name][1] is not None
    }




# ---------------------------------------------------------------------------
# Family query modules (split r13). Imported for their @register side
# effects, in the original single-file order, so registration order — and
# therefore the driver's post-window ordering — is preserved. Each module
# does `from magiceye_spark.registry import register`, which is safe here:
# register is defined above this import block.
from magiceye_spark.queries import (  # noqa: E402,F401
    schema_rows as _schema_rows,
    datadiff_rows as _datadiff_rows,
    analytics_rows as _analytics_rows,
    events_rows as _events_rows,
    llmops_rows as _llmops_rows,
    extra_rows as _extra_rows,
    late_rows as _late_rows,
)

# Back-compat re-exports (external callers predate the split):
# __spark_entry__ drives schema_diff_full as the flagship; tests import
# the two loop/perturbation helpers directly from registry.
from magiceye_spark.queries.schema_rows import schema_diff_full  # noqa: E402,F401
from magiceye_spark.queries.datadiff_rows import _perturbed_lineitem  # noqa: E402,F401
from magiceye_spark.queries.llmops_rows import _loop_batches_to_stream  # noqa: E402,F401
