"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q9_profit_by_nation_year",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_item_revenue",
    "q2_min_cost_supplier",
    "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "a1_events_per_day",
    "a7_weekly_lag",
    "a10_user_timing",
    "window_running_total",
    "window_rolling_7day_value",
    "rollup_events",
    "pivot_events_daily",
    "join_orders_without_lineitems",
    "text_quality_flags",
    "chunk_sliding_window",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "anns_bruteforce_topk",
    "anns_lsh_bucketed",
    "anns_filtered_topk",
    "anns_bq_hamming_topk",
    "anns_label_maxsim_topk",
    "hybrid_fusion_topk",
    "sparse_vectors_build",
    "embed_documents",
    "sparse_bm25_topk",
    "rag_retrieve_citations",
    "rag_rerank_lexical",
    "rag_mmr_rerank",
    "interval_join_click_purchase",
    "asof_join_last_purchase",
    "anns_grouped_topk",
    "chat_session_history",
    "ingest_pipeline_e2e",
    "multimodal_image_stats",
    "gopher_quality_filters",
    "lm_perplexity_score",
    "decontaminate_benchmark_overlap",
    "pii_redaction",
    "pack_concat_chunks",
    "pack_greedy_firstfit",
    "boilerplate_sentence_dedup",
    "quality_tempered_sample",
    "curate_corpus_e2e",
    "domain_mixture_resample",
    "decontaminate_fuzzy_minhash",
    "embedding_quantize_int8",
    "anns_lsh_multiprobe",
    "intradoc_line_dedup",
    "dedup_substring_spans",
    "dedup_semantic_keep",
    "knn_graph_lsh",
    "curriculum_quality_phases",
    "vocab_top_coverage",
    "funnel_view_click_purchase",
    "text_winnow_fingerprint",
    "daily_anomaly_zscore",
    "top_terms_by_source",
    # probe-only latency: ivf_build/pq_build persist their indexes on
    # the first (warm-up) call, so best-of-N measures the serve path
    "anns_ivf_topk",
    "anns_ivfpq_topk",
    # round 4: parity chunkers, tokenizer-prep pair stats, the
    # 4-strategy recall report, clustering, and the sketch query
    "chunk_markdown_reference",
    "chunk_token_budget_bpe",
    "chunk_word_budget",
    "bpe_pair_counts",
    "anns_recall_report",
    "anns_ivf_filtered_topk",
    "dedup_connected_components",
    "sketch_cardinality_quantiles",
    "seq_len_histogram",
    # round 5: perceptual-hash image dedup, cross-encoder re-rank
    # (stub model boundary), per-doc tf-idf keywords
    "multimodal_phash_dedup",
    "rag_rerank_crossencoder",
    "tfidf_top_terms",
    "text_nfc_normalize",
    # round 5: exact-integer Lloyd k-means + bit-exact JL projection
    "embed_kmeans",
    "embed_random_projection",
    "epoch_shuffle_shards",
    "cluster_cartography",
    "knn_pagerank",
    "sketch_countmin_heavyhitters",
    "dedup_bloom_prefilter",
    "anns_hard_negatives",
    # round 5 third wave: learned-gate selection, layout, and
    # dimension-history operators
    "quality_classifier_hashed",
    "token_budget_sample",
    "zorder_layout",
    "scd2_user_segments",
    "text_sentence_split",
    # round 6: point-in-time SCD2 join, deterministic HLL, next-event
    # pairs, RRF fusion, MRL two-stage serving, triplet mining
    "scd2_point_in_time_join",
    "sketch_hll_distinct_users",
    "nextevent_training_pairs",
    "hybrid_rrf_fusion",
    "anns_matryoshka_topk",
    "contrastive_triplets",
    "retrieval_metrics_report",
    "anns_late_interaction_topk",
    "corpus_snapshot_diff",
    "table_profile_documents",
    "span_corruption_pairs",
    "knn_triangle_count",
    "embedding_standardize",
    "retention_cohorts",
    "text_readability",
    "dsir_importance_weights",
    "knn_label_propagation",
    "pmi_collocations",
    "stratified_holdout_split",
    "weighted_sample_es",
    "compaction_plan",
    "zipf_fit_report",
    "k_anonymity_report",
    "markov_transition_stationary",
    "dedup_edit_distance",
    "ab_test_conversion",
    "pca_top_component",
    "lang_confusion_report",
    "session_trigram_mining",
    "hll_set_operations",
    "bpe_learn_merges",
    "seasonal_decompose_daily",
    "embedding_isotropy_report",
    "interarrival_histogram",
    "text_char_entropy",
    "kwic_concordance",
    "ohlc_daily_by_type",
    "twap_by_user",
    "event_debounce",
    "text_code_detect",
    # round 7: LSH-shortlisted MaxSim serving (the production
    # late-interaction path the recall report now grades)
    "anns_late_interaction_served",
    # round 7: two-phase salted exact-distinct over a power-law key
    "skewed_distinct_salted",
    # round 7: tokenizer lifecycle completion + batching planner +
    # last-touch attribution
    "bpe_encode_corpus",
    "seqlen_bucketing",
    "funnel_attribution",
    # round 7: multi-table data-contract suite (shared scans +
    # broadcast anti-joins over the largest tables)
    "data_quality_expectations",
    # round 7: bounded synchronous k-core peel over the kNN graph
    "knn_kcore",
    # round 7: landmark BFS hop distances over the kNN graph
    "knn_bfs_landmarks",
    # round 7: positional-postings phrase AND
    "phrase_match_positional",
    # round 7: natural-vs-Morton zone-map skipping comparison
    "zonemap_skipping_report",
    # round 7: basket-analysis co-occurrence + exact lift
    "item_cooccurrence_lift",
    # round 7: per-dim snapshot drift in exact micro-units
    "embedding_drift_report",
    # round 7: the reproducible dataset datasheet (multi-table scan)
    "dataset_card_report",
    # round 7: kNN density outlier screen (reads the graph build once)
    "knn_density_outliers",
    # round 7: per-source near-dup rate off the first-seen verdicts
    "dup_rate_by_source",
    # round 7: bigram continuation table (in-row pair build + topk)
    "ngram_nextword_topk",
    # round 7: exact threshold (range) retrieval face
    "anns_range_search",
    # round 7: right-to-be-forgotten cascade dry run over the big tables
    "erasure_impact_report",
    # round 7: market-basket pairs over the big fact table
    "part_cooccurrence_topk",
    # round 7: hopping-window TVF (4x map-side expansion + one shuffle)
    "hopping_window_counts",
    # round 7: first-occurrence shingle novelty over the corpus
    "doc_novelty_score",
    # round 8: Gonzalez greedy k-center coreset selection + assignment
    "coreset_kcenter_select",
    "coreset_kcenter_append",
    # round 8: group-aware temporal split + leakage audit
    "temporal_leakage_split",
    # round 8: water-filling per-source token budget allocation
    "token_budget_waterfill",
    # round 8: exact pair-counting purity/ARI of clusters vs labels
    "cluster_label_agreement",
    # round 8: PSI distribution drift between time halves
    "psi_value_drift",
    # round 8: two-phase Pareto-front (skyline) doc selection
    "skyline_quality_docs",
    # round 8: Theil-Sen robust daily trend per event type
    "theilsen_daily_trend",
    # round 8: three-clause MERGE INTO + CDC last-writer-wins apply
    "merge_into_customers",
    "cdc_apply_orders",
    # round 7: fact-fact supplier fulfillment-lag scorecard
    "ship_lag_by_supplier",
    # round 9: record linkage / relevance feedback / eval surfaces
    "entity_resolution_golden",
    "er_append",
    # round 10: periodic full re-resolve (append + reresolve == scratch)
    "er_reresolve",
    "prf_query_expansion",
    "group_kfold_split",
    "score_decile_lift",
    "bootstrap_mean_ci",
    "knn_label_disagreement",
    # round 11: margin-criterion bitext mining, M4 pixel downsample,
    # t-closeness distribution-distance privacy audit, embedding-
    # breakpoint semantic chunker
    "bitext_margin_pairs",
    "m4_downsample_events",
    "t_closeness_report",
    "chunk_semantic_split",
    "chunk_content_defined",
    "cdc_dedup_report",
    # round 12: LSH-shortlisted bitext production face; CDC-anchored
    # incremental re-embedding
    "bitext_margin_mined",
    "cdc_incremental_embed",
    # round 12 batch 2: int8 scalar-quantized ANN serve path, Manku
    # multi-index simhash hamming pairing, export shard manifest,
    # dictionary keyword tagging
    "anns_sq_topk",
    "dedup_simhash_hamming",
    "shard_manifest_offsets",
    "keyword_tag_docs",
    # round 12 batch 3: Kneser-Ney bigram LM, asymmetric containment
    "kneser_ney_bigram_topk",
    "dedup_containment_verify",
    # round 12 batch 4: LSH-shortlisted range retrieval
    "anns_range_search_lsh",
    # round 12 batch 5: kNN-graph connected components (Hash-to-Min)
    "knn_connected_components",
    # round 12 batch 6: eval-canary verbatim leak scan
    "canary_contamination_scan",
]

# PINNED CORE (r8, VERDICT item 7): a frozen 30-query subset that NEVER
# rotates, so suite walls are comparable round over round even as the
# full HEADLINE grows/swaps. Spans every family: TPC-H star joins,
# event aggs/windows, text quality, chunkers, dedup (exact-shape,
# MinHash, semantic, substring), ANN (brute/LSH/recall/hybrid/BM25),
# RAG, ingest e2e, curation filters, tokenizer, multimodal, clustering.
# Append-only evolution happens in HEADLINE; this list is immutable --
# changing it breaks the round-over-round `headline_core_wall_seconds`
# comparison, so don't.
HEADLINE_CORE = [
    "q1_pricing_summary", "q3_shipping_priority",
    "q9_profit_by_nation_year", "q18_large_volume_customers",
    "a1_events_per_day", "window_running_total", "rollup_events",
    "pivot_events_daily", "text_quality_flags", "chunk_sliding_window",
    "dedup_minhash_lsh", "dedup_embedding_cosine",
    "dedup_substring_spans", "anns_bruteforce_topk",
    "anns_lsh_bucketed", "anns_recall_report", "hybrid_fusion_topk",
    "sparse_bm25_topk", "embed_documents", "rag_retrieve_citations",
    "ingest_pipeline_e2e", "gopher_quality_filters",
    "lm_perplexity_score", "decontaminate_benchmark_overlap",
    "bpe_pair_counts", "chunk_token_budget_bpe",
    "multimodal_image_stats", "embed_kmeans", "tfidf_top_terms",
    "text_nfc_normalize",
]
assert len(HEADLINE_CORE) == 30 and set(HEADLINE_CORE) <= set(HEADLINE)

# r13 (r12-VERDICT item 1): the compact stdout line's shrink ladder used
# to cut the query map to the N SLOWEST queries, so the driver's
# round-over-round PERF comparison saw two near-disjoint windows (r12:
# 8 phantom "dropped_from_bench", a 4-query geomean). The emitted map
# must be a STABLE set: always the frozen HEADLINE_CORE 30, plus the
# names the previous round's compact line carried (so nothing the
# driver last saw ever vanishes), plus as many slowest extras as the
# char budget still allows. COMPACT_COMPAT is the r12 emitted set;
# append names here whenever a round's compact line carried an extra
# (never remove -- removal is exactly the phantom-drop bug).
COMPACT_COMPAT = [
    "entity_resolution_golden", "sketch_countmin_heavyhitters",
    "q2_min_cost_supplier", "contrastive_triplets",
    "dedup_connected_components", "bitext_margin_mined",
    "cluster_cartography", "cluster_label_agreement", "knn_pagerank",
    "coreset_kcenter_append", "quality_classifier_hashed",
    # embed_kmeans also appeared in r12's line; it is in HEADLINE_CORE
]
assert set(COMPACT_COMPAT) <= set(HEADLINE)

# r13 (r12-VERDICT item 8): drift normalization anchor. The r11 driver
# machine measured calibration_cpu_sec 0.459; the compact line reports
# core_wall * (0.459 / this_run_calib_cpu) so a judge can separate
# machine drift from code change in one field. The anchor is FROZEN --
# renormalizing to a newer round would silently re-base the series.
CALIB_CPU_ANCHOR_R11 = 0.459

# r12 (r11-VERDICT item 4): queries that UNION many persisted matviews
# pay a first-touch cost (page cache, parquet footer reads) on their
# first serve run even when the store is warm ON DISK -- with build
# attribution already landed, anns_recall_report (a union over the 8
# stored per-strategy leg reports) still spread 5.2x with
# matview_build_seconds empty. Queries listed here get ONE extra
# DISCARDED warm-up run before their timed runs, so the first touch is
# charged to neither the timing nor the spread statistic; the detail
# file records who was warmed (warmup_discarded).
MATVIEW_UNION_WARMUP = {"anns_recall_report"}

# BENCH COVERAGE RULE (enforced below, documented in docs/BENCHING.md):
# every registered query is either in HEADLINE (benched per-round) or
# named here with the exclusion category that justifies skipping it.
# A query absent from BOTH lists fails the bench immediately -- a new
# heavy operator cannot silently skip the bench the way queries could
# once skip the correctness artifact. Categories:
#   tpch-rep    cheap TPC-H variant; the benched 12-query TPC-H cohort
#               already covers every physical shape (agg/join/semi/
#               anti/exists/window) these reuse
#   agg-1shuf   single partial-aggregated shuffle over events, same
#               plan family as benched a1/a7/a10/rollup/pivot
#   window-rep  one window/sessionize pass over events, represented by
#               the benched window_running_total/rolling_7day cohort
#   map-only    pure codegen projection (no shuffle), represented by
#               the benched text_quality_flags/text_sentence_split
#   cheap-var   strictly cheaper variant of a benched family member
#               (e.g. exact dedup vs the benched MinHash/semantic path)
#   stub-bound  dominated by a deterministic stub boundary (multimodal
#               decode), structure benched via multimodal_image_stats
BENCH_EXCLUDED = {
    **{n: "tpch-rep" for n in [
        "q7_volume_shipping", "q8_market_share", "q11_important_stock",
        "q12_returnflag_priority", "q14_promo_revenue",
        "q15_top_supplier", "q16_part_supplier_counts",
        "q19_disjunctive_predicates", "q20_excess_volume_suppliers",
        "q22_idle_customer_balance",
    ]},
    **{n: "agg-1shuf" for n in [
        "a1_events_per_hour", "a2_value_stats_by_type",
        "a3_efficiency_by_type", "a4_error_rate_by_day",
        "a5_top20_events", "a6_summary", "a8_doc_distribution",
        "a9_backlog", "a11_json_props", "cube_events",
        "grouping_sets_events", "unpivot_daily_counts",
        "props_key_histogram", "corpus_quality_by_source",
        "skew_report_events", "ewma_control_chart", "rfm_segments",
        "acf_daily_counts", "cusum_control_chart", "mad_robust_anomaly",
        "anomaly_top_movers", "gini_user_activity",
        "hhi_source_concentration", "revenue_pareto_report",
        "lsh_bucket_histogram", "label_centroids",
        "embedding_health_report", "gatekeeper_failure_history",
        "stale_agents", "stream_windowed_counts",
        "set_click_and_purchase_users",
        "set_error_not_purchase_user_days", "l_diversity_report",
        "benford_value_audit",
    ]},
    **{n: "window-rep" for n in [
        "window_first_event_per_user", "window_forward_fill",
        "window_last_n_per_user", "window_value_quartiles",
        "seq_pattern_match", "time_to_event_labels",
        "latency_percentiles_exact", "arrival_lateness_report",
        "winsorized_value_stats", "conversion_lag_histogram",
        "rolling_distinct_users_7d", "sessionize_events",
        "sessionize_session_window", "chat_session_history_ttl",
        "join_customers_with_purchases", "bounce_rate_daily",
        "session_duration_percentiles",
    ]},
    **{n: "map-only" for n in [
        "text_fingerprint", "text_lang_id", "text_slugify",
        "text_token_stats", "content_addressed_ids",
    ]},
    # per-doc counters + one 5-row groupBy; counter family already
    # benched via text_token_stats' plan shape (agg-1shuf over docs)
    "tokenizer_fertility_by_lang": "agg-1shuf",
    **{n: "cheap-var" for n in [
        "dedup_exact", "dedup_simhash", "dedup_jaccard_verify",
        "dedup_lsh_firstseen", "dup_cluster_size_histogram",
        "chunk_markdown_docs", "corpus_sample_split",
        "domain_cap_sample",
    ]},
    **{n: "stub-bound" for n in [
        "multimodal_audio_frames", "multimodal_video_keyframes",
    ]},
    # rank-correlation readout over two already-benched serve faces
    # (same double-timing rationale as the recall legs below)
    "anns_prefilter_fidelity": "recall-leg",
    # per-strategy recall legs (r9): each is one already-benched serve
    # plan + a tiny gold-matview join; the omnibus anns_recall_report
    # (benched) unions their persisted outputs -- benching the legs
    # would double-time the serve paths
    **{n: "recall-leg" for n in [
        "anns_recall_lsh", "anns_recall_lsh_multiprobe",
        "anns_recall_ivf", "anns_recall_ivfpq", "anns_recall_bq",
        "anns_recall_matryoshka", "anns_recall_hardneg",
        "anns_recall_late_interaction", "anns_recall_sq",
        "anns_recall_range_lsh",
    ]},
}


def assert_bench_coverage(queries: dict) -> None:
    """The coverage rule as a hard assertion: benched + excluded must
    exactly tile the registry, with no overlap and no stragglers."""
    reg = set(queries)
    hl = set(HEADLINE)
    exc = set(BENCH_EXCLUDED)
    problems = []
    if hl - reg:
        problems.append(f"HEADLINE names not in registry: {sorted(hl - reg)}")
    if exc - reg:
        problems.append(f"excluded names not in registry: {sorted(exc - reg)}")
    if hl & exc:
        problems.append(f"both benched and excluded: {sorted(hl & exc)}")
    missing = reg - hl - exc
    if missing:
        problems.append(
            "registered but neither benched nor excluded (add to "
            f"HEADLINE or BENCH_EXCLUDED with a category): {sorted(missing)}"
        )
    if problems:
        raise SystemExit("bench coverage rule violated:\n  "
                         + "\n  ".join(problems))


# embedding-only paths get full best-of-N; the heavier doc/hybrid paths
# best-of-2 (they rebuild per-corpus matviews on the first run)
SCALE_QUERIES = ["dedup_embedding_cosine", "anns_lsh_bucketed",
                 "anns_grouped_topk", "dedup_semantic_keep",
                 "embed_kmeans", "embed_random_projection",
                 # r9: the r8-new embedding-path heavy family
                 "coreset_kcenter_select", "coreset_kcenter_append",
                 "cluster_label_agreement"]
DOC_SCALE_QUERIES = ["dedup_minhash_lsh", "decontaminate_fuzzy_minhash",
                     "hybrid_fusion_topk", "dedup_substring_spans",
                     # r9: two-phase distributed skyline over documents
                     "skyline_quality_docs",
                     # r9: linkage/eval family (needs lang/source in
                     # the 10x corpus -- the generator carries them)
                     "entity_resolution_golden", "er_append",
                     "er_reresolve",
                     "prf_query_expansion", "bootstrap_mean_ci"]
# r9: the warehouse pair reads orders/customer -- the scale dir grows
# key-offset replicas of both so MERGE/CDC run on a 10x keyspace
TABLE_SCALE_QUERIES = ["cdc_apply_orders", "merge_into_customers"]

# ----------------------------------------------------------------------
# STANDING RATIO ADJUDICATIONS (r12, r11-VERDICT item 1). The in-suite
# single-shot 1x/10x ratio on a sub-second denominator has ~2x spread,
# so the same adjudicated crossers re-flagged every round and ate a
# re-adjudication cycle each time (r9/r10/r11). A name listed here has
# a WRITTEN verdict (PLANS.md adjudication sections; evidence commit in
# parentheses): when its derived ratio crosses RATIO_FLAG_BAR the bench
# emits `{name}_scale_ratio_verdict` next to the number, so the reader
# sees the standing verdict instead of a fresh flag. The map never
# suppresses the measured ratio itself, and it is NOT a blanket waiver:
# `tools/scale_ratio_spot.py` (fresh JVM, interleaved best-of) remains
# the arbiter for any NEW crosser and for retiring/revising an entry.
# ----------------------------------------------------------------------
RATIO_FLAG_BAR = 3.0
RATIO_ADJUDICATED = {
    "cdc_apply_orders": (
        "data-genuine",
        "feed grows exactly 10x by construction; plan already minimal "
        "one-shuffle max_by; 1x wall ~0.3s (r10 adjudication, e0952b0)"),
    "decontaminate_fuzzy_minhash": (
        "data-genuine",
        "verified-pair volume grows exactly 10x (414->4184); fresh "
        "spots 2.43-2.56 (r8/r9 adjudications)"),
    "dedup_minhash_lsh": (
        "noise",
        "fresh scale_ratio_spot 2.32 on unchanged one-pass banded "
        "plan (r11 adjudication, 923fbf0)"),
    "anns_lsh_bucketed": (
        "noise",
        "fresh scale_ratio_spot 2.14 (10x wall 2.03s) on unchanged "
        "stored-index probe plan (r12 spot)"),
}


def _emit_ratio(out: dict, name: str, best: float, best_1x: float) -> None:
    """Record one 10x scale measurement; annotate an adjudicated
    crosser with its standing verdict (never suppressing the number)."""
    out[f"{name}_10x_sec"] = round(best, 3)
    if best_1x <= 0:
        return
    ratio = round(best / best_1x, 2)
    out[f"{name}_scale_ratio_10x"] = ratio
    if ratio > RATIO_FLAG_BAR and name in RATIO_ADJUDICATED:
        verdict, evidence = RATIO_ADJUDICATED[name]
        out[f"{name}_scale_ratio_verdict"] = f"{verdict}: {evidence}"


def scale_evidence(spark, sf_dir, queries, timings, n_runs):
    """Direct evidence the vector and shingle paths are not quadratic:
    re-time the LSH-blocked queries on a 10x corpus and report the
    wall-time ratio -- linear candidate generation should land near
    10x (in practice lower, fixed overhead dominates at sf0.1), a
    quadratic blocking near 100x.

    One scale dir carries BOTH 10x tables so two-legged queries
    (hybrid fusion reads documents for BM25 and embeddings for the
    dense leg) run against a coherently scaled corpus:

    - embeddings: replicas decorrelated by deterministic sign flips so
      they behave like new data, not 10 stacked copies;
    - documents: every word suffixed per replica so shingles never
      collide across replicas (a correlated copy would measure the
      pair-explosion of planted duplicates, not the algorithm's
      growth). Replica 0 keeps original ids, so the query set
      (id < N_QUERIES) is FIXED while the corpus grows 10x."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out = {}
    d = tempfile.mkdtemp(prefix="sparkgraft_scale10x_")
    try:
        base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        big = base.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    F.pmod(i + F.col("rep"), F.lit(3)) == 0, -x
                ).otherwise(x),
            ).alias("embedding"),
            "label",
        )
        big.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

        base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        parts = []
        for rep in range(10):
            parts.append(
                base_docs.select(
                    (F.col("doc_id") + rep * 10_000_000).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", f"$1x{rep}")
                    .alias("text"),
                    # carried through for the linkage/eval cohort;
                    # lang stays (ER's field rule), source gets a
                    # per-replica suffix so group-keyed queries see a
                    # 10x group space, not 10x-heavier groups
                    "lang",
                    F.concat(F.col("source"), F.lit(f"r{rep}"))
                    .alias("source"),
                )
            )
        bigd = parts[0]
        for p in parts[1:]:
            bigd = bigd.unionByName(p)
        bigd.write.mode("overwrite").parquet(f"{d}/documents.parquet")

        # 10x orders/customer for the warehouse pair: replicas shift
        # every key by a disjoint offset (orderkey, custkey, and the
        # customer table's custkey move together), so the MERGE join
        # keyspace and the CDC per-key groups both grow 10x -- no
        # planted cross-replica collisions, no fixed hot keys
        base_ord = spark.read.parquet(f"{sf_dir}/orders.parquet")
        big_ord = base_ord.crossJoin(reps).select(
            (F.col("o_orderkey") + F.col("rep") * 1_000_000_000)
            .alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * 100_000_000)
            .alias("o_custkey"),
            *[c for c in base_ord.columns
              if c not in ("o_orderkey", "o_custkey")],
        )
        big_ord.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        base_cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        big_cust = base_cust.crossJoin(reps).select(
            (F.col("c_custkey") + F.col("rep") * 100_000_000)
            .alias("c_custkey"),
            *[c for c in base_cust.columns if c != "c_custkey"],
        )
        big_cust.write.mode("overwrite").parquet(f"{d}/customer.parquet")

        # the ratio must compare 1x and 10x under IDENTICAL JVM
        # conditions: by this point the bench JVM has run the whole
        # headline suite and sits in a different GC/code-cache state
        # than when `timings` was collected, which was observed to
        # inflate doc-path ratios ~2-3x. Re-time the 1x corpus here,
        # interleaved with the 10x runs, and derive the ratio from
        # that; the main-loop timing stays reported separately.
        for name, runs in ([(n, n_runs) for n in SCALE_QUERIES]
                           + [(n, min(n_runs, 2)) for n in DOC_SCALE_QUERIES]
                           + [(n, min(n_runs, 2))
                              for n in TABLE_SCALE_QUERIES]):
            if name not in queries or name not in timings:
                continue
            best_1x = float("inf")
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best_1x = min(best_1x, time.time() - t0)
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            _emit_ratio(out, name, best, best_1x)

        # knn graph: apply the documented signature-width rule on BOTH
        # corpora (knn_bits_for) -- with bits pinned, within-bucket
        # pair expansion is quadratic in N, so a fixed-bits 10x run
        # would measure the un-tuned config, not the operator's
        # linear-at-constant-occupancy scale shape
        from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
            knn_bits_for, knn_graph)

        n1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        # size from the GENERATED corpus's actual count, not 10*n1: if
        # the generator's planting ratio ever changes, an assumed count
        # would quietly measure a mis-sized signature config
        n10 = spark.read.parquet(f"{d}/embeddings.parquet").count()
        best_1x = best = float("inf")
        for _ in range(min(n_runs, 2)):
            t0 = time.time()
            knn_graph(spark, sf_dir, bits=knn_bits_for(n1)).write.format(
                "noop").mode("overwrite").save()
            best_1x = min(best_1x, time.time() - t0)
            t0 = time.time()
            knn_graph(spark, d, bits=knn_bits_for(n10)).write.format(
                "noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        _emit_ratio(out, "knn_graph_sized", best, best_1x)

        out.update(append_scale_evidence(spark, sf_dir, d, n_runs))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        # drop the matview / index tables materialized for the
        # throwaway scale dir (tagged by md5 of its path)
        import glob
        import hashlib

        tag = hashlib.md5(d.encode()).hexdigest()[:8]
        here = os.path.dirname(os.path.abspath(__file__))
        for p in glob.glob(
            os.path.join(here, "spark-warehouse", "matview", f"*_{tag}")
        ):
            shutil.rmtree(p, ignore_errors=True)
    return out


def machine_calibration(spark) -> dict:
    """MACHINE FINGERPRINT (r10-VERDICT item 1): two fixed synthetic
    no-I/O jobs timed at every bench run, so round-over-round deltas
    can be adjudicated against measured machine drift instead of
    paging on it -- the r9->r10 close compared walls across a ~1.2-1.5x
    environment drift that took a worktree A/B to diagnose.

    - cpu: whole-stage-codegen aggregate over a generated range with a
      PINNED partition count (no file I/O, no shuffle, no Python);
    - shuffle: one fixed-cardinality hash-aggregate exchange.

    Both best-of-2. ``tools/close_round.py`` divides the fresh cpu
    fingerprint by the committed baseline's and relaxes the regression
    bar by that factor (never tightens), printing the drift either
    way. The jobs are pure generated-data codegen, so the numbers move
    with the machine, not with engine code."""
    def best2(run) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return round(best, 3)

    cpu = best2(lambda: (
        spark.range(0, 1_500_000_000, 1, 64)
        .selectExpr("sum(id * 3 + 7) AS s", "avg(id) AS a")
        .write.format("noop").mode("overwrite").save()
    ))
    shuf = best2(lambda: (
        spark.range(0, 60_000_000, 1, 64)
        .selectExpr("pmod(id, 1000000) AS k")
        .groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
    ))
    return {"calibration_cpu_sec": cpu, "calibration_shuffle_sec": shuf}


def rdd_residency(spark) -> dict:
    """Block-manager residency snapshot (r12-VERDICT item 4): count and
    bytes of every RDD currently cached/checkpointed in the JVM. The
    suite JVM runs 190 queries x N runs; localCheckpoint blocks live
    until driver-side GC drops the RDD, so unbounded growth here is the
    suspected driver of the contended-run pathology. Driver-side
    introspection only -- no job is launched, nothing is timed."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {
            "n": len(infos),
            "mem_mb": round(sum(i.memSize() for i in infos) / 2**20, 1),
            "disk_mb": round(sum(i.diskSize() for i in infos) / 2**20, 1),
        }
    except Exception:  # pragma: no cover - introspection must never fail a run
        return {}


RETRIEVAL_BATCHES = 10   # micro-batches the streaming serve is timed over
RETRIEVAL_QUERIES = 200  # requests spread across them (20/batch)


def streaming_retrieval_evidence(spark, sf_dir):
    """Per-micro-batch latency of the STREAMING retrieval serve path
    (streaming/retrieval.retrieval_serve): the BASELINE.md anchor is
    the reference's ~400 ms p50 per chat request, and the batched
    `retrieval_ms_per_query_batched` metric alone leaves the streaming
    face unbenched. Queries arrive as RETRIEVAL_BATCHES one-file
    micro-batches against the persisted LSH index; p50 of Spark's own
    triggerExecution per non-empty batch is the serve latency (index
    build is untimed -- it is the batch job the serve path assumes)."""
    import shutil
    import tempfile

    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        _vectors, lsh_build)
    from selfhosted_rag_doc_chat_prototype_spark.streaming.retrieval import (
        retrieval_serve)

    from pyspark.sql import functions as F

    lsh_build(spark, sf_dir)
    base = _vectors(spark, sf_dir)
    qdf = base.filter(F.col("vec_id") < RETRIEVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    tmp = tempfile.mkdtemp(prefix="sparkgraft_serve_")
    try:
        qdir = os.path.join(tmp, "queries")
        qdf.repartition(RETRIEVAL_BATCHES).write.parquet(qdir)
        stream = (
            spark.readStream.schema(qdf.schema)
            .option("maxFilesPerTrigger", 1).parquet(qdir)
        )
        q = retrieval_serve(
            spark, sf_dir, stream,
            os.path.join(tmp, "replies"), os.path.join(tmp, "ckpt"),
            exclude_self=True,
        )
        q.awaitTermination(600)
        waits = sorted(
            p["durationMs"].get("triggerExecution", 0)
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        )
        if not waits:
            return {}
        n_queries = min(
            RETRIEVAL_QUERIES,
            base.filter(F.col("vec_id") < RETRIEVAL_QUERIES).count(),
        )
        p50 = float(waits[len(waits) // 2])
        per_batch = n_queries / len(waits)
        return {
            "retrieval_serve_p50_ms": round(p50, 1),
            "retrieval_serve_ms_per_query": round(p50 / per_batch, 1),
            "retrieval_serve_queries_per_batch": round(per_batch, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


APPEND_BATCH = 200  # the steady-state micro-batch an index serves


def append_scale_evidence(spark, sf_dir, d10, n_runs):
    """Index-lifecycle mutations at 10x: appending a FIXED-size batch
    to the persisted LSH and IVF-PQ indexes must cost ~the same against
    a 10x archive as against 1x (the incremental contract: sign/encode
    only the batch, anti-join the archive's id column, append parquet
    -- nothing re-reads archive vectors). Ratio ~1 is the pass shape;
    ~10 would mean the append secretly re-processes the archive.

    The 1x archive is a THROWAWAY copy of the corpus: appends mutate
    the persisted matview, and appending synthetic rows to the real
    corpus's index would desync it from the embeddings table the
    DuckDB oracles recompute from. Each timed run appends a DISTINCT
    id range -- the appends are idempotent, so re-appending the same
    ids would time the skip path, not the write."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.pq import (
        pq_append, pq_build)
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        lsh_append, lsh_build)

    out = {}
    d1 = tempfile.mkdtemp(prefix="sparkgraft_scale1x_")
    try:
        # vec_ids shifted so the copy's corpus_key fingerprint DIFFERS
        # from the real corpus's: a byte-identical copy would stamp its
        # throwaway matviews with the production key, and a crash
        # before the finally-cleanup would then permanently alias them
        # into the IVF/PQ oracles' corpus_key-filtered globs
        (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .withColumn("vec_id", F.col("vec_id") + 50_000_000)
         .write.parquet(f"{d1}/embeddings.parquet"))
        # untimed: build both archives' indexes (batch index build)
        lsh_build(spark, d1)
        lsh_build(spark, d10)
        pq_build(spark, d1)
        pq_build(spark, d10)

        batch_base = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .limit(APPEND_BATCH).cache()
        )
        batch_base.count()

        for name, append_fn in [
            ("lsh_append", lsh_append),
            ("pq_append", pq_append),
        ]:
            best_1x = best = float("inf")
            for r in range(min(n_runs, 2)):
                for tag_dir, offset, record in [
                    (d1, 90_000_000 + r * 10_000, "1x"),
                    (d10, 95_000_000 + r * 10_000, "10x"),
                ]:
                    batch = batch_base.select(
                        (F.col("vec_id") + offset).alias("vec_id"),
                        "label", "embedding",
                    )
                    t0 = time.time()
                    append_fn(spark, tag_dir, batch)
                    dt = time.time() - t0
                    if record == "1x":
                        best_1x = min(best_1x, dt)
                    else:
                        best = min(best, dt)
            _emit_ratio(out, name, best, best_1x)

        # r10: DELETE at 10x -- a tombstone append + view rewrap must
        # cost ~the same against a 10x archive as against 1x (ratio ~1
        # is the pass shape; archive-proportional would be ~10, the
        # old rewrite design). Victims are the ids the append loop
        # just landed, so every delete removes REAL index rows; each
        # run deletes a DISTINCT range (tombstoning is idempotent, so
        # re-deleting would time a no-op view).
        from selfhosted_rag_doc_chat_prototype_spark.operators.pq import (
            pq_delete)
        from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
            lsh_delete)

        base_ids = [r.vec_id for r in batch_base.select("vec_id").collect()]
        half = len(base_ids) // 2
        for name, delete_fn, id_slice in [
            ("lsh_delete", lsh_delete, base_ids[:half]),
            ("pq_delete", pq_delete, base_ids[half:]),
        ]:
            best_1x = best = float("inf")
            for r in range(min(n_runs, 2)):
                for tag_dir, offset, record in [
                    (d1, 90_000_000 + r * 10_000, "1x"),
                    (d10, 95_000_000 + r * 10_000, "10x"),
                ]:
                    victims = [offset + i for i in id_slice]
                    t0 = time.time()
                    delete_fn(spark, tag_dir, victims)
                    dt = time.time() - t0
                    if record == "1x":
                        best_1x = min(best_1x, dt)
                    else:
                        best = min(best, dt)
            _emit_ratio(out, name, best, best_1x)
        batch_base.unpersist()
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        import glob
        import hashlib

        tag = hashlib.md5(d1.encode()).hexdigest()[:8]
        here = os.path.dirname(os.path.abspath(__file__))
        for p in glob.glob(
            os.path.join(here, "spark-warehouse", "matview", f"*_{tag}")
        ):
            shutil.rmtree(p, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import all_queries
    from selfhosted_rag_doc_chat_prototype_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    assert_bench_coverage(queries)
    names = [n for n in HEADLINE if n in queries]
    # extend with any headline-tagged queries from later phases
    extra = os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "")
    names += [n for n in extra.split(",") if n and n in queries and n not in names]
    # isolation mode (tools/bench_isolate.py drives one fresh JVM per
    # query through this): restrict to the named cohort and skip the
    # scale-evidence passes -- suite-load noise on a single JVM was
    # observed to inflate serve-path timings 16-34% with no plan change
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        requested = [n for n in only.split(",") if n]
        names = [n for n in requested if n in queries]
        unmatched = [n for n in requested if n not in queries]
        if not names:
            raise SystemExit(
                "SPARK_GRAFT_BENCH_ONLY matched no registered query: "
                f"requested={requested}; registry has {len(queries)} "
                f"queries, e.g. {sorted(queries)[:5]}"
            )
        if unmatched:
            print(f"# WARNING: unmatched bench-only names: {unmatched}",
                  file=sys.stderr)
    skip_scale = bool(only) or bool(
        os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALE", "")
    )

    # warm the JVM + parquet footer caches once (not timed)
    queries[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # machine fingerprint FIRST (r10-VERDICT item 1): pure synthetic
    # codegen jobs, timed before the suite can heat caches/GC state
    calibration = machine_calibration(spark)

    # matview-build attribution (r10-VERDICT item 5): a run that
    # CREATES a persisted matview directory is a BUILD run -- its wall
    # belongs to the one-time build phase, not the query's serve cost.
    # r10's worst spread (embed_documents 11.4x) was exactly this:
    # first-run matview cost charged to whichever query triggered it.
    # Detection is a cheap matview-root listdir around each run; build
    # runs are recorded in matview_build_seconds and EXCLUDED from the
    # spread statistic (best-of-N timings were always immune -- min()
    # never picks the build run).
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        matview_root)

    mv_root = matview_root()

    def mv_dirs() -> set:
        try:
            return set(os.listdir(mv_root))
        except FileNotFoundError:
            return set()

    # best-of-N per query (default 2): a single-JVM bench is exposed to
    # transient GC/JIT/background noise; the minimum is the stable
    # estimate of the plan's cost. N and the per-run times are reported.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    matview_builds: dict[str, float] = {}
    residency: dict[str, dict] = {}
    t_all = time.time()
    warmed: list[str] = []
    for name in names:
        if name in MATVIEW_UNION_WARMUP:
            # discarded first-touch run (see MATVIEW_UNION_WARMUP)
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            warmed.append(name)
        runs: list[float] = []
        serve_runs: list[float] = []
        for _ in range(n_runs):
            before = mv_dirs()
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            runs.append(dt)
            if mv_dirs() - before:
                matview_builds[name] = round(dt, 3)
            else:
                serve_runs.append(dt)
        timings[name] = round(min(runs), 3)
        # max/min across SERVE runs: >1.5 flags a timing polluted by
        # transient load, not a plan property (build runs attributed
        # separately above; all-build fallback keeps the stat defined)
        base = serve_runs or runs
        spread[name] = round(max(base) / max(min(base), 1e-9), 2)
        residency[name] = dict(
            rdd_residency(spark), t=round(time.time() - t_all, 1))
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - t_all, 3)
    # comparable-across-rounds wall: the frozen 30-query core only
    # (full-suite `value` keeps moving as HEADLINE grows)
    core = round(
        sum(timings[n] for n in HEADLINE_CORE if n in timings), 3
    )

    # derived throughput vs BASELINE.md anchors (reference: 10-15
    # docs/min ingest; ~400 ms/query retrieval p50)
    derived: dict[str, float] = {}
    if "ingest_pipeline_e2e" in timings:
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        derived["ingest_docs_per_min"] = round(
            60.0 * n_docs / timings["ingest_pipeline_e2e"], 1
        )
    if "rag_retrieve_citations" in timings:
        from selfhosted_rag_doc_chat_prototype_spark.operators.rag import N_QUERIES

        derived["retrieval_ms_per_query_batched"] = round(
            1000.0 * timings["rag_retrieve_citations"] / N_QUERIES, 1
        )

    if not skip_scale:
        derived.update(streaming_retrieval_evidence(spark, sf_dir))
        derived.update(scale_evidence(spark, sf_dir, queries, timings, n_runs))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # r13 (item-3 adjudication evidence): this sandbox is a VM with
    # measurable CPU steal that comes and goes WITHIN a run -- a
    # start-of-run fingerprint cannot see a mid-run steal window. A
    # second sample at the end brackets the run; a large start/end gap
    # flags the suite numbers as struck under moving host contention.
    calibration["calibration_cpu_sec_end"] = machine_calibration(spark)[
        "calibration_cpu_sec"]
    # drift-normalized core wall (r12-VERDICT item 8): what the frozen
    # 30-query core wall would read on the r11 anchor machine, per the
    # synthetic cpu fingerprint measured this run
    calib_cpu = calibration.get("calibration_cpu_sec") or CALIB_CPU_ANCHOR_R11
    calib_norm_core = round(core * CALIB_CPU_ANCHOR_R11 / calib_cpu, 3)
    result = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "headline_core_wall_seconds": core,
        "calibration_normalized_core_wall": calib_norm_core,
        "queries": timings,
        "run_spread_max_over_min": spread,
        "matview_build_seconds": matview_builds,
        "rdd_residency_after_query": residency,
        "warmup_discarded": warmed,
        "calibration": calibration,
        "derived": derived,
        "runs_per_query": n_runs,
        "wall_seconds_all_runs": wall,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
    }

    # full result -> committed file (the authoritative record); stdout
    # gets ONE compact line bounded under the driver's 2000-char tail
    # capture (BENCH_r02 recorded parsed:null because the verbose line
    # overflowed it), shrinking "derived" first and falling back to a
    # file pointer if the query map alone would still overflow.
    here = os.path.dirname(os.path.abspath(__file__))
    detail = "BENCH_isolate.json" if only else "BENCH_local.json"
    with open(os.path.join(here, detail), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")

    print(make_compact_line(result, detail))


def make_compact_line(result: dict, detail: str, budget: int = 1950) -> str:
    """ONE stdout line under the driver's ~2000-char tail capture.

    Emission contract (r12-VERDICT item 1): whenever the full query map
    does not fit, the emitted map is the frozen ``HEADLINE_CORE`` 30
    plus ``COMPACT_COMPAT`` (every name the previous round's compact
    line carried), then slowest extras as budget allows -- a STABLE set,
    so the driver's per-query round-over-round comparison never sees a
    phantom drop from truncation again."""
    timings = result["queries"]
    spread = result.get("run_spread_max_over_min", {})
    matview_builds = result.get("matview_build_seconds", {})
    derived = result.get("derived", {})
    compact = lambda obj: json.dumps(obj, separators=(",", ":"))
    anchors = {
        k: v for k, v in derived.items()
        if k in ("ingest_docs_per_min", "retrieval_ms_per_query_batched",
                 "retrieval_serve_p50_ms")
    }
    ratios = {
        k: v for k, v in derived.items()
        if k.endswith(("_scale_ratio_10x", "_scale_ratio_verdict"))
    }
    line = dict(result, detail_file=detail)
    # the per-query residency curve lives in the detail file; stdout
    # keeps the endpoint (cached-RDD count + bytes after the last query)
    residency = line.pop("rdd_residency_after_query", None) or {}
    if residency:
        last = residency[list(residency)[-1]]
        if last:
            line["residency_final"] = last
    # spread lives in the detail file; stdout keeps only its worst case
    worst = max(spread.items(), key=lambda kv: kv[1]) if spread else None
    line.pop("run_spread_max_over_min", None)
    if worst:
        line["worst_spread"] = {worst[0]: worst[1]}
    # build attribution lives in the detail file; stdout keeps the total
    line.pop("matview_build_seconds", None)
    if matview_builds:
        line["matview_build_total_sec"] = round(
            sum(matview_builds.values()), 1)
    # stable emitted set (r12-VERDICT item 1): when the full query map
    # does not fit, the driver's round-over-round comparison must still
    # see the SAME names every round -- the frozen HEADLINE_CORE 30
    # plus everything the previous round's compact line carried.
    # Slowest-N truncation is what produced r12's phantom drops.
    stable_names = [n for n in HEADLINE_CORE if n in timings]
    stable_names += [n for n in COMPACT_COMPAT
                     if n in timings and n not in HEADLINE_CORE]

    def truncate_to_stable():
        line.update(
            queries={n: round(timings[n], 2) for n in stable_names},
            queries_truncated_see_detail_file=True)

    # shrink order: the frozen core + compat query set and the derived
    # anchors survive everything; the per-query long tail and the scale
    # ratios live in the detail file when space runs out
    shrinks = [
        lambda: line.update(
            queries={k: round(v, 2) for k, v in timings.items()}),
        lambda: line.update(derived={**anchors, **ratios}),
        truncate_to_stable,
        lambda: line.update(derived=anchors),
        lambda: line.pop("derived", None),
    ]
    for shrink in shrinks:
        if len(compact(line)) <= budget:
            break
        shrink()
    if len(compact(line)) > budget:
        # last resort: the full record lives in the detail file
        line.pop("queries", None)
        line["queries_see_detail_file"] = True
    elif line.get("queries_truncated_see_detail_file") and "queries" in line:
        # back-fill remaining budget with the slowest non-stable extras
        # (deterministic slowest-first; first miss ends the fill)
        for n in sorted((n for n in timings if n not in set(stable_names)),
                        key=lambda n: -timings[n]):
            line["queries"][n] = round(timings[n], 2)
            if len(compact(line)) > budget:
                del line["queries"][n]
                break
    return compact(line)


if __name__ == "__main__":
    main()
