"""Regenerate PLANS.md: physical-plan evidence for the engine's scale
claims (pushdown, pruning, broadcast choice, shuffle count, codegen).

Usage: python tools/plan_audit.py [sf_dir]  (writes PLANS.md)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

AUDIT = [
    (
        "q3_shipping_priority",
        "Three-table join: both dimension sides broadcast; the fact scan "
        "keeps its filters and a 4-column ReadSchema.",
    ),
    (
        "a1_events_per_day",
        "Partial (map-side) aggregation before the single shuffle; scan "
        "prunes to (ts, value).",
    ),
    (
        "sparse_bm25_topk",
        "Map-only scoring: the only exchanges are the scalar-stats "
        "single-partition agg and its broadcast back; top-k is "
        "TakeOrderedAndProject, not a global sort.",
    ),
    (
        "dedup_minhash_lsh",
        "One pass: shingle explode -> codegen hash-aggregate (16 min "
        "columns, map-side combine) -> bucket groupBy -> within-bucket "
        "pair expansion. No self-join, no signature recompute.",
    ),
    (
        "anns_bruteforce_topk",
        "Query side broadcast; candidates never shuffle for scoring; "
        "per-query top-k via window after a single exchange of scored "
        "rows.",
    ),
    (
        "rag_retrieve_citations",
        "Retrieval joins broadcast the small sides (queries, then the "
        "k-row top-k against documents); dedup/renumber windows operate "
        "on Q*k rows only.",
    ),
    (
        "q9_profit_by_nation_year",
        "Four-dimension star join: part (with the PROMO filter pushed "
        "into its scan), supplier, and nation all broadcast; the fact "
        "scan prunes to the join/measure columns; one shuffle for the "
        "(nation, year) agg.",
    ),
    (
        "hybrid_fusion_topk",
        "Dense leg probes the persisted LSH signature index (bucket "
        "equi-join, no corpus-side signature pass); sparse leg reads the "
        "stored BM25 postings; per-leg prefetch (50/100) bounds the "
        "fusion windows to O(Q*150) rows independent of corpus size.",
    ),
    (
        "ingest_pipeline_e2e",
        "Arrow mapInPandas stages (extract/normalize/chunk) are map-only; "
        "the only shuffles are the per-document markdown assembly and "
        "the content-id dedup.",
    ),
    (
        "dedup_embedding_cosine",
        "LSH-blocked near-dup: Arrow matmul signatures (map-only) -> "
        "bucket groupBy -> within-bucket pair expansion -> two equi-joins "
        "to fetch vectors -> ONE vectorized cosine eval inside "
        "mapInPandas, with the threshold filter above the Python eval "
        "boundary so Catalyst cannot clone it into a join condition. "
        "Candidate count tracks duplicates, not N^2.",
    ),
    (
        "anns_lsh_bucketed",
        "Multi-table sign-LSH retrieval served from the persisted "
        "signature index: corpus side is a stored-table scan, query side "
        "signatures map-only and broadcast into the (table, bucket) "
        "equi-join, first-collision pair dedup is a local filter, "
        "per-query top-k windows over the candidate set only.",
    ),
    (
        "sparse_vectors_build",
        "Inverted-index build: one (doc, term) shuffle with map-side "
        "combine; vocab window runs over the vocabulary only; vocab and "
        "corpus stats broadcast back onto the postings.",
    ),
    (
        "gopher_quality_filters",
        "Repetition/quality metrics are pure whole-stage-codegen column "
        "expressions (sorted-gram linear aggregate, no Python, no "
        "shuffle): map-only over the pruned (doc_id, text) scan.",
    ),
    (
        "decontaminate_benchmark_overlap",
        "Benchmark gram set broadcast into a semi-join against the "
        "map-only corpus gram explode; one doc_id hash-aggregate with "
        "map-side combine. Nothing scales with corpus x benchmark.",
    ),
    (
        "pack_concat_chunks",
        "Concat-and-chunk packing: one shuffle on the shard key, then a "
        "running-sum window bounded to SHARD docs per partition -- no "
        "global ordering, shards parallelize freely.",
    ),
    (
        "dedup_connected_components",
        "Near-dup clustering: LSH candidate edges only (no all-pairs); "
        "each round is one equi-join of the cached edge set + a "
        "map-side-combined min aggregate + the pointer-jump self-join, "
        "ending in an eager localCheckpoint that truncates the logical "
        "lineage (the self-join would otherwise double the plan per "
        "round) -- the corpus is scanned once, not per round.",
    ),
    (
        "corpus_sample_split",
        "Deterministic hash-keyed sampling: map-only salted-md5 "
        "predicate on the pruned scan, no shuffle, no sort, stable "
        "under re-partitioning.",
    ),
    (
        "q6_forecast_revenue",
        "The whole query is scan-side: every predicate in "
        "PushedFilters, a 3-column ReadSchema, one map-side partial "
        "sum, and a single scalar exchange.",
    ),
    (
        "q4_order_priority",
        "EXISTS as LEFT SEMI with the late-shipment predicate inside "
        "the join condition: probing stops at first match, both scans "
        "stay pruned, then one 5-group aggregate.",
    ),
    (
        "boilerplate_sentence_dedup",
        "Sentence-frequency aggregate shuffles fixed-width xxhash64 "
        "keys (map-side combine), the surviving boilerplate set "
        "broadcasts back, and one doc_id aggregation re-assembles: "
        "never corpus x corpus.",
    ),
    (
        "curate_corpus_e2e",
        "Five curation stages in one DAG: flags are a map pass, dedup "
        "canon one hash groupBy, decontamination a broadcast "
        "semi-join, stitching joins all doc_id-keyed equi joins, "
        "packing a shard-bounded window.",
    ),
    (
        "quality_tempered_sample",
        "Tempered sampling is a pure map-only column expression over "
        "the pruned (doc_id, text) scan: zero shuffle at any corpus "
        "size.",
    ),
    (
        "q2_min_cost_supplier",
        "Correlated min decorrelated: the (part, supplier) pairs "
        "aggregate once, the per-part min joins back as a broadcast -- "
        "the fact table is scanned once and the join-back touches only "
        "aggregated rows.",
    ),
    (
        "q13_customer_order_distribution",
        "Left outer join preserves zero-order customers; two shuffles "
        "total (custkey agg, then the tiny count histogram), both with "
        "map-side combine.",
    ),
    (
        "q17_small_quantity_revenue",
        "Per-part threshold aggregates over the same part-pruned "
        "lineitem sliver and broadcasts back -- the Brand#3/SMALL "
        "filter semi-joins before any aggregation, so both passes "
        "touch only the target parts.",
    ),
    (
        "q19_disjunctive_predicates",
        "The OR of three (brand, size, quantity) branches stays a "
        "residual above the shared p_partkey broadcast join; quantity "
        "bounds remain eligible for row-group min/max skipping.",
    ),
    (
        "q21_sole_late_supplier",
        "EXISTS + NOT EXISTS collapsed to one per-(order, supplier) "
        "aggregate plus a per-order rollup -- a single lineitem "
        "shuffle, no self-joins; top-100 is TakeOrdered.",
    ),
    (
        "q22_idle_customer_balance",
        "Scalar avg is a 1-row broadcast (never collected); the "
        "recency anti-join shuffles only the filtered customer sliver "
        "against order custkeys.",
    ),
    (
        "decontaminate_fuzzy_minhash",
        "Corpus signatures once (single-pass banded aggregate); the "
        "benchmark side's bands BROADCAST into the candidate join -- "
        "no corpus shuffle keyed by bucket; Jaccard verification "
        "touches candidates only.",
    ),
    (
        "domain_mixture_resample",
        "One counting pass emits ~|domains| rows; rates broadcast "
        "back onto a map-only second pass -- no corpus-wide shuffle "
        "on the (skewed) domain key.",
    ),
    (
        "embedding_quantize_int8",
        "Per-vector symmetric scales keep quantization map-only "
        "codegen: no global stats pass, no shuffle, stable under "
        "re-ingest.",
    ),
    (
        "asof_join_last_purchase",
        "As-of join in union+window form: ONE shuffle on the key and a "
        "single ordered pass -- no unbounded range join, no per-key "
        "pair blow-up.",
    ),
    (
        "anns_grouped_topk",
        "Tenant-scoped retrieval over LSH candidates from the persisted "
        "signature index (label passes through the bucket join); the "
        "only shuffle is the per-(query, label) top-k window.",
    ),
    (
        "anns_ivfpq_topk",
        "IVF-PQ serve: per-query LUT (pandas UDF on the 8-row query "
        "side), broadcast probe list equi-joined to the stored code "
        "table, ADC scoring as a codegen higher-order fold over 16-byte "
        "codes, exact refine only on the Q*k*factor shortlist.",
    ),
    (
        "rag_rerank_lexical",
        "Cross-encoder-shaped rerank: BM25 prefetch from the stored "
        "postings caps candidates at Q*50; Jaccard scoring is codegen "
        "array arithmetic with the query token sets broadcast; final "
        "ordering windows over Q*50 rows.",
    ),
    (
        "rag_mmr_rerank",
        "MMR diversity selection: LSH prefetch from the persisted index "
        "bounds each query's candidate set; the greedy loop runs in "
        "applyInPandas keyed by query (one small Gram matrix per group) "
        "-- parallel across queries, bounded state.",
    ),
    (
        "anns_bq_hamming_topk",
        "Binary quantization: exhaustive xor+popcount prefilter over "
        "two packed 32-bit halves, fully codegen (no index, no Python, "
        "no float math in the scan); exact rerank on the Hamming "
        "shortlist only.",
    ),
    (
        "lm_perplexity_score",
        "CCNet perplexity: LM tables from the bounded md5-sample "
        "(hash aggregates), adjacent pairs via in-place slice transform "
        "(no positional self-join), LM broadcast into the scoring map "
        "pass, one per-doc aggregation.",
    ),
    (
        "window_rolling_7day_value",
        "Time-RANGE frame evaluated as a sliding two-pointer per user "
        "partition: linear in events, one shuffle.",
    ),
    (
        "intradoc_line_dedup",
        "Whole operator is one map-side projection: sentence array, "
        "keep-first filter, and re-assembly as higher-order functions "
        "over per-row arrays -- zero exchanges below the scan spread.",
    ),
    (
        "dedup_semantic_keep",
        "Cluster = table-0 sign-LSH bucket (map-only Arrow pass); "
        "in-cluster pair expansion bounds candidate volume; single "
        "vectorized cosine pass; dropped set broadcast back.",
    ),
    (
        "knn_graph_lsh",
        "Bucket SELF-join shape: per-bucket pair expansion, each "
        "unordered pair scored once then mirrored, per-source top-k "
        "window -- no broadcast of the (large) query side anywhere. "
        "Round 7: the build persists as a graph matview "
        "(knn_graph_cached); this query and all six graph analytics "
        "serve from the stored edge list after the one batch build.",
    ),
    (
        "curriculum_quality_phases",
        "Phase boundaries from ONE exact-percentile aggregate, "
        "broadcast onto a map-only bucketing pass -- no global ntile "
        "sort window.",
    ),
    (
        "dedup_substring_spans",
        "r9 single-explode plan: one span explode collapses to "
        "(span-hash, doc) rows with map-side combine, ndocs is a "
        "count window over the span key, one doc aggregate -- no "
        "corpus-sized join back, nothing corpus x corpus; 10x "
        "scale-ratio 4.07 -> 1.66.",
    ),
    (
        "text_winnow_fingerprint",
        "One Arrow mapInPandas pass (each gram hashed once; interpreted "
        "HOF lambdas would re-evaluate the gram array per window); zero "
        "exchanges below the scan spread.",
    ),
    (
        "vocab_top_coverage",
        "One map-combined word-count aggregate; the top-V cut is "
        "TakeOrderedAndProject; rank/cumsum windows run on V rows.",
    ),
    (
        "funnel_view_click_purchase",
        "Three conditional-min window phases stacked on one user-keyed "
        "exchange; final 3-row unpivot.",
    ),
    (
        "anns_recall_report",
        "r9: a union of the eight PERSISTED per-strategy leg matviews "
        "(each an anns_recall_* registered query, built once per "
        "corpus) -- the executed plan is eight O(Q)-row parquet scans, "
        "no serve subtree is ever replanned in the omnibus.",
    ),
    (
        "anns_ivf_topk",
        "IVF serve from the persisted matview: centroid table "
        "(~sqrt(N) rows) broadcast for cell ranking, probe list "
        "broadcast back into the cell equi-join against the stored "
        "assignments -- candidate scoring reads ~probe_fraction of "
        "the corpus, no training, no corpus count at query time.",
    ),
    (
        "chunk_markdown_reference",
        "Reference-parity markdown chunking is one Arrow mapInPandas "
        "fan-out over the pruned (doc_id, text) scan -- map-only, the "
        "per-document splitter is a pure function, no driver loop.",
    ),
    (
        "chunk_token_budget_bpe",
        "Real-BPE token-window chunking: merge-table encode + window "
        "slicing inside one Arrow map stage; no shuffle below the "
        "scan spread.",
    ),
    (
        "anns_ivf_filtered_topk",
        "Filtered-first IVF: the payload filter lands on the pruned "
        "embeddings scan and semi-joins the assignments BEFORE cell "
        "scoring, so candidate volume shrinks with the filter's "
        "selectivity; probe list stays broadcast.",
    ),
    (
        "multimodal_phash_dedup",
        "Perceptual-hash near-dup images: quantize/threshold/bit-pack "
        "are let-bound codegen HOFs over the pruned embeddings scan; "
        "candidates come from the 16-bit band equi-join (never "
        "all-pairs) and the Hamming verify is popcount over the "
        "joined band arrays.",
    ),
    (
        "rag_rerank_crossencoder",
        "Cross-encoder serve plan: BM25 prefetch from the stored "
        "tf/vocab matviews caps pairs at Q*prefetch; query texts "
        "broadcast onto the pair assembly; the Arrow-batched scorer "
        "touches only those rows; final top-k is a window over "
        "Q*prefetch.",
    ),
    (
        "tfidf_top_terms",
        "Keyword extraction over the persisted tf matview: broadcast "
        "vocab/stats joins, per-document top-k window -- k rows per "
        "doc, never a corpus-wide sort.",
    ),
    (
        "text_nfc_normalize",
        "Unicode NFC: one Arrow-batched scalar pandas UDF over the "
        "pruned (doc_id, text) scan -- map-only, zero shuffle.",
    ),
    (
        "coreset_kcenter_select",
        "TWO-LEVEL composable Gonzalez (round-9 rewrite of the k "
        "driver-synchronized rounds): pass 1 = one grouped Arrow "
        "kernel emitting <= KC_PARTS*k local candidates (grp-keyed "
        "shuffle of (vec_id,q) only), final Gonzalez over the bounded "
        "candidate block on the driver, pass 2 = map-only broadcast-"
        "centers assignment. Exactly TWO corpus passes for ANY k.",
    ),
    (
        "coreset_kcenter_append",
        "Incremental coreset face: two-level selection over the "
        "even-id base half (2 bounded passes for any k); the append "
        "path is ONE map-only Arrow assignment over the odd-id batch "
        "+ a broadcast scalar radius -- new data never joins old "
        "data.",
    ),
    (
        "merge_into_customers",
        "Three-clause MERGE as lakehouse engines execute it: ONE full "
        "outer key-equi-join of target and source (AQE broadcasts the "
        "small source), every clause a codegen CASE -- exactly one "
        "pass over the target.",
    ),
    (
        "cdc_apply_orders",
        "CDC compaction: ONE partial-aggregated groupBy with "
        "max_by(payload, seq) folding the winning change map-side -- "
        "no per-key window, no sort; tombstones drop in a codegen "
        "filter.",
    ),
    (
        "theilsen_daily_trend",
        "Theil-Sen robust trend: ONE partial-aggregated shuffle to "
        "(type, day) grain; the pairwise self-join + median rank run "
        "over calendar-squared-per-type rows (bounded by history "
        "length, never data volume).",
    ),
    (
        "benford_value_audit",
        "Benford screen: map-only integer-cents digit projection, one "
        "9-bucket partial-aggregated shuffle, scalar total broadcast "
        "back.",
    ),
    (
        "skyline_quality_docs",
        "Two-phase distributed skyline: O(n log n) kernel per "
        "partition (map-only Arrow pass over the pruned metric "
        "projection), then the same kernel once over the surviving "
        "candidates (skyline-cardinality group, not corpus) -- no "
        "global sort, only survivors shuffle.",
    ),
    (
        "psi_value_drift",
        "PSI drift: day-grain cutoff shuffle (bounded calendar "
        "window) broadcast back; ONE bucket-grain partial-aggregated "
        "shuffle builds both half counts via conditional sums; "
        "per-bucket integer math with two scalar totals broadcast.",
    ),
    (
        "l_diversity_report",
        "l-diversity gate: one partially-aggregated (nation, segment) "
        "shuffle with count + distinct-band; suppression is a "
        "map-side projection over QI-group rows.",
    ),
    (
        "cluster_label_agreement",
        "Purity/ARI scorecard: k-means assignment localCheckpointed "
        "once, one (cluster, label) contingency shuffle, then all "
        "pair-count combinatorics over K x L rows with DECIMAL(38,0) "
        "products; two broadcast one-row joins assemble the report.",
    ),
    (
        "temporal_leakage_split",
        "Leakage-audited temporal split: one day-grain partial-"
        "aggregated shuffle for the cutoff (bounded calendar window), "
        "one-row cutoff broadcast back, one user-grain partial-"
        "aggregated shuffle for the side counts -- no fact-scale "
        "window, single scan per grain.",
    ),
    (
        "token_budget_waterfill",
        "Water-filling allocation: one source-grain partial-aggregated "
        "shuffle; every window runs over source-cardinality rows (the "
        "bounded domain vocabulary); level + remainder are exact "
        "integer closed form, no iteration.",
    ),
    (
        "embed_kmeans",
        "Broadcast-centroids Lloyd: per-iteration map-side assignment "
        "against K literal centroids + one (cluster, dim) partial-"
        "aggregated sum (K x dim rows to the driver, bounded); the "
        "corpus is never shuffled and the final pass is assignment "
        "plus one cluster-keyed window count.",
    ),
    (
        "epoch_shuffle_shards",
        "Per-epoch deterministic shuffle: map-side md5 key + hex-"
        "nibble shard, row_number over an (epoch, shard)-PARTITIONED "
        "window -- no global sort or single-partition window; shards "
        "fan the ordering work across the cluster.",
    ),
    (
        "embed_random_projection",
        "JL sign projection: map-only project + posexplode over a "
        "3-column pruned scan -- zero shuffles, whole-stage codegen; "
        "the sign matrix is a hash expression, never materialized.",
    ),
    (
        "anns_hard_negatives",
        "Serving LSH path (persisted index, broadcast queries, bucket "
        "equi-join, first-colliding-table local dedup) plus one map-"
        "side cross-label predicate before the per-anchor top-k "
        "window -- never retrieve-then-drop.",
    ),
    (
        "dedup_bloom_prefilter",
        "Archive hashed once into a broadcast distinct-position set; "
        "the new batch is probed map-side against the broadcast and "
        "only bloom-hit rows pay the exact verification semi-join -- "
        "the archive is never rescanned per batch.",
    ),
    (
        "sketch_countmin_heavyhitters",
        "One token-count aggregate with map-side combine feeds both "
        "the fixed D x W cell grid (broadcast, <= 1024 rows) and a "
        "TakeOrderedAndProject top cut; rank window on CMS_TOP "
        "constant rows only.",
    ),
    (
        "knn_pagerank",
        "Power iteration over the banded kNN edge list: per round one "
        "edge-keyed equi-join + partial-aggregated inflow sum, eager "
        "localCheckpoint truncating lineage; never all-pairs, driver "
        "sees only the loop counter.",
    ),
    (
        "cluster_cartography",
        "K-means assignment equi-joined to documents on the store's "
        "primary key, distinct-term explode with partial aggregation "
        "on (cluster, term), top-k window over vocabulary-sized data, "
        "broadcast K-row sizes join.",
    ),
    (
        "quality_classifier_hashed",
        "Hashed-linear scorer: feature explode collapses map-side "
        "(every doc's features share its input row, so the partial "
        "aggregate emits one row per doc before the shuffle); md5 "
        "bucket + LCG weight are pure codegen, no Python, no weight "
        "table materialized.",
    ),
    (
        "token_budget_sample",
        "Per-source running-sum window over a (doc_id, source, "
        "n_tokens) projection -- text pruned before the exchange, "
        "streaming frame, no global sort; the one shuffle is the "
        "per-source partition.",
    ),
    (
        "zorder_layout",
        "Morton key is constant-folded integer bit arithmetic inside "
        "whole-stage codegen; one partial-aggregated groupBy on the "
        "4096-ary bucket key -- the write path this validates is "
        "repartitionByRange(zkey) straight to parquet.",
    ),
    (
        "scd2_user_segments",
        "Two per-user window passes (lag to find change points, lead "
        "to close intervals) over a 4-column pruned scan; both "
        "windows share the (user_id x ts) sort order so the second "
        "pass reuses the first's partitioning.",
    ),
    (
        "text_sentence_split",
        "Single vectorized regex pass (mark + split + filter) with a "
        "posexplode -- map-only, no shuffle, scan pruned to (doc_id, "
        "text).",
    ),
    (
        "scd2_point_in_time_join",
        "Union-and-fill as-of join: dimension change rows and facts "
        "interleave in ONE per-user window pass (last_value IGNORE "
        "NULLS) -- no range join, no per-fact probe; the only "
        "shuffle is the user_id partition the SCD2 build already "
        "uses, then a broadcast join back to the segment lookup.",
    ),
    (
        "sketch_hll_distinct_users",
        "Deterministic HLL: md5 register/rho are codegen expressions; "
        "one partial-aggregated groupBy collapses to 64 register rows "
        "per key before the shuffle, the 64-ary re-agg and the exact "
        "countDistinct ride the same key partitioning; registers are "
        "cell-wise mergeable across partitions (the 100 TB shape).",
    ),
    (
        "nextevent_training_pairs",
        "One per-user window pass (lag chain + row_number share the "
        "(user_id, ts, event_id) sort); scan pruned to 4 columns, "
        "map-only after the single window shuffle.",
    ),
    (
        "hybrid_rrf_fusion",
        "Same two-leg prefetch as hybrid_fusion_topk (LSH bucket "
        "equi-join dense leg, inverted-index sparse leg); fusion is "
        "exact BIGINT reciprocal units over O(Q x prefetch) rows -- "
        "no float enters the ranking.",
    ),
    (
        "anns_matryoshka_topk",
        "Stage 1 ranks the 16-dim PREFIX (broadcast query set over a "
        "rebalanced corpus scan -- at scale the prefix is its own "
        "stored column); stage 2's exact full-dim rerank touches only "
        "O(Q x k x factor) shortlist rows.",
    ),
    (
        "contrastive_triplets",
        "ONE LSH bucket join feeds both legs: the candidate stream "
        "splits by a map-side label comparison, each side takes "
        "rank-1 in a window over candidate rows only, final join is "
        "O(Q) x O(Q).",
    ),
    (
        "retrieval_metrics_report",
        "Both legs are registered retrieval plans; the relevance "
        "membership join and per-query MRR/NDCG aggregation run on "
        "O(Q x k) rows with precomputed integer discount literals -- "
        "no log, no float.",
    ),
    (
        "anns_late_interaction_topk",
        "Exact MaxSim pass: broadcast query set over a rebalanced "
        "corpus scan; the 4x4 sub-vector cosine grid is one codegen "
        "expression per pair -- production composes it behind a "
        "single-vector prefilter.",
    ),
    (
        "corpus_snapshot_diff",
        "One full-outer equi-join on doc_id between two hashed "
        "column-pruned scans; the diff output is the small side -- "
        "unchanged rows never leave the join.",
    ),
    (
        "span_corruption_pairs",
        "One array expression per document (closed-form sentinel "
        "indices -- no stateful scan), map-only over a (doc_id, text) "
        "pruned scan; zero shuffles.",
    ),
    (
        "knn_triangle_count",
        "Canonical a<b orientation, wedge equi-join + closing "
        "equi-join (each triangle enumerated once), then one "
        "partial-aggregated explode; edges come from the banded LSH "
        "kNN build, never all-pairs.",
    ),
    (
        "embedding_standardize",
        "Two partial-aggregated passes on the 64-ary dim key (two-"
        "pass variance chosen over float Welford for cross-partition "
        "determinism) + broadcast joins back; all integer arithmetic "
        "except one correctly-rounded sqrt.",
    ),
    (
        "retention_cohorts",
        "The (user, week) pair set is deduplicated map-side before "
        "anything else; cohort lookup reuses the user_id shuffle; "
        "cohort sizes are a tiny per-week aggregate joined "
        "broadcast; one exact integer division per cell.",
    ),
    (
        "text_readability",
        "Map-only: one vectorized regex pass for sentences, one "
        "split for words, one lambda-local regex per word for "
        "syllables; zero shuffles -- the per-doc row is produced "
        "where the doc is read.",
    ),
    (
        "dsir_importance_weights",
        "Token explode with map-side combined doc_id re-aggregation; "
        "both bag models collapse to a fixed 1024-bucket table "
        "joined back broadcast with the scalar totals; all log "
        "weights carried as exact BIGINT 1e-6 units.",
    ),
    (
        "knn_label_propagation",
        "Banded LSH kNN edge build localCheckpointed once; each "
        "round one equi-join on the contributor key + partial-"
        "aggregated (node,label) counts + a top-1 window over "
        "<= K_GRAPH rows; per-round checkpoint truncates lineage.",
    ),
    (
        "pmi_collocations",
        "Bigram build is one let-bound array expression per doc "
        "(map-only); bigram/unigram counts partially aggregate "
        "map-side; the support floor prunes before the two unigram "
        "joins; totals ride broadcast; PMI in BIGINT 1e-6 units.",
    ),
    (
        "stratified_holdout_split",
        "Per-source counts are tiny; the Hamilton seat window runs "
        "over source-cardinality rows (bounded, documented); the "
        "corpus-scale pass is one per-source rank window over a "
        "pruned (doc_id, source) projection.",
    ),
    (
        "weighted_sample_es",
        "Map-only integer key, then a sort-LIMIT global top-k "
        "(distributed TakeOrderedAndProject, per-partition heaps -- "
        "never a single-partition full window); the rank label is a "
        "window over the k surviving rows only.",
    ),
    (
        "compaction_plan",
        "One partially-aggregated groupBy over a column-pruned scan "
        "(strlen of the payload only -- text never shuffles); totals "
        "broadcast; output is partition-key cardinality rows; all "
        "sizing is integer ceiling division.",
    ),
    (
        "zipf_fit_report",
        "Term counts partially aggregate map-side; the top-V cut is "
        "a distributed sort-LIMIT; the regression is one aggregate "
        "over V rows with exact BIGINT sums, doubles only in the "
        "final three expressions.",
    ),
    (
        "k_anonymity_report",
        "One partially-aggregated groupBy (count + distinct-user "
        "count on the same key); suppression is a map-side "
        "projection over cell-cardinality rows.",
    ),
    (
        "markov_transition_stationary",
        "One per-user lag window over a pruned projection builds the "
        "transitions; everything after collapses to the |states|^2 "
        "cell table (event-type cardinality), broadcast through the "
        "integer power iterations; the corpus is never rescanned.",
    ),
    (
        "dedup_edit_distance",
        "Candidates from the banded minhash build (never all-pairs); "
        "two equi-joins fetch prefix-truncated text; one codegen "
        "levenshtein per candidate pair -- no Python in the loop.",
    ),
    (
        "ab_test_conversion",
        "One map-side-combined distinct aggregation per user, then a "
        "conditional aggregate to one row; the z arithmetic runs on "
        "that single row.",
    ),
    (
        "pca_top_component",
        "One corpus pass builds the dim^2 Gram sketch (outer-product "
        "explode, partially aggregated map-side); the power "
        "iterations run on 4096 rows broadcast-joined to the 64-row "
        "vector; the corpus is never rescanned.",
    ),
    (
        "lang_confusion_report",
        "The per-doc prediction is the registered map-only lang-id "
        "pass; the confusion aggregation is a langs^2-bounded "
        "groupBy with two broadcast marginal joins.",
    ),
    (
        "session_trigram_mining",
        "One per-user lag window over a pruned projection; the "
        "trigram count partially aggregates to a types^3-bounded "
        "table; top-k is a distributed sort-LIMIT with the rank "
        "window over the k survivors only.",
    ),
    (
        "hll_set_operations",
        "One hash pass over the two cohorts; register maxima "
        "partially aggregate to <= 2x64 rows; union is a 64-row "
        "re-aggregation (register-wise max = the mergeable sketch "
        "property); the report assembles from two single-row frames.",
    ),
    (
        "bpe_learn_merges",
        "One corpus pass collapses to the (word, count) vocabulary; "
        "each round is vocabulary-sized (pair explode -> partial-agg "
        "count -> sort-LIMIT argmax broadcast into the map-only "
        "merge fold) with a per-round localCheckpoint; the corpus "
        "is never rescanned.",
    ),
    (
        "seasonal_decompose_daily",
        "One partial-aggregated groupBy to day grain (365-rows-per-"
        "year output regardless of volume), then two windows over "
        "that tiny frame; all accumulation in exact 7x integer "
        "units.",
    ),
    (
        "embedding_isotropy_report",
        "Same one-pass dim^2 Gram sketch as pca_top_component; the "
        "Rayleigh/trace report aggregates 4096 sketch rows with "
        "exact BIGINT quadratic forms -- the corpus is never "
        "rescanned.",
    ),
    (
        "table_profile_documents",
        "ONE scan + one 1-row aggregation computes every per-column "
        "metric (count-distincts ride the expand), then a stack "
        "unpivot -- profile cost is independent of column count's "
        "output shape.",
    ),
    (
        "interarrival_histogram",
        "One per-user lag window over a (user_id, ts, event_id) "
        "projection, then a partial-aggregated groupBy onto <= 24 "
        "power-of-two bucket rows; the share denominator joins back "
        "as a broadcast scalar.",
    ),
    (
        "text_char_entropy",
        "Bigram explode partially aggregates to distinct-bigrams-"
        "per-doc before the shuffle (the combiner collapses repeats); "
        "the entropy sum is an exact BIGINT aggregate per doc_id -- "
        "no float accumulation order anywhere.",
    ),
    (
        "ohlc_daily_by_type",
        "Single partial-aggregated groupBy: struct-min/max pick "
        "open/close without a row_number pass, so the one shuffle "
        "carries <= |types| x |days| combiner rows.",
    ),
    (
        "twap_by_user",
        "Per-user lead window and the per-user groupBy share the "
        "user_id hash partitioning -- one shuffle total over a "
        "4-column projection; the weighted sum is an exact BIGINT "
        "aggregate.",
    ),
    (
        "event_debounce",
        "Lag + running-sum windows share one (user, type) "
        "partitioning with the burst groupBy; the kept event rides a "
        "struct-min, no second pass over the corpus.",
    ),
    (
        "kwic_concordance",
        "Map-only concordance: split + posexplode + a pushed term "
        "equality on the exploded word; output is proportional to "
        "hits, not corpus size, and there is no shuffle at all.",
    ),
    (
        "text_code_detect",
        "Map-only codegen classifier over a 2-column projection; all "
        "three votes are integer comparisons inside one projection, "
        "zero shuffles and zero UDFs.",
    ),
]

# ---------------------------------------------------------------------
# Round 7: AUDIT now covers the ENTIRE registry (close_round.py errors
# otherwise). The remaining queries are the cheap relational shapes;
# their claims are family-level -- the per-query exchange/broadcast/
# pushdown stats printed under each claim carry the specifics.
_AGG_ONESHUF = (
    "Map-side partial aggregation before the grouping shuffle; the scan "
    "prunes to the grouped/measured columns, and any later exchange "
    "reorders only the aggregate-sized result."
)
_GROUPING_SETS = (
    "One scan feeds every grouping set: the expansion happens inside "
    "the aggregate (Expand before partial agg), not as a union of "
    "scans; shuffle rows are bounded by the union of set cardinalities."
)
_TPCH_STAR = (
    "TPC-H replica: every dimension side joins as a broadcast (the "
    "fact side never shuffles for the join); the fact scan keeps its "
    "pushed filters and pruned ReadSchema; aggregation is partial "
    "before its shuffle."
)
_WINDOW_ONEPASS = (
    "One shuffle co-locates each partition key's rows, then the window "
    "runs in a single sorted pass; the scan prunes to the window's "
    "input columns and key cardinality bounds no frame (per-key frames "
    "only)."
)
_MAP_ONLY = (
    "Map-only whole-stage-codegen (or Arrow-batched) projection over "
    "one pruned scan -- scales embarrassingly with input splits; any "
    "exchange present is the deterministic output ordering of the "
    "emitted rows, never a corpus-size shuffle for compute."
)
_BROADCAST_JOIN = (
    "The small side broadcasts, so the probe side never shuffles; the "
    "join semantics (inner/semi/anti/interval) evaluate inside the "
    "broadcast join operator."
)
_SERVE_MATVIEW = (
    "Serves from the persisted signature/index matview: the query side "
    "broadcasts, candidates come from a bucket equi-join, and the "
    "per-query top-k windows run over candidate-sized frames only."
)

AUDIT += (
    [(n, _AGG_ONESHUF) for n in [
        "a1_events_per_hour", "a2_value_stats_by_type",
        "a3_efficiency_by_type", "a4_error_rate_by_day", "a6_summary",
        "a8_doc_distribution", "a9_backlog", "a10_user_timing",
        "a11_json_props", "chat_session_history",
        "corpus_quality_by_source", "embedding_health_report",
        "gatekeeper_failure_history", "label_centroids",
        "lsh_bucket_histogram", "pivot_events_daily",
        "props_key_histogram", "sessionize_events",
        "sessionize_session_window", "stream_windowed_counts",
        "top_terms_by_source", "unpivot_daily_counts",
        "set_error_not_purchase_user_days", "stale_agents",
        "daily_anomaly_zscore", "sketch_cardinality_quantiles",
        "seq_len_histogram", "bpe_pair_counts",
        "chat_session_history_ttl",
    ]]
    + [(n, _GROUPING_SETS) for n in [
        "cube_events", "rollup_events", "grouping_sets_events",
    ]]
    + [(n, _TPCH_STAR) for n in [
        "q5_regional_revenue", "q7_volume_shipping", "q8_market_share",
        "q10_returned_item_revenue", "q11_important_stock",
        "q12_returnflag_priority", "q14_promo_revenue",
        "q15_top_supplier", "q16_part_supplier_counts",
        "q18_large_volume_customers", "q20_excess_volume_suppliers",
    ]]
    + [
        (
            "q1_pricing_summary",
            "Single pruned lineitem scan with the shipdate predicate "
            "pushed to the reader; one partial-aggregated shuffle on "
            "the 4-row (returnflag, linestatus) key.",
        ),
        (
            "a5_top20_events",
            "Zero shuffle exchanges: the global top-k resolves as "
            "TakeOrderedAndProject over the single pruned scan -- k "
            "rows per partition travel to the driver, never a sort of "
            "the corpus.",
        ),
        (
            "a7_weekly_lag",
            "Partial agg collapses events to week grain before the "
            "shuffle; the lag window then runs over week-cardinality "
            "rows only.",
        ),
        (
            "rolling_distinct_users_7d",
            "Dedup and rolling frame shuffle on the same day-grain key "
            "family; every window frame holds day-grain rows, never "
            "raw events.",
        ),
        (
            "dedup_exact",
            "One content-hash shuffle groups exact duplicates; the "
            "winner fetch is an equi-join on the same hash key, "
            "co-partitioned so no second corpus shuffle appears.",
        ),
        (
            "dedup_simhash",
            "Signature computation is map-only codegen bit arithmetic "
            "over one pruned scan (zero exchanges in this face); the "
            "banded bucket-join dedup face is audited under "
            "dedup_minhash_lsh.",
        ),
        (
            "dedup_jaccard_verify",
            "Exact Jaccard only on LSH candidate pairs: shingle-set "
            "fetches are equi-joins keyed by doc id, so the verify "
            "stage sees candidate-count rows, never N^2.",
        ),
        (
            "domain_cap_sample",
            "Per-source cap via one partition-keyed window over a "
            "2-column projection; frames are per-source, the cap "
            "truncates inside the window pass.",
        ),
        (
            "pack_greedy_firstfit",
            "Greedy first-fit packs within partitions after one "
            "size-keyed exchange; bin state is per-partition, no "
            "global coordination.",
        ),
        ("embed_documents", _MAP_ONLY),
    ]
    + [(n, _WINDOW_ONEPASS) for n in [
        "window_first_event_per_user", "window_forward_fill",
        "window_last_n_per_user", "window_running_total",
        "window_value_quartiles",
    ]]
    + [(n, _MAP_ONLY) for n in [
        "chunk_markdown_docs", "chunk_sliding_window",
        "chunk_word_budget", "content_addressed_ids", "pii_redaction",
        "multimodal_audio_frames", "multimodal_image_stats",
        "multimodal_video_keyframes", "text_fingerprint",
        "text_lang_id", "text_quality_flags", "text_slugify",
        "text_token_stats",
    ]]
    + [(n, _BROADCAST_JOIN) for n in [
        "interval_join_click_purchase", "join_customers_with_purchases",
        "join_orders_without_lineitems", "set_click_and_purchase_users",
    ]]
    + [(n, _SERVE_MATVIEW) for n in [
        "anns_filtered_topk", "anns_label_maxsim_topk",
        "anns_lsh_multiprobe",
    ]]
    + [(n, "Per-strategy recall leg (r9): ONE registered serve plan "
            "left-joined against the persisted gold matview, per-query "
            "aggregate on Q*k rows; materialized once per corpus as "
            "the leg matview the omnibus report unions.") for n in [
        "anns_recall_lsh", "anns_recall_lsh_multiprobe",
        "anns_recall_ivf", "anns_recall_ivfpq", "anns_recall_bq",
        "anns_recall_matryoshka", "anns_recall_hardneg",
        "anns_recall_late_interaction",
    ]]
    + [
        (
            "skew_report_events",
            "One partial-aggregated groupBy over the derived power-law "
            "key (raw rows never shuffle -- counts combine map-side), "
            "one scalar broadcast back, TakeOrdered top-20.",
        ),
        (
            "skewed_distinct_salted",
            "Two-phase salted exact-distinct: phase-1 exchange "
            "partitions on the SALTED composite (hot key's user set "
            "split across SKEW_SALTS shards -- no reducer ever "
            "receives the bare hot key's full distinct set); phase-2 "
            "re-aggregates shard counts, shuffling key-cardinality "
            "rows. Measured-skew win asserted in test_plans.py.",
        ),
    ]
    + [
        (
            "bpe_encode_corpus",
            "Tokenizer application is VOCABULARY-sized: the merge "
            "folds run once per distinct word (localCheckpoint per "
            "round); the corpus pass is one explode + broadcastable "
            "word->tokens equi-join + per-doc partial-agg sum.",
        ),
        (
            "seqlen_bucketing",
            "Map-only token count, partial-aggregated groupBy on "
            "<= 21 power-of-two bucket keys, corpus max broadcast "
            "back as one scalar row.",
        ),
        (
            "funnel_attribution",
            "As-of pick is the union + per-user window form (ONE "
            "shuffle, no unbounded range join); channel rollup is a "
            "partial-agg groupBy emitting channel-cardinality rows.",
        ),
        (
            "ewma_control_chart",
            "One partial-aggregated shuffle collapses events to day "
            "grain; the integer-weight lag chain runs over "
            "|types| x |days| rows only.",
        ),
        (
            "seq_pattern_match",
            "ONE window shuffle on user_id, then map-only lead "
            "comparisons; output proportional to pattern matches.",
        ),
    ]
    + [(
        "anns_late_interaction_served",
        "LSH shortlist (persisted signature index, bucket equi-join, "
        "top k*factor) feeds the MaxSim re-rank: the 16 sub-vector "
        "cosines evaluate on O(Q*k*factor) shortlist rows only, with "
        "the shortlist and query slices broadcast -- corpus-wide "
        "MaxSim never appears in this plan.",
    )]
    + [
        (
            "rfm_segments",
            "One partial-aggregated groupBy collapses events to user "
            "grain BEFORE any window; the three ntile passes then run "
            "over user-cardinality rows (the anchor scalar broadcasts "
            "back). At real scale the user-grain global sort is the "
            "documented trade; percent_rank over a range-partitioned "
            "sort is the drop-in swap.",
        ),
        (
            "time_to_event_labels",
            "ONE shuffle on user_id, one ordered forward-min window "
            "pass per user -- the next-purchase label resolves inside "
            "the frame, never via a self join.",
        ),
        (
            "data_quality_expectations",
            "Rules over the same table share ONE column-pruned scan "
            "with map-side conditional counts; the two referential "
            "rules are anti-join counts (dimension side broadcast "
            "under AQE); uniqueness is a partial-agg groupBy on the "
            "key. No table is scanned twice for a second rule.",
        ),
        (
            "acf_daily_counts",
            "One corpus shuffle to day grain; the centered-deviation "
            "self-join and both integer sums run over calendar x "
            "ACF_MAX_LAG rows (lags broadcast), bounded by "
            "days-of-history, not data volume.",
        ),
        (
            "cusum_control_chart",
            "One corpus shuffle to day grain; the recursive CUSUM is "
            "the closed-form running_sum - min(0, running_min) pair "
            "of integer window passes over the calendar -- no "
            "per-event state, no iterative plan.",
        ),
        (
            "latency_percentiles_exact",
            "ONE shuffle partitions by event_type; the rank window "
            "orders within each type and the three ceil(p*n/100) "
            "targets resolve row-local via an array filter -- no "
            "explode-based row multiplication, no second pass.",
        ),
        (
            "revenue_pareto_report",
            "Orders collapse to customer grain in ONE partial-"
            "aggregated shuffle; rank + running-sum windows run over "
            "customer-cardinality rows with the five rank targets "
            "resolved row-local via an array filter; the total "
            "broadcasts back as a scalar.",
        ),
        (
            "ship_lag_by_supplier",
            "Fact-fact lineitem x orders equi-join hash-partitioned "
            "on the order key (AQE skew split applies); the rollup is "
            "a partial-aggregated groupBy on supplier-cardinality "
            "keys -- integer day lags end-to-end.",
        ),
        (
            "session_duration_percentiles",
            "The sessionize window is the corpus-sized pass; the rank "
            "window then runs over SESSION-cardinality rows (grain "
            "reduction first) with the three rank targets resolved "
            "row-local via an array filter.",
        ),
        (
            "doc_novelty_score",
            "ONE explode + (shingle -> min doc) partial-aggregated "
            "groupBy over the corpus shingles; the ownership join "
            "keys on the shingle (co-partitioned with the groupBy); "
            "the per-doc rollup partial-aggregates on doc_id.",
        ),
        (
            "hopping_window_counts",
            "The 4x window expansion is map-side (the TVF replicates "
            "rows before the exchange); ONE partial-aggregated "
            "shuffle on (window, type) -- window cardinality is "
            "calendar x 4, not data-sized.",
        ),
        (
            "conversion_lag_histogram",
            "ONE shuffle on user_id for the forward-min window; the "
            "power-of-two bucket projection is map-only codegen and "
            "the histogram is a partial-aggregated groupBy over <= "
            "33 keys.",
        ),
        (
            "winsorized_value_stats",
            "ONE shuffle partitions by event_type; the rank window "
            "and the clamp+sum run inside the same partitioning with "
            "the per-type bounds broadcast back -- the corpus "
            "shuffles once.",
        ),
        (
            "part_cooccurrence_topk",
            "Lineitem collapses to DISTINCT (order, part) first (one "
            "fact-table shuffle keyed on the order); the within-order "
            "self-join fans out only in basket size (<= 7 TPC-H "
            "lines); pair counts partial-aggregate, top-20 resolves "
            "as TakeOrderedAndProject, marginals broadcast onto 20 "
            "rows.",
        ),
        (
            "erasure_impact_report",
            "Cohort and deleted-order keysets are dimension-sized and "
            "broadcast; each table contributes ONE column-pruned scan "
            "with a map-side conditional count -- lineitem's "
            "membership probe is a broadcast join, the fact table "
            "never shuffles. The executing twin's deletes are "
            "broadcast anti-joins, proven on disk.",
        ),
        (
            "anns_range_search",
            "Identical plan to the benched brute top-k leg (broadcast "
            "queries x rebalanced candidates, vectorized cosine "
            "kernel) with the per-query window replaced by a codegen "
            "threshold filter -- strictly cheaper; the LSH-shortlist "
            "variant drops in exactly as for top-k.",
        ),
        (
            "dup_cluster_size_histogram",
            "Component build is the pointer-jumped connected-"
            "components loop (O(log diameter) rounds over LSH "
            "candidate edges); both rollups are partial-aggregated "
            "groupBys over cluster- then size-cardinality keys.",
        ),
        (
            "gini_user_activity",
            "Corpus collapses to user grain in one partial-aggregated "
            "shuffle; the rank pass runs over user-cardinality rows "
            "(same user-grain window trade as rfm_segments) and the "
            "closed-form numerator/denominator are single exact-"
            "integer aggregates.",
        ),
        (
            "hhi_source_concentration",
            "One partial-aggregated groupBy to source grain; "
            "everything after runs on source-cardinality rows as "
            "exact integer aggregates.",
        ),
        (
            "bounce_rate_daily",
            "The sessionize window is the only corpus-sized pass; the "
            "bounce rollup is a partial-aggregated groupBy over "
            "session-grain rows keyed by calendar-cardinality days.",
        ),
        (
            "ngram_nextword_topk",
            "Bigrams build IN-ROW (let-bound index transform, "
            "map-only -- no positional self-join); ONE (left, right) "
            "partial-aggregated shuffle; top lefts resolve as "
            "TakeOrdered and broadcast back; the per-left top-k "
            "window runs over candidate-sized frames.",
        ),
        (
            "anomaly_top_movers",
            "One partial-aggregated shuffle to (type, day) grain; the "
            "lag window runs per type over calendar-cardinality rows; "
            "the global top-20 resolves as TakeOrderedAndProject -- "
            "never a full sort.",
        ),
        (
            "knn_density_outliers",
            "Reads the banded LSH kNN build once; per-vector sums are "
            "a partial-aggregated groupBy over <= K_GRAPH rows per "
            "vector; the decile rank runs over vector-cardinality "
            "rows (quantized integer sums -- no float accumulation "
            "order sensitivity).",
        ),
        (
            "dup_rate_by_source",
            "Verdict build is the one band shuffle of "
            "lsh_firstseen_flags; the provenance join keys on doc_id "
            "against a pruned 2-column projection; the rollup is a "
            "partial-aggregated groupBy on source-cardinality keys.",
        ),
        (
            "arrival_lateness_report",
            "ONE shuffle on user_id, one ordered running-max window "
            "pass per user, then a single map-side conditional "
            "aggregation unpivoted to one row per watermark candidate "
            "-- the corpus is scanned once, never once-per-candidate.",
        ),
        (
            "dataset_card_report",
            "One column-pruned scan per source table feeding "
            "partial-aggregated scalars; the dup metric's md5 groupBy "
            "is the only shuffle over documents; the one-row frames "
            "union into the card -- no joins, no windows.",
        ),
        (
            "knn_bfs_landmarks",
            "Edge list is the banded LSH kNN build, localCheckpointed "
            "once (shared with the k-core peel); each BFS round is "
            "one frontier-vs-edges equi-join plus a partial-agg "
            "(node, landmark) min with per-round localCheckpoint -- "
            "work bounded by frontier size x K_GRAPH degree, merge is "
            "an associative integer min.",
        ),
        (
            "embedding_drift_report",
            "One map-only quantize+posexplode over the corpus, ONE "
            "partial-aggregated shuffle keyed on (snapshot, dim) -- "
            "2 x dims groups -- and a dim-keyed merge of the two "
            "snapshot rows; no corpus self-join, no window.",
        ),
        (
            "item_cooccurrence_lift",
            "Corpus collapses to DISTINCT (user, type) first (the "
            "only corpus-sized shuffle); the per-user self-join fans "
            "out over at most |types| rows per user (bounded "
            "vocabulary, never events^2); marginals and totals "
            "broadcast back onto pair-cardinality rows.",
        ),
        (
            "dedup_lsh_firstseen",
            "One shuffle over the band rows; per-bucket min resolves "
            "inside bucket-sized window frames, the per-doc OR is a "
            "partial-aggregated groupBy, and the shingle-less-doc "
            "join keys on doc_id. The streaming twin pays only "
            "batch-sized signature work plus a bucket-pruned index "
            "join per micro-batch.",
        ),
        (
            "zonemap_skipping_report",
            "Both block assignments are map-only expressions (no "
            "global sort: natural blocks key on the id, Morton blocks "
            "on the bucketized interleave); per-block envelopes are "
            "one partial-aggregated groupBy per layout over a shared "
            "pruned scan; predicate evaluation runs over block-count "
            "x 4 rows with the predicate table broadcast.",
        ),
        (
            "phrase_match_positional",
            "Only postings of the phrase's own terms shuffle (the "
            "term filter sits under the posexplode; the corpus "
            "subtree is map-only scan+explode); the k-leg join chain "
            "keys every leg on the same (doc_id, p0) composite so "
            "consecutive joins reuse the exchange, and each leg is "
            "unique on the key -- no fan-out.",
        ),
        (
            "knn_kcore",
            "Edge list is the banded LSH kNN build (never all-pairs), "
            "canonicalized + mirrored map-side, localCheckpointed "
            "once; each peel round is one partial-aggregated degree "
            "count plus two survivor equi-joins, with per-round "
            "localCheckpoint truncating lineage -- join fan-out is "
            "bounded by K_GRAPH degrees.",
        ),
        (
            "mad_robust_anomaly",
            "One corpus shuffle to day grain; both exact-median rank "
            "passes and the fixed-point flag projection run over "
            "calendar-cardinality rows with the two medians broadcast "
            "back as scalars.",
        ),
        (
            "entity_resolution_golden",
            "r9 ER with survivorship: candidates come only from the "
            "shared banded-minhash buckets (never all-pairs); the "
            "integer Jaccard verify joins word sets by doc id "
            "(candidate-count rows); components are the pointer-jumped "
            "O(log d) loop; survivorship is ONE partial-aggregated "
            "groupBy on the entity label with max_by carrying the "
            "golden argmax inside the aggregate -- no per-entity "
            "window, no second corpus shuffle.",
        ),
        (
            "er_append",
            "r9 incremental ER face: the archive resolve happens ONCE "
            "into the persisted erreg_* registry matviews (the "
            "knn_graph_cached pattern; the resolve plan is audited "
            "under entity_resolution_golden); per call the plan is "
            "batch signatures + ONE bucket equi-join against the "
            "STORED (band, sig) index + candidate-only integer verify "
            "+ a groupBy min on the batch grain -- the archive is "
            "never re-resolved, its text never re-read.",
        ),
        (
            "er_reresolve",
            "r10 ER lifecycle completion, r11 persisted (VERDICT item "
            "3): the periodic full re-resolve folds appended batches "
            "into the registry and repairs er_append's deferred cases "
            "(new-entity founding, bridge merges) -- archive "
            "components enter as STAR EDGES from the stored labels "
            "(components of star(labels) == components of the "
            "original archive edges), so archive pairs are NEVER "
            "re-verified; batch work is batch signatures + the batch "
            "self-bucket join + ONE bucket join against the stored "
            "(band, sig) index + candidate-only integer verify; "
            "components are the pointer-jumped O(log d) loop over "
            "star + new edges; survivorship one max_by groupBy. r11: "
            "that whole compute is paid ONCE PER APPEND EPOCH into "
            "the erreg_golden_* matview (er_registry_cached pattern); "
            "the registered query SERVES the stored registry -- the "
            "plan is a bare parquet scan of O(entities) rows, "
            "test-asserted free of Exchange/joins/Python stages. "
            "Oracle unchanged: the FROM-SCRATCH resolve over "
            "archive+batch -- gate green IS the append+reresolve == "
            "resolve proof on the stored content.",
        ),
        (
            "bitext_margin_pairs",
            "r11 margin-criterion bitext mining (Artetxe & Schwenk "
            "ratio margin): the bounded en source pool broadcasts "
            "against ONE rebalanced scan of the non-en cohort "
            "(anns_bruteforce contract -- no shuffle of the corpus "
            "side for scoring); both top-k rank windows partition on "
            "a bounded key (src pool / per-target pool rows); the "
            "margin denominators are EXACT integer sums of milli-"
            "quantized cosines (norm_dbsf moment discipline) joined "
            "back with the pool-side aggregate broadcast; final "
            "best-match selection is one more pool-partitioned "
            "window. Production path at corpus x corpus scale: "
            "bitext_margin_mined (r12).",
        ),
        (
            "bitext_margin_mined",
            "r12 PRODUCTION face of the margin miner (r11-VERDICT "
            "item 2): candidates come from the PERSISTED signature "
            "index via the multi-probe bucket join (pool side signs + "
            "probes N_PROBES Hamming-1 flips per table -- bounded; "
            "index side never re-signs), then the IDENTICAL exact-"
            "integer margin arithmetic runs over candidates only -- "
            "the FAISS-shortlist-then-margin shape CCMatrix/NLLB "
            "mine with. Multiprobe chosen over single-probe because "
            "bitext scores weak-similarity pairs (best cos ~0.3-0.4): "
            "coverage of the exact-best target measured 60% single-"
            "probe vs 98% multiprobe; pair recall vs the exact face "
            "0.90/0.96 at sf0.001/0.01, floor-asserted at 0.75 in "
            "tests. Rank windows partition on candidate-bounded "
            "keys; no corpus x corpus stage anywhere.",
        ),
        (
            "m4_downsample_events",
            "r11 M4 pixel downsample (Jugel et al. VLDB'14): one "
            "scalar min/max epoch aggregate broadcast back as a "
            "one-row crossJoin, bucket index in pure integer "
            "arithmetic (map-side), then ONE partial-aggregated "
            "(type, bucket) groupBy whose struct-min/max aggregates "
            "decompose map-side -- the single shuffle carries "
            "<= |types| x 64 combiner rows regardless of corpus "
            "size; output is fixed by pixels, not data.",
        ),
        (
            "t_closeness_report",
            "r11 t-closeness (Li et al. ICDE'07), completing the "
            "k-anonymity / l-diversity privacy trio: global deciles "
            "come from the two-phase distributed_rank protocol + the "
            "byte-exact ntile fill rule (no unpartitioned window); "
            "EMD is b-1 unrolled conditional BIGINT sums in ONE "
            "partial-aggregated QI groupBy, with the global "
            "histogram a one-row broadcast; the violation flag "
            "compares exact integers so no group flips on a float "
            "boundary.",
        ),
        (
            "chunk_semantic_split",
            "r11 semantic chunking (embedding-breakpoint splitter): "
            "segmentation and the integer-vote unit embedding are "
            "map-only over the REBALANCED corpus scan (the vote "
            "encode is the CPU and the corpus parquet is one input "
            "split at test scale -- un-spread it ran on a single "
            "core, 10.5 s vs 1.5 s at sf0.1; md5 is hoisted to one "
            "pass per segment, norms computed once and lagged); the "
            "consecutive-cosine breakpoint is ONE per-doc lag window "
            "+ running sum (bounded by doc length, never global), "
            "with the threshold test in EXACT BIGINT arithmetic "
            "(dot^2 * den < num * na * nb) so no boundary flips on a "
            "float; final assembly is one partial-aggregated "
            "(doc, chunk) groupBy whose collect_list is bounded by "
            "segments-per-doc.",
        ),
        (
            "chunk_content_defined",
            "r11 content-defined chunking (the rsync/LBFS/FastCDC "
            "shift-invariant dedup primitive at word grain): the "
            "boundary predicate is a pure map-side string hash over "
            "the rebalanced word explode (md5 of the local trigram "
            "ends in a fixed nibble -- no modulo, no float); chunk "
            "assembly is one per-doc lag+running-sum window (bounded "
            "by doc length) and one partial-aggregated (doc, chunk) "
            "groupBy. Shift-invariance -- an early edit re-uses every "
            "later chunk byte-identically where fixed windows re-use "
            "none -- is test-asserted.",
        ),
        (
            "cdc_dedup_report",
            "r11 chunk-store dedup accounting over the CDC chunks: "
            "the chunker's plan (map-side trigram hash + per-doc "
            "window + one groupBy) feeds a doc_id equi-join to the "
            "2-column documents projection, then ONE partial-"
            "aggregated per-source groupBy with a distinct-count on "
            "the md5 content key -- |sources| output rows; at 100 TB "
            "the distinct-count swaps to the HLL sketch face.",
        ),
        (
            "cdc_incremental_embed",
            "r12 CDC payoff loop (r11-VERDICT item 3): the reference's "
            "idempotent re-ingestion (deterministic content ids + "
            "INSERT OR REPLACE) composed Spark-first -- two CDC chunk "
            "passes (each map-side trigram hash + per-doc window + one "
            "groupBy), one hash-partitioned LEFT join of the edited "
            "corpus's chunks against the DISTINCT stored content-hash "
            "set, the 64-dim integer vote embed kernel evaluated "
            "LAZILY under the novel branch only (cost tracks novel "
            "chunks, never the store), one per-source partial-"
            "aggregated groupBy. Blast radius test-asserted: a "
            "front-of-document edit re-embeds ~1 chunk where the "
            "fixed-width twin re-embeds the whole tail; every output "
            "column an exact BIGINT incl. the embed checksum the "
            "oracle recomputes.",
        ),
        (
            "tokenizer_fertility_by_lang",
            "r11 multilingual token budgeting: map-only per-doc "
            "exact-integer counters (whitespace words, pinned BPE "
            "pre-tokens, chars) over the rebalanced corpus scan, ONE "
            "partial-aggregated groupBy to |langs| rows, each ratio "
            "one division of exact BIGINT sums rounded once.",
        ),
        (
            "prf_query_expansion",
            "r9 RM3: the corpus-heavy tokenize/postings subtree is the "
            "shared persisted matview; feedback and expansion windows "
            "partition by query_id; both query vectors (original and "
            "expanded) are Q-bounded broadcasts into the postings "
            "join, so the corpus never shuffles for scoring.",
        ),
        (
            "group_kfold_split",
            "r9: fold is a row-local hash (map-only), one partial-"
            "aggregated groupBy to the 5-row fold grain, corpus total "
            "broadcast back as a one-row aggregate.",
        ),
        (
            "score_decile_lift",
            "r9 gains table: classifier scoring is one map pass + "
            "per-doc combine; the exact global rank is the two-phase "
            "distributed_rank protocol (no unpartitioned window); "
            "everything after aggregates at <=10-decile grain, with "
            "the cumulative sum a broadcast non-equi join over the "
            "table's own rows.",
        ),
        (
            "knn_label_disagreement",
            "r9 mislabel screen: edges come from the PERSISTED banded "
            "LSH kNN matview (no rebuild, never all-pairs); one "
            "neighbor-key equi-join + partial-aggregated (vec, label) "
            "vote count; the plurality window sees <= K_GRAPH rows per "
            "vector; final joins are primary-key equi-joins.",
        ),
        (
            "bootstrap_mean_ci",
            "r9 Poisson bootstrap: replicate weights are row-local md5 "
            "lookups; map-side partial aggregation collapses the B-way "
            "explode to (source x B) grain before the single shuffle; "
            "rank windows partition by source over B-row groups; the "
            "point estimate joins back at source grain.",
        ),
        (
            "anns_sq_topk",
            "r12 int8 scalar-quantized serve path (completes the "
            "compression family: BQ 1-bit / PQ subspace codebooks / "
            "MRL prefix / SQ byte-per-dim): quantization is map-only "
            "codegen (maxabs fold + per-element round -- codes stay "
            "EXACT integers in double arrays, so the shortlist key "
            "qdot*scale_q*scale_c is bit-identical cross-engine); "
            "the scan broadcasts the Q-row query side against the "
            "rebalanced candidates (no corpus shuffle), int-dot "
            "shortlist at k*4 oversample, exact-cosine rerank touches "
            "Q*k*4 vectors. Recall 1.0 at sf0.01 (unit-norm corpus; "
            "see anns_recall_sq) -- the fidelity the 8x-vs-BQ memory "
            "buys. At 100 TB the codes are a stored 64-byte column; "
            "the scan is bandwidth-bound at 1/8 raw-vector bytes.",
        ),
        (
            "anns_recall_sq",
            "r12 recall leg of the SQ serve path vs the shared brute "
            "gold matview -- same _recall_vs_exact shape as the other "
            "eight legs: one serve plan + one O(Q*k) left join + "
            "per-query count aggregation; persisted per corpus, the "
            "omnibus report unions the stored rows.",
        ),
        (
            "dedup_simhash_hamming",
            "r12 Manku-Jain-Das Sarma multi-index simhash pairing: ONE "
            "Arrow signature pass, a 4x block posexplode (map-side), "
            "candidate pairs from a (block, bits) equi-SELF-JOIN "
            "(pigeonhole: k=3 < 4 blocks gives DETERMINISTIC 100% "
            "recall -- the recall contrast to probabilistic minhash "
            "banding), DISTINCT, then an integer-only verify "
            "(base-2 conv + XOR + POPCNT per 16-bit block, pure "
            "codegen, no Python past the signature). Same-vocab short "
            "docs make some 16-bit buckets thousands deep (sf0.1 max "
            "2.2k): the self-join form streams those pairs and AQE "
            "skew-split handles the hot buckets, where the "
            "collect_list expansion would build multi-million-element "
            "single rows. At crawl scale this is the production "
            "simhash dedup layout: 4 permutation tables, one "
            "equi-join probe each.",
        ),
        (
            "shard_manifest_offsets",
            "r12 export manifest: shard is a row-local md5-nibble "
            "(map-only, byte-balanced under any id distribution), "
            "byte lengths are codegen octet_length, and the offset "
            "cumsum is a window PARTITIONED BY shard -- the per-shard "
            "prefix sum IS the file layout, inherently sequential, so "
            "the sort fans out across the shard count (raise the "
            "nibble width at 100 TB, same lever as "
            "epoch_shuffle_shards). No global sort, no "
            "single-partition window, no Python.",
        ),
        (
            "keyword_tag_docs",
            "r12 dictionary tagging (FlashText/Aho-Corasick batch "
            "shape): dictionary build is one distinct-(doc, term) "
            "partial-aggregated groupBy + TakeOrderedAndProject "
            "(distributed top-k, never a 1-partition vocab window); "
            "tagging explodes tokens map-side and BROADCAST-joins the "
            "tiny dictionary BEFORE the (doc, term) count, so the "
            "shuffle carries only dictionary-matching tokens. Past "
            "broadcast size the same plan shuffle-joins on term.",
        ),
        (
            "kneser_ney_bigram_topk",
            "r12 interpolated Kneser-Ney bigram LM (Chen-Goodman; the "
            "KenLM-style quality-scoring statistic): one map-side "
            "bigram explode into a partial-aggregated (w1, w2) count; "
            "the marginals (c1/N1fw, N1bw, T) aggregate the TYPE "
            "table (vocabulary-sized), assembled by two type-grain "
            "equi-joins + one broadcast scalar; P_KN = num/den over "
            "EXACT BIGINTs (D=3/4 cleared of floats), so even the "
            "ranking doubles are bit-identical cross-engine; top-k is "
            "TakeOrdered. No Python.",
        ),
        (
            "anns_prefilter_fidelity",
            "r12 prefilter-fidelity readout: per-query Spearman rho "
            "between each compressed prefilter's candidate ordering "
            "(SQ int-dot / BQ Hamming) and the exact-cosine ranking "
            "over the emitted O(Q*k) rows only -- two query-partitioned "
            "row_number windows over <= k rows, one partial-aggregated "
            "groupBy to Q rows per strategy; rho is exact-integer "
            "d^2 sums and ONE int->double division (measured: sq 0.99 "
            "vs bq 0.16 -- the number that explains BQ's 4x oversample).",
        ),
        (
            "canary_contamination_scan",
            "r12 eval-canary verbatim leak scan (memorization-canary "
            "integrity report): the K-row secret set broadcasts; the "
            "scan is ONE map-side pass of K substring probes per doc "
            "(no explode, no token shuffle); per-canary aggregation is "
            "a partial-aggregated groupBy to K rows, left-joined back "
            "so CLEAN canaries still report n_hits = 0. Corpus plants "
            "the secrets inline (every 17th doc) identically in both "
            "engines; the scan itself is corpus-agnostic.",
        ),
        (
            "knn_connected_components",
            "r12 Hash-to-Min connected components over the persisted "
            "banded-LSH kNN graph (the missing iterative-graph family "
            "member next to PageRank/label-prop/k-core/BFS/triangles): "
            "each of the 4 synchronous rounds is ONE partial-aggregated "
            "min-label groupBy (min is associative -- map-side combine "
            "collapses the edge fan-in before the shuffle) over the "
            "localCheckpointed undirected edge list; bounded-R "
            "contract identical to knn_bfs_landmarks, unrolled-CTE "
            "oracle. At 100 TB pick R ~ log(diameter) or iterate to "
            "fixpoint with a per-round convergence check.",
        ),
        (
            "anns_range_search_lsh",
            "r12 production face of range retrieval (the exact face's "
            "docstring promise made a registered, graded query): "
            "persisted-index bucket equi-join candidates (no corpus "
            "signature pass, broadcast query side), then the identical "
            "round-then-compare threshold filter -- strictly cheaper "
            "than any top-k serve path (no window at all). At 100 TB "
            "the exact face scans every vector per query; this face "
            "touches colliding buckets only.",
        ),
        (
            "anns_recall_range_lsh",
            "r12 recall leg of the LSH range face vs the exact "
            "threshold face persisted as its own gold matview (a "
            "different task has a different gold standard -- the "
            "hardneg/late_interaction pattern); n_exact is the true "
            "within-tau neighbor count, data-dependent by design.",
        ),
        (
            "dedup_containment_verify",
            "r12 asymmetric containment (Broder; the quote/inclusion "
            "half of crawl dedup that symmetric Jaccard misses): "
            "candidates from RARE-SHINGLE postings (df in [2, 10] -- "
            "minhash banding collides at Jaccard^rows and by "
            "construction misses low-Jaccard containment pairs, while "
            "a contained doc shares EVERY shingle with its container; "
            "the df cap is the hot-key guard and the honest recall "
            "trade), posting arrays bounded at df_max so the "
            "within-bucket expansion never skews; one shingle-set "
            "equi-join per side; the 0.8 threshold is the exact-"
            "integer compare 5*inter >= 4*|S| (no float on the cut); "
            "ratios round once at output.",
        ),
    ]
)


def _live_plan(plan: str) -> str:
    """Drop subtrees under InMemoryRelation: a cached relation's
    printed lineage is build-time history, not per-run work -- counting
    its exchanges/scans would misstate an iterative query (e.g. the CC
    loop) as re-deriving its inputs every round."""
    out = []
    skip_indent = None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*"))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
        out.append(line)
    return "\n".join(out)


def summarize(plan: str) -> dict:
    live = _live_plan(plan)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", live)),
        "broadcasts": len(re.findall(r"BroadcastExchange", live)),
        "partial_aggs": len(re.findall(r"\bpartial_", live)) > 0,
        "scans": len(re.findall(r"Scan parquet", live)),
        "cached_scans": len(re.findall(r"InMemoryTableScan", live)),
        "pushed": re.findall(r"PushedFilters: \[[^\]]*\]", live)[:3],
        "schemas": re.findall(r"ReadSchema: [^\n]*", live)[:3],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from selfhosted_rag_doc_chat_prototype_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # COMPLETENESS GUARD (round 7): every registered query must carry a
    # plan-audit entry, and every entry must name a registered query --
    # a new operator cannot ship without its PLANS.md section.
    audit_names = [n for n, _ in AUDIT]
    dup = {n for n in audit_names if audit_names.count(n) > 1}
    missing = set(queries) - set(audit_names)
    stale = set(audit_names) - set(queries)
    if dup or missing or stale:
        raise SystemExit(
            "plan_audit completeness violated: "
            f"duplicates={sorted(dup)} missing={sorted(missing)} "
            f"stale={sorted(stale)}"
        )

    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        "Generated by `python tools/plan_audit.py` (re-run after plan",
        "changes). Counts come from the AQE initial physical plan at "
        f"`{sf_dir}`; broadcasts counted within exchanges.",
        "",
        "## Bench re-time verdicts (r9, r8-VERDICT item 3)",
        "",
        "The three r7->r8 in-suite slowdowns were re-timed in "
        "isolation (`SPARK_GRAFT_BENCH_ONLY`, best-of-3, sf0.1, run "
        "in BOTH orders to control JVM-warmup position). Isolate "
        "minima reproduce the r8 in-suite times almost exactly and "
        "are order-invariant, so the deltas are REAL but CONSTANT-"
        "COST, not suite interference and not plan regressions:",
        "",
        "- `dedup_connected_components` r7 1.55 / r8 2.06 / isolate "
        "1.98-2.11 — real constant delta; plan shape unchanged "
        "(pointer-jumping rounds over the persisted kNN matview); "
        "attributed to the r8 matview-lifecycle additions sharing its "
        "graph build. Bounded, not scale-relevant.",
        "- `ingest_pipeline_e2e` r7 2.01 / r8 2.46 / isolate 2.41 — "
        "real constant delta from the r8 injectable OCR/transcribe "
        "seam (plugin dispatch threaded through the Arrow extract "
        "kernel); still 2 exchanges, map-only Arrow stages. The seam "
        "is the S3/S5 production feature, the ~0.4s is its price at "
        "toy scale.",
        "- `dedup_edit_distance` r7 2.08 / r8 2.36 / isolate 2.57 — "
        "real constant delta; plan unchanged (Levenshtein on LSH "
        "candidates only). Within the documented ~40% cross-condition "
        "spread of the shared LSH-candidate build.",
        "",
        "r9 structural fixes re-timed: `anns_recall_report` 4.52 -> "
        "0.30s isolate (per-strategy legs persisted as matviews; the "
        "omnibus unions eight O(Q)-row stored tables). "
        "`coreset_kcenter_select` 2.73 -> 1.20s and "
        "`coreset_kcenter_append` 3.16 -> 1.52s (two-level composable "
        "Gonzalez: 2 corpus passes for any k).",
        "",
        "r8 superlinear 10x ratios adjudicated (r8-VERDICT item 5): "
        "`dedup_substring_spans` 4.07 -> 1.66 (REAL -- the r8 plan "
        "shuffled the full span explode twice and recomputed it for "
        "the join back; the r9 single-explode + span-key window plan "
        "removes both). `decontaminate_fuzzy_minhash` 3.75 -> "
        "re-measured 2.56 interleaved best-of-2: the verified-pair "
        "volume grows EXACTLY 10x by construction (414 -> 4184; the "
        "mod-13 benchmark stand-in scales with the corpus), so wall "
        "at 2.56x is sublinear in work -- data-genuine growth, no "
        "plan defect.",
        "",
        "Independent re-check (later r9 session, clean JVM, "
        "`tools/scale_ratio_spot.py` with the suite's interleaved "
        "1x/10x discipline): `dedup_substring_spans` ratio 1.91, "
        "`decontaminate_fuzzy_minhash` 2.43 -- both under the <=3 "
        "bar, corroborating the adjudication above. Fresh best-of-5 "
        "isolates for the three constant-delta queries landed at "
        "1.43/2.97/2.16 s with in-run spreads up to 2.2x -- inside "
        "the documented cross-condition envelope, same verdict.",
        "",
        "## Bench re-time verdicts (r10, r9-VERDICT item 1)",
        "",
        "All six r9 drift flags adjudicated with fresh clean-JVM "
        "re-measures this round:",
        "",
        "- `dedup_embedding_cosine` 10x ratio: r8 1.98 -> r9 3.82 -> "
        "fresh `scale_ratio_spot` 2.07 (10x wall 2.23 s). The r9 "
        "reading was MEASUREMENT NOISE; ratio is back at the r8 "
        "level. Plan unchanged (SemDeDup LSH-blocked cosine), no "
        "defect.",
        "- `cdc_apply_orders` 10x ratio: r9 5.09 -> fresh 3.73 (10x "
        "wall 1.21 s). The feed grows exactly 10x by construction "
        "and the plan is already the minimal shape -- ONE partial-"
        "aggregated `max_by` groupBy (single shuffle, map-side "
        "combine) + a codegen tombstone filter; there is no second "
        "stage to remove. DATA-GENUINE sublinear growth; the 5.09 "
        "was the same small-denominator noise (1x wall ~0.3 s).",
        "- Four r8->r9 in-suite slowdowns >=1.8x "
        "(`anns_ivf_topk` 0.35->0.72, `table_profile_documents` "
        "0.59->1.15, `sketch_hll_distinct_users` 0.52->0.95, "
        "`hybrid_rrf_fusion` 0.93->1.66): fresh best-of isolates "
        "0.487 / 0.806 / 0.690 / 1.212 s with in-run spreads "
        "1.3-1.6x -- every isolate sits BETWEEN its r8 and r9 "
        "in-suite readings and inside the documented envelope. "
        "Verdict: suite-interference noise (matview-build sharing "
        "shifts which query pays warmup), plans unchanged, no "
        "regression to fix.",
        "",
        "## r10 close-gate offenders: A/B-adjudicated ENVIRONMENTAL",
        "",
        "The r10 close flagged `bpe_pair_counts` 0.479 -> 0.747 and "
        "`hybrid_fusion_topk` 0.991 -> 1.697 as isolate-confirmed "
        "regressions. Definitive A/B same-machine test: a git "
        "worktree at the r9 close commit (e0952b0), SAME corpus, "
        "SAME matview store, fresh JVMs -- r9 CODE times "
        "bpe_pair_counts 0.81-0.98 s and hybrid_fusion_topk "
        "1.39-1.65 s, indistinguishable from r10 code (0.80-1.18 / "
        "1.63-1.79). The r9 baseline numbers are not reproducible on "
        "today's machine with EITHER code version: the deltas are "
        "environment drift, not plan regressions. DBSF specifically "
        "was piecewise-profiled: the normalization tail costs "
        "+0.1 s over min-max; the legs (unchanged code) carry the "
        "rest. Log-silencer disabled as a control: same numbers.",
        "",
        "## 10x step-up scale ratios (r10, gate raised 3x -> 10x)",
        "",
        "BENCH_scale_step.json at 10x sf0.1 (~sf1), 30/30 oracle-"
        "green, core wall 60.5 s (vs ~21 s at sf0.1 -- ~2.9x wall for "
        "10x data). Per-query step ratios vs the r10 in-suite sf0.1 "
        "walls: ALL 30 SUBLINEAR. Worst five: `window_running_total` "
        "6.5 (1.5M windowed rows, near-linear work as expected), "
        "`embed_documents` 5.6, `q3_shipping_priority` 5.4, "
        "`gopher_quality_filters` 4.8, `q18_large_volume_customers` "
        "4.6 -- every one under the 10x linear bar, none superlinear, "
        "nothing to adjudicate. Eleven queries hold ratios <= 2.2 "
        "(fixed overhead still dominating even at sf1).",
        "",
        "## r11 adjudications: minhash ratio, retrieval A/B, "
        "re-baseline",
        "",
        "- `dedup_minhash_lsh` 10x ratio (r10 What's-wrong #1, the "
        "one unadjudicated >3.0 crosser): r10 in-bench 4.35 -> fresh "
        "`scale_ratio_spot` 2.32 (10x wall 2.72 s). MEASUREMENT "
        "NOISE on the drifted machine, same verdict family as r9's "
        "dedup_embedding_cosine 3.82->2.07; the one-pass banded plan "
        "is unchanged and back under the <=3 bar. The same spot run "
        "re-confirmed the index-lifecycle ratios: lsh_append 0.98, "
        "pq_append 1.02, lsh_delete 1.07, pq_delete 1.01, knn_graph "
        "1.74 -- the incremental contract holds.",
        "- `rag_retrieve_citations` / retrieval_ms_per_query_batched "
        "(r10 What's-wrong #3: inherited the environmental verdict "
        "without its own A/B): definitive same-machine A/B this "
        "round -- git worktree at the r9 close commit (e0952b0), "
        "interleaved fresh-JVM isolates, best-of-4, two passes. r9 "
        "CODE on today's machine: 1.277/1.359 s (159.6/169.9 "
        "ms/query) -- its committed 94.6 ms/query baseline is NOT "
        "reproducible with its own code. HEAD: 0.955/1.203 s "
        "(119.4/150.4 ms/query), faster than r9 code in both "
        "passes. Verdict: ENVIRONMENTAL, no code regression on the "
        "retrieval path; both readings stay well under the ~400 ms "
        "BASELINE.md anchor.",
        "- Baseline re-struck (r10-VERDICT item 1): the r11 close's "
        "fresh full bench replaces the drift-contaminated r10 "
        "BENCH_local.json as the regression baseline, and bench.py "
        "now records a MACHINE CALIBRATION FINGERPRINT (two fixed "
        "synthetic no-I/O jobs) every run; close_round relaxes the "
        "regression bar by the measured cpu-fingerprint ratio "
        "(clamped 3x, never tightened) instead of paging on drift. "
        "Matview builds are attributed separately "
        "(matview_build_seconds in the detail file) so first-run "
        "build cost no longer pollutes per-query spreads, and the "
        "streaming serve latency is regression-gated next to the "
        "core wall.",
        "",
        "## r12 adjudications: anns_lsh_bucketed spot, standing-"
        "verdict map, recall-report warm-up",
        "",
        "- `anns_lsh_bucketed` 10x ratio (r11's one crosser with no "
        "written adjudication: in-bench 3.01, r10 2.96): fresh "
        "`scale_ratio_spot` this round 2.14 (10x wall 2.03 s). "
        "MEASUREMENT NOISE on a ~1 s denominator; the stored-index "
        "bucket-probe plan is unchanged and under the <=3 bar. The "
        "same spot re-confirmed the lifecycle ratios: lsh_append "
        "0.94, pq_append 1.10, lsh_delete 1.16, pq_delete 1.05, "
        "knn_graph 2.09.",
        "- Standing adjudications are now MACHINE-READABLE "
        "(`bench.RATIO_ADJUDICATED`): cdc_apply_orders (data-"
        "genuine), decontaminate_fuzzy_minhash (data-genuine), "
        "dedup_minhash_lsh (noise), anns_lsh_bucketed (noise). A "
        "derived ratio that crosses 3.0 for a mapped name emits its "
        "standing verdict string next to the number instead of "
        "re-flagging; the measured ratio is never suppressed, and "
        "`tools/scale_ratio_spot.py` remains the arbiter for new "
        "crossers and for retiring entries.",
        "- `anns_recall_report` residual spread (r11 What's-wrong "
        "#2: 5.21 with a warm store, matview_build_seconds empty): "
        "attributed to FIRST-TOUCH cost on the eight stored leg "
        "tables the omnibus unions (page cache + parquet footers), "
        "not to any plan property -- isolates hold 0.30-0.60 s. The "
        "bench now runs one DISCARDED warm-up pass for queries in "
        "`bench.MATVIEW_UNION_WARMUP` before their timed runs "
        "(recorded as warmup_discarded in the detail file).",
        "- Kafka / real-model seams re-checked r12 (standing, "
        "environment-bound): no spark-sql-kafka jar (no ivy/m2 cache, "
        "no network) and none of sentence_transformers / whisperx / "
        "langchain / paddleocr importable -- the 4 importorskip "
        "real-backend e2e tests and the langchain golden cross-check "
        "remain unrun; the injectable seams, exact-coordinate raise "
        "paths, and docs/KAFKA.md runbook are unchanged.",
        "",
    ]
    # GLOBAL-WINDOW GUARD (round 8): no unpartitioned WindowExec over
    # unbounded rows in any registered plan -- the single-reducer-sort
    # family operators/rank.py exists to replace. Bounded-grain
    # exceptions live (with justifications) in
    # plans.registry.BOUNDED_GLOBAL_WINDOWS.
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import (
        BOUNDED_GLOBAL_WINDOWS,
        unpartitioned_window_specs,
    )

    violations = {}
    for name, claim in AUDIT:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = unpartitioned_window_specs(plan)
        if bad and name not in BOUNDED_GLOBAL_WINDOWS:
            violations[name] = bad[0][:60]
        s = summarize(plan)
        out.append(f"## {name}")
        out.append("")
        out.append(claim)
        out.append("")
        cached = (
            f", cached-relation scans: {s['cached_scans']}"
            if s["cached_scans"]
            else ""
        )
        out.append(
            f"- exchanges: {s['exchanges']} (broadcast: {s['broadcasts']}), "
            f"parquet scans: {s['scans']}, "
            f"map-side partial agg: {s['partial_aggs']}{cached}"
        )
        for p in s["pushed"]:
            out.append(f"- `{p}`")
        for sc in s["schemas"]:
            out.append(f"- `{sc}`")
        out.append("")
    if violations:
        raise SystemExit(
            "unpartitioned WindowExec in registered plans (rewire onto "
            "operators/rank.distributed_rank or justify in "
            f"plans.registry.BOUNDED_GLOBAL_WINDOWS): {violations}"
        )
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
