"""NULL/empty-text robustness: at 100 TB, NULL and degenerate text
rows are ubiquitous, and the engine's contract is that every
document-path query treats NULL text as the EMPTY document --
identically in the Spark plan and its DuckDB oracle (no
division-by-zero crashes, no concat_ws-skips-null vs ||-propagates-null
divergence). This sweep runs the registered text-path queries on a
synthetic corpus carrying NULL, empty, whitespace-only, and normal
rows, and hash-compares both sides exactly like the oracle gate."""

from __future__ import annotations

import pytest

NULL_SWEEP = [
    "text_quality_flags",
    "dedup_exact",
    "chunk_sliding_window",
    "chunk_semantic_split",
    "chunk_content_defined",
    "cdc_dedup_report",
    "cdc_incremental_embed",
    "tokenizer_fertility_by_lang",
    "chunk_word_budget",
    "chunk_token_budget_bpe",
    "chunk_markdown_docs",
    "chunk_markdown_reference",
    "text_token_stats",
    "seq_len_histogram",
    "gopher_quality_filters",
    "bpe_pair_counts",
    "text_lang_id",
    "text_slugify",
    "content_addressed_ids",
    "text_fingerprint",
    "intradoc_line_dedup",
    "vocab_top_coverage",
    "text_winnow_fingerprint",
    "quality_tempered_sample",
    "curriculum_quality_phases",
    "pack_concat_chunks",
    "pack_greedy_firstfit",
    "curate_corpus_e2e",
    "dedup_minhash_lsh",
    "dedup_jaccard_verify",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "dedup_containment_verify",
    "kneser_ney_bigram_topk",
    "canary_contamination_scan",
    "keyword_tag_docs",
    "shard_manifest_offsets",
    "dedup_substring_spans",
    "boilerplate_sentence_dedup",
    "decontaminate_benchmark_overlap",
    "decontaminate_fuzzy_minhash",
    "lm_perplexity_score",
    "pii_redaction",
    "domain_mixture_resample",
    "domain_cap_sample",
    "corpus_quality_by_source",
    "top_terms_by_source",
    "sparse_vectors_build",
    "sparse_bm25_topk",
    "tfidf_top_terms",
    "phrase_match_positional",
    "dedup_lsh_firstseen",
    "dup_rate_by_source",
    "ngram_nextword_topk",
    "hhi_source_concentration",
    "dup_cluster_size_histogram",
    "doc_novelty_score",
    "rag_rerank_crossencoder",
    "text_nfc_normalize",
    "corpus_sample_split",
    "a8_doc_distribution",
    "epoch_shuffle_shards",
    "sketch_countmin_heavyhitters",
    "dedup_bloom_prefilter",
    "quality_classifier_hashed",
    "token_budget_sample",
    "text_sentence_split",
    "ingest_pipeline_e2e",
    "corpus_snapshot_diff",
    "table_profile_documents",
    "span_corruption_pairs",
    "text_readability",
    "dsir_importance_weights",
    "pmi_collocations",
    "stratified_holdout_split",
    "skyline_quality_docs",
    "token_budget_waterfill",
    "weighted_sample_es",
    "compaction_plan",
    "zipf_fit_report",
    "dedup_edit_distance",
    "lang_confusion_report",
    "bpe_learn_merges",
    "text_char_entropy",
    "kwic_concordance",
    "text_code_detect",
    "bpe_encode_corpus",
    "seqlen_bucketing",
    "entity_resolution_golden",
    "er_append",
    "er_reresolve",
    "prf_query_expansion",
    "group_kfold_split",
    "score_decile_lift",
    "bootstrap_mean_ci",
]


@pytest.fixture(scope="module")
def null_corpus(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_corpus"))
    # doc 5 carries an INTERNAL vertical tab: the tokenization contract
    # pins the explicit class [ \t\n\x0B\f\r]+ on every engine (Java \s
    # includes \x0B, RE2's excludes it), and this row keeps that honest
    texts = [
        "key agg row scan slow", None, "", "   ",
        "table value part hash merge",
        # corpus-vocabulary words so the pinned-BPE coverage condition
        # (chunk_token_budget_bpe's documented oracle precondition)
        # still holds once the \x0B is treated as whitespace
        "key\x0Bagg row\x0Bscan merge",
    ]
    pq.write_table(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s0"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    }), f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def null_con(null_corpus):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_corpus}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", NULL_SWEEP)
def test_null_text_matches_oracle(name, spark, null_corpus, null_con):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    sdf = e.queries()[name](spark, null_corpus)
    assert_matches_oracle(sdf, null_con, e.oracle_sql()[name], name)


# ---- non-ASCII / normalization-form probes --------------------------------
# Composed vs decomposed accents, a compatibility ligature, and
# fullwidth letters: every hash/measure/tokenize convention must agree
# across engines BEFORE any normalization. chunk_token_budget_bpe is
# excluded by its documented precondition (the pinned tokenizer's vocab
# covers the TESTDATA corpus; these synthetic words are open-vocabulary
# by construction, where the window-algebra oracle deliberately
# diverges).
UNICODE_SWEEP = [n for n in NULL_SWEEP if n != "chunk_token_budget_bpe"]


@pytest.fixture(scope="module")
def unicode_corpus(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("unicode_corpus"))
    texts = [
        "key agg row scan slow",
        "cafe\u0301 caf\u00e9 scan row",  # decomposed vs composed
        "ﬁle merge ＡＢ half½",  # ligature, fullwidth
        "naïve résumé merge",
    ]
    pq.write_table(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s0"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }), f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def unicode_con(unicode_corpus):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{unicode_corpus}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", UNICODE_SWEEP)
def test_unicode_text_matches_oracle(name, spark, unicode_corpus,
                                     unicode_con):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    sdf = e.queries()[name](spark, unicode_corpus)
    assert_matches_oracle(sdf, unicode_con, e.oracle_sql()[name], name)


EVENTS_NULL_SWEEP = [
    "a1_events_per_day", "a2_value_stats_by_type", "a3_efficiency_by_type",
    "a4_error_rate_by_day", "a5_top20_events", "a6_summary",
    "a7_weekly_lag", "a9_backlog", "a10_user_timing", "a11_json_props",
    "props_key_histogram", "grouping_sets_events", "rollup_events",
    "pivot_events_daily", "unpivot_daily_counts", "window_running_total",
    "window_rolling_7day_value", "window_value_quartiles",
    "window_forward_fill", "funnel_view_click_purchase",
    "daily_anomaly_zscore", "set_error_not_purchase_user_days",
    "gatekeeper_failure_history", "interval_join_click_purchase",
    "asof_join_last_purchase", "sessionize_events", "sessionize_session_window", "chat_session_history",
    "chat_session_history_ttl", "stale_agents",
    "sketch_cardinality_quantiles",
    "zorder_layout", "scd2_user_segments", "scd2_point_in_time_join",
    "sketch_hll_distinct_users", "nextevent_training_pairs",
    "retention_cohorts", "k_anonymity_report",
    "markov_transition_stationary", "ab_test_conversion",
    "session_trigram_mining", "hll_set_operations",
    "temporal_leakage_split", "psi_value_drift",
    "theilsen_daily_trend", "benford_value_audit",
    "seasonal_decompose_daily", "interarrival_histogram",
    "ohlc_daily_by_type", "m4_downsample_events", "twap_by_user",
    "event_debounce", "t_closeness_report",
    "skew_report_events", "skewed_distinct_salted",
    "ewma_control_chart", "seq_pattern_match", "funnel_attribution",
    "rfm_segments", "time_to_event_labels",
    "acf_daily_counts", "cusum_control_chart",
    "latency_percentiles_exact", "mad_robust_anomaly",
    "zonemap_skipping_report", "item_cooccurrence_lift",
    "arrival_lateness_report", "dataset_card_report",
    "anomaly_top_movers", "bounce_rate_daily",
    "gini_user_activity", "winsorized_value_stats",
    "hopping_window_counts", "conversion_lag_histogram",
    "ship_lag_by_supplier", "session_duration_percentiles",
    "revenue_pareto_report",
    "merge_into_customers", "cdc_apply_orders",
]


@pytest.fixture(scope="module")
def null_events(spark, tmp_path_factory, sf_dir):
    """Events corpus with NULL user_id / event_type / value / ts /
    props plus malformed JSON, alongside normal rows. Queries that also
    read other tables (window_running_total joins orders) get the real
    sf tables copied in."""
    import datetime as dt
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_events"))
    ts0 = dt.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (i, i % 7, ["view", "click", "purchase", "error", "signup"][i % 5],
         float(i), ts0 + dt.timedelta(hours=i), '{"k":"1"}')
        for i in range(40)
    ]
    rows += [
        (100, None, "view", 1.0, ts0, '{"k":"2"}'),
        (101, 3, None, 2.0, ts0 + dt.timedelta(days=1), None),
        (102, 4, "click", None, ts0 + dt.timedelta(days=2), "{}"),
        (103, 5, "view", 3.0, None, "not json"),
        # a group whose EVERY row has NULL value and NULL user, with a
        # valid-JSON non-numeric property: the contract booleans must
        # stay total and casts lenient on both engines
        (200, None, "ghost", None, ts0, '{"k":"abc"}'),
        (201, None, "ghost", None, ts0, None),
        # decimal-string and whitespace-padded integer properties: the
        # cast contract is INTEGER-LITERAL (Spark try_cast NULLs '3.7'
        # where an unguarded DuckDB TRY_CAST would round it to 4).
        # These two rows are ALSO exactly GAP_SECONDS apart -- the
        # boundary that exposed the session_window >= vs > divergence
        (202, 6, "view", 4.0, ts0 + dt.timedelta(hours=3), '{"k":"3.7"}'),
        (203, 6, "click", 5.0, ts0 + dt.timedelta(hours=4),
         '{"k":" 12 "}'),
        # time-comparison BOUNDARY probes (every <=/</>=/> against a
        # window edge must agree across engines):
        # - purchase at EXACTLY click_ts (interval join lower bound >=;
        #   as-of equal-ts visibility; funnel's strict ts > t2)
        (210, 8, "click", 1.0, ts0 + dt.timedelta(days=3), None),
        (211, 8, "purchase", 2.0, ts0 + dt.timedelta(days=3), None),
        # - purchase at EXACTLY click_ts + REPLY_WINDOW (upper bound <=)
        (212, 8, "purchase", 3.0,
         ts0 + dt.timedelta(days=3, minutes=10), None),
        # - view/click at the SAME instant (funnel's strict ts > t1:
        #   the click must NOT advance the funnel)
        (213, 9, "view", 1.0, ts0 + dt.timedelta(days=4), None),
        (214, 9, "click", 1.0, ts0 + dt.timedelta(days=4), None),
        # - rows exactly 6 days (the rolling RANGE bound) apart
        (215, 9, "view", 2.0, ts0 + dt.timedelta(days=4, seconds=518400),
         None),
        # - debounce boundary: same (user, type) exactly
        #   DEBOUNCE_SECONDS apart (stays in the burst, merge rule is
        #   gap <= D), then strictly one second beyond (new burst);
        #   220/221 also land in the SAME second for the TWAP
        #   zero-weight edge when seconds-truncated
        (220, 11, "view", 1.0, ts0 + dt.timedelta(days=5), None),
        (221, 11, "view", 2.0,
         ts0 + dt.timedelta(days=5, microseconds=500000), None),
        (222, 11, "view", 3.0,
         ts0 + dt.timedelta(days=5, seconds=1800, microseconds=500000),
         None),
        (223, 11, "view", 4.0,
         ts0 + dt.timedelta(days=5, seconds=3601), None),
    ]
    pq.write_table(pa.table({
        "event_id": [r[0] for r in rows],
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": [r[2] for r in rows],
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        "props": [r[5] for r in rows],
    }), f"{d}/events.parquet")
    for t in ["orders", "lineitem", "customer", "documents",
              "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def null_events_con(null_events):
    import duckdb

    con = duckdb.connect()
    for t in ["events", "orders", "lineitem", "customer", "documents",
              "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{null_events}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", EVENTS_NULL_SWEEP)
def test_null_events_match_oracle(name, spark, null_events, null_events_con):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    sdf = e.queries()[name](spark, null_events)
    assert_matches_oracle(sdf, null_events_con, e.oracle_sql()[name], name)


EMB_NULL_SWEEP = [
    "anns_bruteforce_topk", "anns_lsh_bucketed", "anns_lsh_multiprobe",
    "anns_filtered_topk", "anns_grouped_topk", "anns_bq_hamming_topk",
    "anns_label_maxsim_topk", "lsh_bucket_histogram",
    "dedup_embedding_cosine", "dedup_semantic_keep", "knn_graph_lsh",
    "dedup_connected_components", "embedding_health_report",
    "label_centroids", "embedding_quantize_int8", "anns_ivf_topk",
    "anns_ivfpq_topk", "anns_ivf_filtered_topk", "anns_recall_report",
    "rag_retrieve_citations", "rag_mmr_rerank", "hybrid_fusion_topk",
    "multimodal_phash_dedup", "embed_kmeans", "embed_random_projection",
    "cluster_cartography", "knn_pagerank", "anns_hard_negatives",
    "anns_matryoshka_topk", "contrastive_triplets",
    "retrieval_metrics_report", "anns_late_interaction_topk",
    "anns_late_interaction_served",
    "knn_triangle_count", "embedding_standardize",
    "knn_label_propagation", "knn_label_disagreement",
    "pca_top_component",
    "embedding_isotropy_report", "knn_kcore",
    "embedding_drift_report", "knn_bfs_landmarks",
    "knn_density_outliers", "anns_range_search",
    "coreset_kcenter_select", "cluster_label_agreement",
    "coreset_kcenter_append", "bitext_margin_pairs",
    "bitext_margin_mined",
]


@pytest.fixture(scope="module")
def null_embeddings(spark, tmp_path_factory):
    """Embeddings corpus with one NULL vector (a failed embed row):
    every vector path must EXCLUDE it -- identically in the oracle --
    and embedding_health_report must count it (n_null)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_embeddings"))
    # seed from the tmp path: the IVF/PQ oracles resolve their
    # persisted matviews by corpus CONTENT fingerprint, so a
    # byte-identical corpus at a fresh path would alias any stale
    # matview a previous run left behind (same corpus_key, two dirs)
    import zlib

    rng = np.random.default_rng(zlib.crc32(d.encode()))
    vecs = [
        list(map(float, v / np.linalg.norm(v)))
        for v in rng.standard_normal((30, 64))
    ]
    vecs[7] = None
    # one label's vectors ALL failed to embed (a dead embed shard):
    # per-label aggregates must stay total, not NULL-vs-0 diverge
    for i in range(3, 30, 5):
        vecs[i] = None
    pq.write_table(pa.table({
        "vec_id": list(range(30)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": [i % 5 for i in range(30)],
    }), f"{d}/embeddings.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(30)),
        "text": ["key agg row scan slow value table part"] * 30,
        # mixed langs so the bitext miner sees a real non-en cohort
        # (including docs whose vector is the NULL embed-failure row,
        # which must drop from BOTH cohorts identically)
        "lang": ["en" if i % 2 == 0 else ["de", "fr", "es", "zh"][i % 4]
                 for i in range(30)],
        "source": ["s0"] * 30, "n_chars": [38] * 30,
    }), f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def null_emb_con(null_embeddings):
    import duckdb

    con = duckdb.connect()
    for t in ["embeddings", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{null_embeddings}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", EMB_NULL_SWEEP)
def test_null_embedding_matches_oracle(name, spark, null_embeddings,
                                       null_emb_con):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    sdf = e.queries()[name](spark, null_embeddings)
    assert_matches_oracle(sdf, null_emb_con, e.oracle_sql()[name], name)


def test_health_report_counts_null_vectors(spark, null_embeddings):
    import __spark_entry__ as e

    rows = e.queries()["embedding_health_report"](
        spark, null_embeddings
    ).collect()
    assert sum(r.n_null for r in rows) == 7  # 1 mixed + 6 dead-shard
