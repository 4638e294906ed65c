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
    "corpus_sample_split",
    "a8_doc_distribution",
]


@pytest.fixture(scope="module")
def null_corpus(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_corpus"))
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "key agg row scan slow", None, "", "   ",
            "table value part hash merge",
        ],
        "lang": ["en"] * 5,
        "source": ["s0"] * 5,
        "n_chars": [21, 0, 0, 3, 27],
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
