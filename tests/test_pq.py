"""IVF-PQ contracts: the codegen ADC fold must equal the numpy
reconstruction arithmetic exactly, refinement must recover the exact-
IVF recall at the same probe fraction, and the index must be built
once and probed thereafter."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import pq, similarity


def _recall(df, bf):
    got = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(bf[q] & got.get(q, set())) for q in bf) / sum(
        len(v) for v in bf.values()
    )


def test_ivfpq_refined_recall_matches_exact_ivf(spark, sf_dir):
    """With the refine stage, PQ quantization error may only cost
    shortlist membership, not ranking: recall@10 must be within 0.05
    of the exact-IVF path at the same probe fraction (seeded codebooks
    make both sides deterministic)."""
    bf = {}
    for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    r_ivf = _recall(similarity.anns_ivf_topk(spark, sf_dir), bf)
    r_pq = _recall(pq.anns_ivfpq_topk(spark, sf_dir), bf)
    assert r_pq >= r_ivf - 0.05
    assert r_pq >= 0.5


def test_adc_fold_equals_numpy_reconstruction(spark, sf_dir):
    """The higher-order-function ADC fold (sum_j LUT[j*K + code_j])
    must reproduce numpy's inner product against the quantized
    reconstruction bit-for-bit (up to the emitted rounding)."""
    codebooks, codes_df, _ = pq.pq_build(spark, sf_dir)
    base = similarity._vectors(spark, sf_dir)
    q = (
        base.filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    got = {
        r.neighbor_id: r.adc_score
        for r in pq.pq_probe(spark, sf_dir, q, refine_factor=0).collect()
    }
    assert got, "ADC probe returned nothing"

    qv = np.asarray(base.filter(F.col("vec_id") == 0).head().v)
    m, kc, dsub = codebooks.shape
    codes = {r.vec_id: r.code for r in codes_df.collect()}
    for nid, score in got.items():
        recon = np.concatenate([codebooks[j, codes[nid][j]] for j in range(m)])
        assert abs(float(qv @ recon) - score) < 1e-4, nid


def test_codes_are_m_bytes_and_bounded(spark, sf_dir):
    """The stored code table is the compression claim: M entries per
    vector, each < K (8-16 B/vector vs 256 B raw), one row per corpus
    vector."""
    _, codes_df, _ = pq.pq_build(spark, sf_dir)
    n_corpus = similarity._vectors(spark, sf_dir).count()
    bad = codes_df.filter(
        (F.size("code") != pq.PQ_M)
        | (F.array_max("code") >= pq.PQ_K)
        | (F.array_min("code") < 0)
    ).count()
    assert bad == 0
    assert codes_df.count() == n_corpus


def test_pq_index_built_once_per_session(spark, sf_dir):
    a = pq.pq_build(spark, sf_dir)
    b = pq.pq_build(spark, sf_dir)
    assert a is b


def test_incremental_appends_extend_indexes_without_retrain(
    spark, sf_dir, tmp_path
):
    """Index lifecycle: build on a partial corpus, append the rest --
    LSH appended signatures must be IDENTICAL to a full build (the
    seeded planes are deterministic), and PQ appends must encode with
    the FROZEN codebooks (same codebooks object, appended vectors
    probe-able through both coarse cells and refine)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "corpus")
    emb.filter(F.col("vec_id") < 400).write.parquet(f"{d}/embeddings.parquet")
    new_batch = emb.filter(F.col("vec_id") >= 400)

    # --- LSH: build(400) + append(100) == signatures of build(500)
    idx = similarity.lsh_build(spark, d)
    assert idx.count() == 400
    idx2 = similarity.lsh_append(spark, d, new_batch)
    assert idx2.count() == 500
    full_sig = {
        r.neighbor_id: r.csig
        for r in similarity.lsh_build(spark, sf_dir).collect()
    }
    for r in idx2.filter(F.col("neighbor_id") >= 400).collect():
        assert r.csig == full_sig[r.neighbor_id], r.neighbor_id

    # --- PQ: append with frozen codebooks; appended ids retrievable
    cb0, codes0, _ = pq.pq_build(spark, d)
    assert codes0.count() == 400
    cb1, codes1, _ = pq.pq_append(spark, d, new_batch)
    assert cb1 is cb0
    assert codes1.count() == 500
    assert codes1.filter(F.col("vec_id") >= 400).count() == 100
    # a probe FOR an appended vector must find it: the query id here is
    # an external id that happens to equal a corpus vec_id, so
    # exclude_self=False (the external-id-space contract)
    q = new_batch.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    got = pq.pq_probe(spark, d, q, exclude_self=False).collect()
    assert got, "probe over appended index returned nothing"
    target = q.head().query_id
    assert any(r.neighbor_id == target and r.rank == 1 for r in got), (
        "appended vector not retrieved as its own nearest neighbor"
    )

    # --- delete: removed ids vanish from both indexes and results
    victims = [400, 401, int(target)]
    idx3 = similarity.lsh_delete(spark, d, victims)
    assert idx3.filter(F.col("neighbor_id").isin(victims)).count() == 0
    assert idx3.count() == 500 - len(set(victims))
    _cb, codes2, _ = pq.pq_delete(spark, d, victims)
    assert codes2.filter(F.col("vec_id").isin(victims)).count() == 0
    got2 = pq.pq_probe(spark, d, q).collect()
    assert all(r.neighbor_id not in set(victims) for r in got2)


def test_tombstone_delete_compact_roundtrip_and_recall_floor(
    spark, sf_dir, tmp_path
):
    """The r10 delete contract end-to-end: (1) delete is a tombstone
    APPEND -- the stored index files do NOT shrink, every serve path
    (LSH topk, IVF, PQ probe) hides the points immediately; (2)
    index_compact folds tombstones into the files (they physically
    shrink, tombstone dir clears) with IDENTICAL query results before
    and after; (3) post-delete recall floor: top-k over the survivors
    still recovers the exact-cosine survivor ground truth at the
    documented LSH floor."""
    import os

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "corpus")
    emb.filter(F.col("vec_id") < 500).write.parquet(
        f"{d}/embeddings.parquet"
    )
    idx = similarity.lsh_build(spark, d)
    pq.pq_build(spark, d)
    n0 = idx.count()
    victims = [3, 7, 11, 400, 401]

    idx2 = similarity.lsh_delete(spark, d, victims)
    # view hides them; stored file does NOT shrink (tombstone, not
    # rewrite)
    assert idx2.count() == n0 - len(victims)
    assert idx2.filter(F.col("neighbor_id").isin(victims)).count() == 0
    raw = spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    )
    assert raw.count() == n0
    assert os.path.exists(similarity._vec_tomb_path(d))

    # every serve path hides the points
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qv"))
    )
    vset = set(victims)
    lsh_rows = similarity.topk_cosine(
        similarity._vectors(spark, d), queries, k=10, strategy="lsh",
        cand_signed=lambda: similarity.lsh_build(spark, d),
    ).collect()
    assert lsh_rows and all(r.neighbor_id not in vset for r in lsh_rows)
    pq_rows = pq.pq_probe(spark, d, queries).collect()
    assert pq_rows and all(r.neighbor_id not in vset for r in pq_rows)
    cents, assigned, nc = similarity.ivf_build(spark, d)
    assert assigned.filter(F.col("vec_id").isin(victims)).count() == 0

    before = sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in lsh_rows
    )

    # recall floor vs survivor exact ground truth
    survivors = similarity._vectors(spark, d).filter(
        ~F.col("vec_id").isin(victims)
    )
    exact = similarity.topk_cosine(
        survivors, queries, k=10, strategy="brute")
    bf = {}
    for r in exact.collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in lsh_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(
        len(bf[q] & got.get(q, set())) for q in bf
    ) / sum(len(v) for v in bf.values())
    assert recall >= 0.6, f"post-delete LSH recall {recall:.2f}"

    # compact: files shrink, tombstones clear, results identical
    folded = similarity.index_compact(spark, d)
    assert folded == len(victims)
    assert not os.path.exists(similarity._vec_tomb_path(d))
    raw2 = spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    )
    assert raw2.count() == n0 - len(victims)
    after = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.topk_cosine(
            similarity._vectors(spark, d), queries, k=10, strategy="lsh",
            cand_signed=lambda: similarity.lsh_build(spark, d),
        ).collect()
    )
    assert after == before
    # idempotent: nothing left to fold
    assert similarity.index_compact(spark, d) == 0


def test_append_after_delete_resurrects_point(spark, sf_dir, tmp_path):
    """Re-inserting a deleted id must bring the point BACK (the upsert
    contract a vector store honors): the append clears the id's
    tombstone, the stored row becomes visible again, and the
    idempotent membership check prevents a duplicate physical row."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "corpus")
    emb.filter(F.col("vec_id") < 300).write.parquet(
        f"{d}/embeddings.parquet"
    )
    idx = similarity.lsh_build(spark, d)
    pq.pq_build(spark, d)
    n0 = idx.count()

    victims = [5, 6]
    similarity.lsh_delete(spark, d, victims)
    assert similarity.lsh_build(spark, d).count() == n0 - 2

    # re-insert one victim (same id/content), plus a genuinely new id
    batch = emb.filter(F.col("vec_id").isin([5, 300]))
    idx2 = similarity.lsh_append(spark, d, batch)
    assert idx2.filter(F.col("neighbor_id") == 5).count() == 1  # back
    assert idx2.filter(F.col("neighbor_id") == 6).count() == 0  # stays gone
    assert idx2.filter(F.col("neighbor_id") == 300).count() == 1
    assert idx2.count() == n0 - 1 + 1
    # no duplicate physical row for the resurrected id
    raw = spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    )
    assert raw.filter(F.col("neighbor_id") == 5).count() == 1

    # PQ face: same resurrection through pq_append
    _cb, codes, _ = pq.pq_append(spark, d, batch)
    assert codes.filter(F.col("vec_id") == 5).count() == 1
    assert codes.filter(F.col("vec_id") == 6).count() == 0

    # remaining tombstone (id 6) still folds on compact
    assert similarity.index_compact(spark, d) == 1
    assert spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    ).filter(F.col("neighbor_id") == 6).count() == 0


def test_append_overwrites_changed_content(spark, sf_dir, tmp_path):
    """Qdrant point-UPSERT contract (r10 ADVICE item): re-inserting an
    id with DIFFERENT content must OVERWRITE the stored point -- the
    pre-r11 behavior kept the stale stored row and silently discarded
    the caller's new vector. Covers (a) plain overwrite of a live id,
    (b) overwrite through the append-after-delete resurrection path,
    (c) replay idempotence after the overwrite, for both LSH and PQ."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "corpus")
    emb.filter(F.col("vec_id") < 300).write.parquet(
        f"{d}/embeddings.parquet"
    )
    idx = similarity.lsh_build(spark, d)
    pq.pq_build(spark, d)
    n0 = idx.count()

    orig7 = [float(x) for x in emb.filter(
        F.col("vec_id") == 7).head().embedding]
    new7 = list(reversed(orig7))
    assert new7 != orig7
    # id 7 mutated, id 8 identical (pure replay) in ONE batch
    batch = (emb.filter(F.col("vec_id").isin([7, 8]))
             .withColumn("embedding", F.when(
                 F.col("vec_id") == 7,
                 F.reverse(F.col("embedding"))
             ).otherwise(F.col("embedding"))))

    # --- (a) LSH overwrite: one physical row, carrying the NEW vector
    idx2 = similarity.lsh_append(spark, d, batch)
    assert idx2.count() == n0
    raw = spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    )
    rows7 = raw.filter(F.col("neighbor_id") == 7).collect()
    assert len(rows7) == 1
    assert [float(x) for x in rows7[0].cv] == new7
    # signature re-encoded from the new vector (deterministic planes)
    fresh_sig = (spark.createDataFrame([(7, None, new7)],
                                       "neighbor_id long, label string,"
                                       " cv array<double>")
                 .withColumn("csig", similarity.rh_sig_udf(
                     similarity.LSH_BITS, similarity.LSH_TABLES)(F.col("cv")))
                 .head().csig)
    assert list(rows7[0].csig) == list(fresh_sig)
    assert raw.filter(F.col("neighbor_id") == 8).count() == 1  # replay skip

    # --- (c) replay idempotence AFTER the overwrite: same batch again
    idx3 = similarity.lsh_append(spark, d, batch)
    assert idx3.count() == n0
    assert spark.read.parquet(
        similarity._lsh_path(d, similarity.LSH_BITS, similarity.LSH_TABLES)
    ).filter(F.col("neighbor_id") == 7).count() == 1

    # --- PQ overwrite: codes AND refine-stage assignments re-encoded
    _cb, codes, _ = pq.pq_append(spark, d, batch)
    assert codes.filter(F.col("vec_id") == 7).count() == 1
    _cent, assign_path = similarity._ivf_paths(d)
    arow = spark.read.parquet(assign_path).filter(
        F.col("vec_id") == 7).collect()
    assert len(arow) == 1
    assert [float(x) for x in arow[0].v] == new7
    # the probe must now retrieve id 7 for ITS NEW vector
    q = spark.createDataFrame([(7, new7)], "query_id long, qv array<double>")
    got = pq.pq_probe(spark, d, q, exclude_self=False).collect()
    assert any(r.neighbor_id == 7 and r.rank == 1 for r in got)

    # --- (b) delete -> re-insert with CHANGED content: the
    # resurrection must serve the new vector, not the tombstoned old
    similarity.lsh_delete(spark, d, [9])
    orig9 = [float(x) for x in emb.filter(
        F.col("vec_id") == 9).head().embedding]
    new9 = list(reversed(orig9))
    batch9 = (emb.filter(F.col("vec_id") == 9)
              .withColumn("embedding", F.reverse(F.col("embedding"))))
    idx4 = similarity.lsh_append(spark, d, batch9)
    r9 = idx4.filter(F.col("neighbor_id") == 9).collect()
    assert len(r9) == 1
    assert [float(x) for x in r9[0].cv] == new9
    _cb, codes9, _ = pq.pq_append(spark, d, batch9)
    assert codes9.filter(F.col("vec_id") == 9).count() == 1
    assert [float(x) for x in spark.read.parquet(assign_path).filter(
        F.col("vec_id") == 9).head().v] == new9
