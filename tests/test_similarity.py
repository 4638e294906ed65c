"""Similarity search + embedding operator tests: oracle parity,
recall sanity of the LSH path vs brute force, and stub-model
equivalence between the SQL form and the mapInPandas operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import embedding, similarity

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(similarity.ORACLE))
def test_similarity_matches_oracle(name, spark, sf_dir, con):
    sdf = similarity.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, similarity.ORACLE[name], name)


def test_embedding_matches_oracle(spark, sf_dir, con):
    sdf = embedding.QUERIES["embed_documents"](spark, sf_dir)
    assert_matches_oracle(sdf, con, embedding.ORACLE["embed_documents"], "embed_documents")


def test_bruteforce_topk_shape(spark, sf_dir):
    rows = similarity.anns_bruteforce_topk(spark, sf_dir).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == set(range(similarity.N_QUERIES))
    for q, rs in by_query.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, similarity.TOP_K + 1))
        # scores non-increasing with rank
        ordered = sorted(rs, key=lambda r: r.rank)
        assert all(
            ordered[i].cos_sim >= ordered[i + 1].cos_sim - 1e-9
            for i in range(len(ordered) - 1)
        )
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_results_subset_of_bucket_and_scored_exactly(spark, sf_dir):
    """Every LSH hit must carry the same cosine the brute-force path
    assigns it (the bucket only prunes candidates, never rescores)."""
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh = similarity.anns_lsh_bucketed(spark, sf_dir).collect()
    for r in lsh:
        key = (r.query_id, r.neighbor_id)
        if key in bf:  # overlap must agree on the score
            assert abs(bf[key] - r.cos_sim) < 1e-9


def test_stub_model_sql_and_pandas_agree(spark, sf_dir):
    """embed_documents (codegen SQL form) == embed_map_in_pandas
    (Arrow operator form) on the same corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    via_udf = embedding.embed_map_in_pandas(docs).collect()
    sql_rows = embedding.embed_documents(spark, sf_dir).collect()
    sql_map = {}
    for r in sql_rows:
        sql_map.setdefault(r.doc_id, {})[r.dim] = r.val
    for r in via_udf:
        expect = sql_map[r.doc_id]
        for dim, v in enumerate(r.embedding):
            assert abs(round(v, 4) - expect[dim]) <= 1e-4


def test_embeddings_are_unit_norm():
    v = embedding.embed_text_py("the quick brown fox jumps over the lazy dog")
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    assert embedding.embed_text_py("") == [0.0] * embedding.DIM


def test_bm25_scores_rank_term_heavy_docs_first(spark, sf_dir):
    """BM25 invariants: top-k size, descending order, and every scored
    doc actually contains at least one query term."""
    rows = similarity.sparse_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == similarity.BM25_TOP_K
    assert all(
        rows[i].bm25 >= rows[i + 1].bm25 - 1e-9 for i in range(len(rows) - 1)
    )
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        assert r.bm25 > 0
        assert any(t in docs[r.doc_id].split() for t in similarity.BM25_TERMS)


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF-probed results must (a) score identically to brute force on
    overlapping pairs and (b) recover a healthy fraction of the true
    top-k (nprobe/cells recall trade-off)."""
    bf = {}
    for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r.query_id, {})[r.neighbor_id] = r.cos_sim
    ivf_rows = similarity.anns_ivf_topk(spark, sf_dir).collect()
    assert len(ivf_rows) > 0
    hits = total = 0
    for r in ivf_rows:
        if r.neighbor_id in bf.get(r.query_id, {}):
            assert abs(bf[r.query_id][r.neighbor_id] - r.cos_sim) < 1e-9
            hits += 1
    for q, nbrs in bf.items():
        total += len(nbrs)
    assert hits / total >= 0.3  # nprobe=4 of 16 cells


def test_ivf_probe_reads_persisted_index(spark, sf_dir):
    """After ivf_build, serving a query batch must be a pure probe:
    the plan scans the persisted centroids/assignments parquet and
    contains no shuffle of the corpus for (re)assignment -- no KMeans
    refit, no corpus count job at query time."""
    import contextlib
    import io

    similarity.ivf_build(spark, sf_dir)  # warm: build once
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        similarity.anns_ivf_topk(spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "ivf_cent4_" in p
    assert "ivf_asg4_" in p
    # the probe side never round-robins the corpus (that was the
    # build-time rebalance); candidate access is the broadcast
    # cell-id equi-join
    assert "roundrobin" not in p.lower()
    assert "BroadcastHashJoin" in p


def test_ivf_matview_rebuilds_on_corpus_change(spark, tmp_path):
    """Lineage validation: a corpus replaced IN PLACE under the same
    sf_dir must trigger a rebuild on the next (new-session) load, not
    silently serve the stale persisted index; the stamped corpus_key
    always matches the CURRENT corpus fingerprint and carries the
    build-rules version."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "corpus")
    import os

    os.makedirs(d, exist_ok=True)

    def write(seed: int) -> None:
        rng = np.random.default_rng(zlib.crc32(d.encode()) ^ seed)
        vecs = [list(map(float, v / np.linalg.norm(v)))
                for v in rng.standard_normal((30, 64))]
        pq.write_table(pa.table({
            "vec_id": list(range(30)),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": [i % 5 for i in range(30)],
        }), f"{d}/embeddings.parquet")

    write(1)
    cents1, _a1, _n1 = similarity.ivf_build(spark, d)
    k1 = int(cents1.select("corpus_key").first()[0])

    write(2)  # corpus changes under the same path...
    similarity._IVF_STORE.clear()  # ...and a new session loads
    cents2, _a2, _n2 = similarity.ivf_build(spark, d)
    row = cents2.select("corpus_key", "build_ver").first()
    expected = similarity.corpus_fingerprint(similarity._vectors(spark, d))
    assert int(row[0]) == expected != k1
    assert int(row[1]) == similarity.INDEX_BUILD_VER


def test_topk_cosine_auto_strategy_picks_by_pair_count(spark, sf_dir):
    """The planner's stand-in for the `ORDER BY cosine LIMIT k`
    rewrite: small pair counts plan brute-force (exact), large ones
    plan the LSH bucket join; forced strategies agree with auto's pick
    on this corpus (small -> brute)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators import similarity as sim

    base = sim._vectors(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    auto = sim.topk_cosine(base, queries, k=5, strategy="auto")
    brute = sim.topk_cosine(base, queries, k=5, strategy="brute")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, brute.collect()))

    lsh = sim.topk_cosine(base, queries, k=5, strategy="lsh").collect()
    brute_rows = brute.collect()
    # LSH returns a subset of each query's candidates, exactly scored
    exact = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute_rows}
    for r in lsh:
        if (r.query_id, r.neighbor_id) in exact:
            assert abs(r.cos_sim - exact[(r.query_id, r.neighbor_id)]) < 1e-9

    import pytest
    with pytest.raises(ValueError):
        sim.topk_cosine(base, queries, strategy="hnsw")

def test_lsh_recall_against_bruteforce(spark, sf_dir):
    """Multi-table random-hyperplane LSH must recover a healthy share
    of the true top-k (deterministic seeded planes: 0.5625 recall@10 at
    sf0.01 with bits=4, tables=8 -- the (bits, tables) trade-off)."""
    bf = {}
    for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh = {}
    for r in similarity.anns_lsh_bucketed(spark, sf_dir).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf[q] & lsh.get(q, set())) for q in bf)
    total = sum(len(v) for v in bf.values())
    assert hits / total >= 0.5


def test_hyperplane_stream_golden_pin():
    """Signature parity across the driver, every executor, the DuckDB
    oracle literals, AND any persisted index built by an earlier
    session all assume numpy's seeded Generator stream is identical
    everywhere. NumPy does not guarantee stream stability across major
    versions, so pin the generated planes: if an upgrade changes the
    stream this fails loudly instead of silently collapsing recall
    against stored signatures (rebuild indexes + regenerate oracle
    literals together in that case)."""
    h = similarity.hyperplanes(64, similarity.LSH_BITS, similarity.LSH_TABLES)
    assert h.shape == (32, 64)
    assert [float(x) for x in h[0, :4]] == [0.0012, 0.2987, -0.2741, -0.8906]
    assert float(h[-1, -1]) == -0.5542
    assert abs(float(h.sum()) - (-85.5954)) < 1e-9


def test_hyperplane_stream_is_a_prefix():
    """One stored signature index serves every tables<=stored config:
    the seeded Gaussian plane stream must be a prefix, so slicing the
    stored signature array to L entries IS the L-table signature."""
    import numpy as np

    full = similarity.hyperplanes(64, similarity.LSH_BITS, similarity.LSH_TABLES)
    half = similarity.hyperplanes(64, similarity.LSH_BITS,
                                  similarity.LSH_TABLES // 2)
    assert np.array_equal(full[: half.shape[0]], half)


def test_planner_rowcount_prefers_catalyst_stats(spark, tmp_path):
    """When ANALYZE TABLE has populated stats, pricing must read them
    from the optimized plan (no count job); without stats it falls
    back to count(). Both paths must return the exact row count."""
    df = spark.range(123).toDF("x")
    assert similarity.planner_rowcount(df) == 123

    spark.sql("DROP TABLE IF EXISTS _pr_stats_t")
    df.write.mode("overwrite").saveAsTable("_pr_stats_t")
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql("ANALYZE TABLE _pr_stats_t COMPUTE STATISTICS")
        t = spark.table("_pr_stats_t")
        rc = t._jdf.queryExecution().optimizedPlan().stats().rowCount()
        assert rc.isDefined(), "ANALYZE did not populate rowCount stats"
        assert similarity.planner_rowcount(t) == 123
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.sql("DROP TABLE IF EXISTS _pr_stats_t")


def test_grouped_topk_lsh_recall_per_label(spark, sf_dir):
    """The registered grouped (per-tenant) retrieval runs on LSH
    candidates; per-(query, label) it must recover a healthy share of
    the exact per-label top-k (LSH changes the candidate set, never
    the scores)."""
    bf = {}
    for r in similarity.anns_grouped_topk(spark, sf_dir, strategy="brute").collect():
        bf.setdefault((r.query_id, r.label), set()).add(r.neighbor_id)
    lsh = {}
    for r in similarity.anns_grouped_topk(spark, sf_dir).collect():
        lsh.setdefault((r.query_id, r.label), set()).add(r.neighbor_id)
    hits = sum(len(bf[k] & lsh.get(k, set())) for k in bf)
    total = sum(len(v) for v in bf.values())
    assert hits / total >= 0.5


def test_bq_hamming_recall_and_packing(spark, sf_dir):
    """The 8-byte binary quantization must keep healthy recall through
    the oversample+rescore recipe, and the packed halves must fit
    32 bits each (the non-overflow contract of the fold)."""
    from pyspark.sql import functions as F

    bf = {}
    for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in similarity.anns_bq_hamming_topk(spark, sf_dir).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf[q] & got.get(q, set())) for q in bf)
    assert hits / sum(len(v) for v in bf.values()) >= 0.5

    base = similarity._vectors(spark, sf_dir)
    b1, b2 = similarity._bq_halves(F.col("v"))
    bad = base.select(b1.alias("b1"), b2.alias("b2")).filter(
        (F.col("b1") < 0) | (F.col("b1") >= 2**32)
        | (F.col("b2") < 0) | (F.col("b2") >= 2**32)
    ).count()
    assert bad == 0


def test_filtered_topk_prefilters_candidates(spark, sf_dir):
    """Every returned neighbor must satisfy the payload filter, and
    scores must equal the unfiltered path's for shared pairs (the
    filter changes the candidate set, never the scores)."""
    labels = {
        r.vec_id: r.label
        for r in similarity._vectors(spark, sf_dir).collect()
    }
    out = similarity.anns_filtered_topk(spark, sf_dir).collect()
    assert out
    assert all(labels[r.neighbor_id] in similarity.FILTER_LABELS
               for r in out)
    unfiltered = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.anns_lsh_bucketed(spark, sf_dir).collect()
    }
    for r in out:
        if (r.query_id, r.neighbor_id) in unfiltered:
            assert r.cos_sim == unfiltered[(r.query_id, r.neighbor_id)]


def test_retrieve_unified_planner(spark, sf_dir):
    """One logical ask, four physical strategies: every strategy must
    return k rows per query with scores equal to the exact cosine for
    shared (query, neighbor) pairs; the payload filter must bind on
    every strategy that supports it; external query ids with
    exclude_self=False must be able to retrieve their own collision."""
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.retrieve(spark, sf_dir, strategy="brute").collect()
    }
    for strat in ["lsh", "bq", "ivfpq"]:
        rows = similarity.retrieve(spark, sf_dir, strategy=strat).collect()
        assert rows, strat
        for r in rows:
            if (r.query_id, r.neighbor_id) in exact:
                assert abs(r.cos_sim - exact[(r.query_id, r.neighbor_id)]) \
                    <= 1e-4, (strat, r)

    labels = {
        r.vec_id: r.label
        for r in similarity._vectors(spark, sf_dir).collect()
    }
    flt = F.col("label").isin([1, 3])
    for strat in ["brute", "lsh", "bq"]:
        out = similarity.retrieve(
            spark, sf_dir, strategy=strat, payload_filter=flt).collect()
        assert out, strat
        assert all(labels[r.neighbor_id] in (1, 3) for r in out), strat
    import pytest
    with pytest.raises(ValueError, match="ivfpq"):
        similarity.retrieve(spark, sf_dir, strategy="ivfpq",
                            payload_filter=flt)

    # external id space: id collides with a corpus vec_id but is a
    # different query -- with exclude_self=False nothing is dropped
    q = similarity._vectors(spark, sf_dir).filter(
        F.col("vec_id") == 42
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    got = similarity.retrieve(
        spark, sf_dir, queries=q, strategy="bq", exclude_self=False
    ).collect()
    assert any(r.neighbor_id == 42 and r.rank == 1 for r in got)


def test_matview_reused_across_sessions_no_rewrite(spark, sf_dir):
    """A complete on-disk index must be REUSED by a fresh session-store
    (no overwrite: a concurrent session could be mid-scan on it)."""
    import os

    similarity.lsh_build(spark, sf_dir)
    path = similarity._lsh_path(
        sf_dir, similarity.LSH_BITS, similarity.LSH_TABLES)
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    # simulate a brand-new session: same disk state, empty store
    similarity._LSH_STORE.pop(
        (spark, sf_dir, similarity.LSH_BITS, similarity.LSH_TABLES))
    idx = similarity.lsh_build(spark, sf_dir)
    assert idx.count() > 0
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime


def test_multiprobe_recall_beats_half_tables(spark, sf_dir):
    """Multi-probe with tables/2 must at least match plain LSH at
    tables/2 and clear the same 0.5 recall floor as the full-table
    configuration -- the probes are doing the recall work of the
    dropped tables."""
    bf = {}
    for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)

    base = similarity._vectors(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < similarity.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(bf[q] & got.get(q, set())) for q in bf) / sum(
            len(v) for v in bf.values()
        )

    half = similarity.LSH_TABLES // 2
    plain = recall(similarity.topk_cosine(
        base, queries, strategy="lsh", lsh_tables=half))
    probed = recall(similarity.anns_lsh_multiprobe(spark, sf_dir))
    assert probed >= plain
    assert probed >= 0.5


def test_int8_quantization_error_and_recall(spark, sf_dir):
    """Reconstruction error is bounded by half a quantization step per
    component, and exact top-k over DEQUANTIZED vectors stays close to
    the float top-k -- the accuracy contract of the 4x storage cut."""
    from selfhosted_rag_doc_chat_prototype_spark.operators import embedding as emb_mod

    q = emb_mod.embedding_quantize_int8(spark, sf_dir)
    base = similarity._vectors(spark, sf_dir)
    joined = base.join(q, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    "v", "qv",
                    lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
                )
            )
            / F.nullif(F.col("scale"), F.lit(0.0))
        ).alias("worst_steps")
    )
    assert joined.first().worst_steps <= 0.5 + 1e-9

    deq = base.join(q, "vec_id").select(
        "vec_id", "label",
        F.zip_with("qv", F.array_repeat("scale", 64),
                   lambda c, s: c.cast("double") * s).alias("v"),
    )
    bf, qr = {}, {}
    queries_f = base.filter(F.col("vec_id") < similarity.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    queries_q = deq.filter(F.col("vec_id") < similarity.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    for r in similarity.topk_cosine(base, queries_f, strategy="brute").collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in similarity.topk_cosine(deq, queries_q, strategy="brute").collect():
        qr.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = sum(len(bf[k] & qr.get(k, set())) for k in bf) / sum(
        len(v) for v in bf.values())
    assert recall >= 0.9


def test_quantize_zero_vector_is_representable(spark):
    """A zero vector must not divide by zero: scale 0, all-zero codes."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.embedding import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, v array<double>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[1].scale == 0.0 and rows[1].qv == [0, 0, 0]
    assert rows[2].qv[1] in (-127, 127) and abs(rows[2].qv[1]) == 127


def test_hard_negatives_never_share_anchor_label(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        HARDNEG_K,
        anns_hard_negatives,
    )

    rows = anns_hard_negatives(spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r.neg_label != r.q_label
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= HARDNEG_K


def test_recall_report_covers_all_serve_paths(spark, sf_dir):
    """One strategy column covers every approximate serve path, each
    with a per-strategy mean-recall floor (deterministic: seeded
    planes / codebooks, fixed corpus). Floors sit below the measured
    sf0.001 means (bq .56, hardneg .67, ivf .76, ivfpq .72, lsh .69,
    multiprobe .81, matryoshka .45, late_interaction .21, sq 1.0,
    range_lsh .67) with margin for corpus regeneration.

    The matryoshka and late_interaction floors are intentionally LOW:
    the synthetic embeddings are isotropic random vectors, so a 16-dim
    prefix carries ~1/4 of the signal (a real MRL-trained embedder
    front-loads variance into the prefix -- measuring that gap is what
    the strategy row is FOR), and a pooled-cosine LSH shortlist is a
    weak predictor of MaxSim rank on unstructured sub-vectors. The
    report is the tuning observable that would show both recoveries on
    trained embeddings."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        anns_recall_report,
    )

    rep = anns_recall_report(spark, sf_dir)
    means = {
        r.strategy: r.m
        for r in rep.groupBy("strategy").agg(F.avg("recall").alias("m"))
        .collect()
    }
    floors = {
        "lsh": 0.5, "lsh_multiprobe": 0.6, "ivf": 0.55, "ivfpq": 0.5,
        "bq": 0.4, "hardneg": 0.45, "matryoshka": 0.3,
        "late_interaction": 0.12, "sq": 0.9, "range_lsh": 0.3,
    }
    assert set(means) == set(floors)
    for s, floor in floors.items():
        assert means[s] >= floor, (s, means[s])


def test_late_interaction_served_subset_semantics(spark, sf_dir):
    """The served path must (a) only emit neighbors from its own LSH
    shortlist universe, (b) agree with the exact MaxSim ranking ON the
    rows both emit for a query when the served set is a subset, and
    (c) emit exactly TOP_K rows per query (shortlist >= k here)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        TOP_K,
        anns_late_interaction_served,
        anns_late_interaction_topk,
    )

    served = anns_late_interaction_served(spark, sf_dir).collect()
    exact = anns_late_interaction_topk(spark, sf_dir).collect()
    per_q = {}
    for r in served:
        per_q.setdefault(r.query_id, []).append(r)
    assert per_q, "served path emitted nothing"
    for q, rows in per_q.items():
        assert len(rows) == TOP_K
        assert len({r.neighbor_id for r in rows}) == TOP_K
    # scores agree with the exact scorer wherever pairs overlap
    exact_scores = {(r.query_id, r.neighbor_id): r.li_score for r in exact}
    overlap = [
        r for r in served if (r.query_id, r.neighbor_id) in exact_scores
    ]
    assert overlap, "served and exact paths share no pairs at all"
    for r in overlap:
        assert r.li_score == exact_scores[(r.query_id, r.neighbor_id)]


def test_retrieval_metrics_bounds_and_consistency(spark, sf_dir):
    """MRR/NDCG invariants: ndcg_u in [0, 1e6]; mrr_u is exactly
    1e12 div first_hit (0 iff no hit); dcg_u <= idcg headroom; the
    per-query recall implied by the report matches anns_recall_report
    for the lsh strategy."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        MRR_SCALE,
        NDCG_SCALE,
        retrieval_metrics_report,
    )

    rows = retrieval_metrics_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ndcg_u <= NDCG_SCALE
        if r.first_hit:
            assert r.mrr_u == MRR_SCALE // r.first_hit
        else:
            assert r.mrr_u == 0 and r.dcg_u == 0
        assert r.n_exact > 0 and r.n_served > 0


def test_late_interaction_beats_pooled_on_subvector_match(spark):
    """Construct a corpus where doc A matches the query on ONE
    sub-vector exactly but is noise elsewhere, and doc B is mildly
    similar everywhere: late interaction must rank A's matching facet
    highly (its maxsim for that facet = 1.0)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        anns_late_interaction_topk,
    )

    rng = np.random.RandomState(7)
    q = rng.randn(64)
    a = rng.randn(64)
    a[:16] = q[:16]           # facet-exact match
    b = q * 0.3 + rng.randn(64) * 0.7
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "vec_id": [0, 10, 11],
            "embedding": [q.tolist(), a.tolist(), b.tolist()],
            "label": [0, 1, 2],
        }), f"{d}/embeddings.parquet")
        got = {r.neighbor_id: r
               for r in anns_late_interaction_topk(spark, d).collect()
               if r.query_id == 0}
    assert set(got) == {10, 11}
    # facet 0's maxsim against doc A is exactly 1.0, so A's score > 1
    assert got[10].li_score > 1.0


def test_bitext_mined_recall_floor_vs_exact(spark, sf_dir):
    """r12 (r11-VERDICT item 2): the LSH-shortlisted production face
    must recover the exact face's mined pairs at an AGGREGATE floor
    (the banded-LSH dedup test discipline -- never per-pair: the
    shortlist is probabilistic per pair by design). Multiprobe
    coverage of the exact-best target measured 98% at both test
    scales; pair-identity recall measured 0.90/0.96 -- the floor sits
    at 0.75 to absorb corpus variation without masking a coverage
    regression (single-probe measured 0.52-0.63)."""
    exact = {(r.src_doc_id, r.tgt_doc_id)
             for r in similarity.bitext_margin_pairs(spark, sf_dir)
             .collect()}
    mined = {(r.src_doc_id, r.tgt_doc_id)
             for r in similarity.bitext_margin_mined(spark, sf_dir)
             .collect()}
    assert exact, "exact face emitted nothing -- corpus degenerate"
    recall = len(exact & mined) / len(exact)
    assert recall >= 0.75, (
        f"mined face recovered only {recall:.2f} of the exact face's "
        f"{len(exact)} pairs"
    )
    # the mined output keeps the exact face's contract: one pair per
    # source, margin above tau
    srcs = [r.src_doc_id for r in
            similarity.bitext_margin_mined(spark, sf_dir).collect()]
    assert len(srcs) == len(set(srcs))


def test_cosine_hoisted_bit_identical_to_cosine(spark):
    """r12 norm-hoist: cosine_hoisted over per-row self_norm columns
    must be BIT-identical (not approximately equal) to cosine() on
    every pair -- the hoist moves the two self-norm folds below the
    pair join but keeps the exact IEEE op sequence, so any ulp
    difference would shift rounded scores and rank tie-breaks."""
    import random

    rng = random.Random(7)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(64)] for _ in range(20)
    ] + [[1e-9] * 64, [0.999999] * 64, [-0.5] * 64]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    a = df.select(F.col("id").alias("qid"), F.col("v").alias("qv"))
    b = df.select(F.col("id").alias("nid"), F.col("v").alias("cv"))
    plain = a.crossJoin(b).select(
        "qid", "nid",
        similarity.cosine(F.col("qv"), F.col("cv")).alias("c"),
    )
    hoisted = (
        a.withColumn("_qn", similarity.self_norm(F.col("qv")))
        .crossJoin(b.withColumn("_cn", similarity.self_norm(F.col("cv"))))
        .select(
            "qid", "nid",
            similarity.cosine_hoisted(
                F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
            ).alias("c"),
        )
    )
    lhs = {(r.qid, r.nid): r.c for r in plain.collect()}
    rhs = {(r.qid, r.nid): r.c for r in hoisted.collect()}
    assert lhs == rhs  # exact float equality, every pair
