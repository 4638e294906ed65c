"""Re-ranking stage contracts: the lexical (cross-encoder-shaped)
reranker matches its DuckDB oracle, the MMR greedy selection matches a
pure-python reference over the same prefetch, and the neural-scorer
boundary is deterministic and pluggable."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import rag
from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(rag.ORACLE))
def test_rag_matches_oracle(name, spark, sf_dir, con):
    sdf = rag.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, rag.ORACLE[name], name)


def _mmr_reference(pref_rows, vecs, lam, k):
    """Pure-python MMR over one query's prefetch list (id-sorted,
    first-argmax tie-break) under the operator's integer micro-unit
    scoring contract (rel at 1e-4, Gram term half-even at 1e-6,
    score ranked as the exact 1e-8-unit integer)."""
    lam_u = int(round(lam * 100))
    rows = sorted(pref_rows, key=lambda r: r[0])
    ids = [r[0] for r in rows]
    rel_u = np.rint(np.array([r[1] for r in rows]) * 1e4).astype(np.int64)
    C = np.stack([vecs[i] for i in ids])
    G_u = np.rint((C @ C.T) * 1e6).astype(np.int64)
    chosen, avail = [], list(range(len(ids)))
    while avail and len(chosen) < k:
        div_u = (G_u[np.ix_(avail, chosen)].max(axis=1)
                 if chosen else np.zeros(len(avail), dtype=np.int64))
        s = lam_u * rel_u[avail] * 100 - (100 - lam_u) * div_u
        j = int(np.argmax(s))
        chosen.append(avail[j])
        avail.pop(j)
    return [ids[i] for i in chosen]


def test_mmr_matches_python_reference(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (
        lsh_build,
        topk_cosine,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    vecs = {r.vec_id: np.asarray(r.v) for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < rag.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pref = topk_cosine(
        emb, queries, k=rag.MMR_PREFETCH, strategy="lsh",
        cand_signed=lsh_build(spark, sf_dir),
    ).collect()
    by_q: dict = {}
    for r in pref:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.cos_sim))

    got: dict = {}
    for r in rag.rag_mmr_rerank(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.mmr_rank, r.neighbor_id))
    assert set(got) == set(by_q)
    for q, rows in by_q.items():
        want = _mmr_reference(rows, vecs, rag.MMR_LAMBDA, rag.MMR_K)
        have = [nid for _, nid in sorted(got[q])]
        assert have == want, f"query {q}"


def test_mmr_first_pick_is_most_relevant(spark, sf_dir):
    out = rag.rag_mmr_rerank(spark, sf_dir).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        first = min(rows, key=lambda r: r.mmr_rank)
        top_rel = max(rows, key=lambda r: (r.relevance, -r.neighbor_id))
        assert first.relevance >= top_rel.relevance - 1e-9
        ranks = sorted(r.mmr_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_crossencoder_boundary_pluggable_and_deterministic(spark):
    import pandas as pd

    pairs = spark.createDataFrame(
        [(0, 1, "alpha beta gamma", "beta gamma delta"),
         (0, 2, "alpha beta gamma", "epsilon zeta")],
        "query_id long, neighbor_id long, q_text string, d_text string",
    )
    a = {(r.query_id, r.neighbor_id): r.ce_score
         for r in rag.crossencoder_score_pairs(pairs).collect()}
    b = {(r.query_id, r.neighbor_id): r.ce_score
         for r in rag.crossencoder_score_pairs(pairs).collect()}
    assert a == b
    # more token overlap must not score lower under the stub
    assert a[(0, 1)] > a[(0, 2)]

    def constant(q: "pd.Series", d: "pd.Series") -> "pd.Series":
        return pd.Series([2.5] * len(q))

    c = rag.crossencoder_score_pairs(pairs, scorer=constant).collect()
    assert all(r.ce_score == 2.5 for r in c)
