"""Rounding-contract property sweep (docs/ROUNDING.md).

Every emitted ``round(x, n)`` column whose pre-image the two engines
compute INDEPENDENTLY in float64 is exposed to a decimal-boundary flip:
a one-ulp representation difference (numpy BLAS vs DuckDB expression
arithmetic) lands the two values on opposite sides of an exact
``...5`` boundary and the rounded outputs diverge. The round-4 MMR
score was the structural case (``0.5 * a 4-decimal rel`` sits EXACTLY
on a 5th-decimal half-boundary for ~half of rank-1 rows); this sweep
scatters fresh random corpora (the null-robustness pattern, seeded
from the per-run tmp path so persisted-matview content keys never
alias) across the score-emitting query families and asserts full
oracle parity on every one.

The MMR case gets the most seeds -- the round-4 verdict's acceptance
bar was ~20 consecutive green runs on fresh corpora; 20 seeds of this
test ARE those runs, executed in one pytest session.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

MMR_SEEDS = list(range(20))
SCORE_SEEDS = list(range(4))

# score-emitting vector queries: cos_sim / fused / jaccard columns
# whose pre-images are engine-computed floats
VECTOR_SCORE_QUERIES = [
    "anns_bruteforce_topk",
    "hybrid_fusion_topk",
    "rag_retrieve_citations",
    "rag_rerank_lexical",
    "dedup_embedding_cosine",
    # rule-1 implementations: exact-integer k-means and the
    # unrounded-but-bit-exact sequential-fold JL projection -- the
    # scatter keeps the "no rounding needed" claim honest
    "embed_kmeans",
    "embed_random_projection",
    "anns_hard_negatives",
    # r12: int8-SQ shortlist key (exact-int codes x two scales -- the
    # pre-image is bit-identical by construction; the scatter keeps
    # that claim honest) and the LSH range face's round-then-compare
    # threshold (a boundary flip would move a pair across tau)
    "anns_sq_topk",
    "anns_range_search_lsh",
]


def _build_corpus(tmp_path_factory, seed: int) -> str:
    """Fresh (documents, embeddings) corpus, content unique per
    (tmp path, seed): unit-norm vectors plus word-salad docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp(f"round_contract_{seed}"))
    rng = np.random.default_rng(zlib.crc32(d.encode()) ^ (seed * 2654435761))
    n = 40
    vecs = [
        list(map(float, v / np.linalg.norm(v)))
        for v in rng.standard_normal((n, 64))
    ]
    words = ["alpha", "beta", "gamma", "delta", "kilo", "mega", "row",
             "scan", "join", "sort", "disk", "page", "cache", "lock"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(6, 14)))
        + f" uniq{seed}_{i}"
        for i in range(n)
    ]
    pq.write_table(pa.table({
        "vec_id": list(range(n)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": [i % 5 for i in range(n)],
    }), f"{d}/embeddings.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(n)),
        "text": texts,
        "lang": ["en"] * n,
        "source": [f"s{i % 3}" for i in range(n)],
        "n_chars": [len(t) for t in texts],
    }), f"{d}/documents.parquet")
    return d


def _con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("seed", MMR_SEEDS)
def test_mmr_rounding_stable_across_corpora(seed, spark, tmp_path_factory):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    d = _build_corpus(tmp_path_factory, seed)
    con = _con(d)
    try:
        sdf = e.queries()["rag_mmr_rerank"](spark, d)
        assert_matches_oracle(
            sdf, con, e.oracle_sql()["rag_mmr_rerank"],
            f"rag_mmr_rerank[seed={seed}]",
        )
    finally:
        con.close()


@pytest.mark.parametrize("seed", SCORE_SEEDS)
@pytest.mark.parametrize("name", VECTOR_SCORE_QUERIES)
def test_score_queries_rounding_stable(name, seed, spark, tmp_path_factory):
    import __spark_entry__ as e

    from .helpers import assert_matches_oracle

    d = _build_corpus(tmp_path_factory, seed * 101 + 7)
    con = _con(d)
    try:
        sdf = e.queries()[name](spark, d)
        assert_matches_oracle(
            sdf, con, e.oracle_sql()[name], f"{name}[seed={seed}]"
        )
    finally:
        con.close()
