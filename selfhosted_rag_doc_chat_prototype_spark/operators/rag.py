"""The RAG query lifecycle (SURVEY.md section 3.1) as ONE batch query:

    embed query -> top-k COSINE retrieval (J4, k=RETRIEVER_TOP_K=4,
    ``shared/defaults.py:88``) -> context dedup on content (T11,
    ``chat/chroma_chat.py:22-44``) -> [sourceN] renumbering + citation
    join back to the originating document (J6/T12,
    ``utils/chat_utils.py:24-78``).

The reference does this per-request against Qdrant; here the whole
query batch runs as one DataFrame plan. Generation (the LLM call) is
out of scope by design -- the engine ends at assembled, cited context.

Scale shape: the query side is tiny and broadcast; candidates never
shuffle for scoring. The only shuffles are the per-query top-k window
(k rows per query) and the final (tiny) dedup/renumber windows, which
operate on Q*k rows, not N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table
from . import similarity as _sim

N_QUERIES = 8
RETRIEVER_TOP_K = 4  # reference default (shared/defaults.py:88)


def rag_retrieve_citations(spark: SparkSession, sf_dir: str,
                           dense_strategy: str = "lsh") -> DataFrame:
    """The flagship retrieval: the dense top-k is a RETRIEVAL through
    :func:`similarity.topk_cosine` (the cost-gated ANN planner) served
    from the persisted signature index, not an unconditional exact
    corpus scan. ``dense_strategy`` pins ``"lsh"`` for the same reason
    :func:`similarity.hybrid_fusion_topk` does: the registered query
    needs ONE deterministic plan for its DuckDB oracle twin, and at
    the gate's sf sizes ``auto`` would (correctly) price the exact
    scan cheaper, leaving the 100-TB plan shape untested. Programmatic
    callers with unknown corpus size pass ``"auto"``."""
    from .similarity import lsh_build, topk_cosine

    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "source")

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    topk = topk_cosine(
        emb, queries, k=RETRIEVER_TOP_K, strategy=dense_strategy,
        cand_signed=lambda: lsh_build(spark, sf_dir),
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank", "cos_sim"
    )

    # T11: dedup retrieved context on exact content, best-ranked wins
    with_text = topk.join(F.broadcast(docs), "doc_id")
    w_dedup = Window.partitionBy("query_id", "text").orderBy(F.asc("rank"))
    deduped = with_text.withColumn(
        "dup_rn", F.row_number().over(w_dedup)
    ).filter(F.col("dup_rn") == 1)

    # T12: renumber surviving contexts as [source1..n] and render links
    w_src = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return deduped.select(
        "query_id",
        F.row_number().over(w_src).alias("source_n"),
        "doc_id",
        "cos_sim",
        F.concat(
            F.lit("[source"), F.row_number().over(w_src), F.lit("]("),
            F.col("source"), F.lit("#doc"), F.col("doc_id"), F.lit(")"),
        ).alias("citation"),
    )


# ---- re-ranking stage (SURVEY section 3.1 extension) ---------------------
#
# The reference returns first-stage retrieval order directly
# (services/database.py:271-272); production RAG inserts a re-rank
# stage between retrieval and context assembly. Two batch re-rankers:
#
# - rag_rerank_lexical: cross-encoder-SHAPED reranker -- first-stage
#   BM25 prefetch, then a pairwise (query, doc) scorer over the
#   prefetch list only. The default scorer is deterministic token-set
#   Jaccard overlap (pure codegen, full DuckDB oracle); a real neural
#   cross-encoder plugs in through the same pairs->scores boundary as
#   an Arrow-batched pandas scorer (crossencoder_score_pairs, the
#   stub-model pattern used by operators/embedding.py).
# - rag_mmr_rerank: Maximal Marginal Relevance (Carbonell & Goldstein,
#   SIGIR 1998) -- greedy diversity selection over the dense prefetch.
#   Sequential per query but the state is ONE prefetch list (<=30
#   rows), so it runs as applyInPandas keyed by query: embarrassingly
#   parallel across queries, bounded memory per group.

RERANK_PREFETCH = 50
RERANK_K = 10
MMR_PREFETCH = 30
MMR_K = 10
MMR_LAMBDA = 0.5


def _doc_tokens(docs: DataFrame) -> DataFrame:
    toks = F.array_distinct(
        F.filter(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+"), lambda x: x != F.lit(""))
    )
    return docs.select("doc_id", toks.alias("toks"))


def rag_rerank_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 prefetch (shared inverted-index subtree, capped at
    RERANK_PREFETCH per query) re-ranked by token-set Jaccard between
    the query document and each candidate -- the cross-encoder slot
    with its deterministic default scorer. Scale shape: the scorer
    touches only Q*prefetch pairs; token arrays join in broadcast
    (query side) and the final ordering is a window over Q*prefetch
    rows."""
    from .sparse import bm25_scores

    ws = Window.partitionBy("query_id").orderBy(
        F.desc("sparse"), F.asc("neighbor_id")
    )
    pref = (
        bm25_scores(spark, sf_dir, N_QUERIES)
        .withColumn("sr", F.row_number().over(ws))
        .filter(F.col("sr") <= RERANK_PREFETCH)
        .select("query_id", "neighbor_id", "sparse")
    )
    toks = _doc_tokens(table(spark, sf_dir, "documents"))
    qt = toks.select(F.col("doc_id").alias("query_id"),
                     F.col("toks").alias("q_toks"))
    dt = toks.select(F.col("doc_id").alias("neighbor_id"),
                     F.col("toks").alias("d_toks"))
    jac = F.round(
        F.size(F.array_intersect("q_toks", "d_toks"))
        / F.size(F.array_union("q_toks", "d_toks")),
        6,
    )
    scored = (
        pref.join(F.broadcast(qt), "query_id")
        .join(dt, "neighbor_id")
        .select("query_id", "neighbor_id", "sparse", jac.alias("jac"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("jac"), F.desc("sparse"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w))
        .filter(F.col("rerank") <= RERANK_K)
        .select("query_id", "neighbor_id", "rerank",
                F.col("jac").alias("rerank_score"),
                F.col("sparse").alias("bm25_score"))
    )


def _stub_ce_score(a: str, b: str) -> float:
    """The default cross-encoder stub's scoring rule, deliberately
    SQL-expressible so the registered query has a FULL oracle: distinct
    ASCII-whitespace token overlap (Jaccard) plus a deterministic
    length-derived jitter (integer arithmetic, identical floats in
    Spark and DuckDB per docs/ROUNDING.md rule 4)."""
    import re

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    ta = {t for t in ws.split(a.strip()) if t}
    tb = {t for t in ws.split(b.strip()) if t}
    base = len(ta & tb) / max(len(ta | tb), 1)
    jitter = ((len(a) * 31 + len(b)) % 997) / 99700.0
    # emitted UNROUNDED: both engines derive the identical float from
    # identical integers (ROUNDING.md rule 4); a final round() would
    # only re-introduce a boundary (python half-even vs DuckDB
    # half-away on exact k/128-style dyadics)
    return base + jitter


def crossencoder_score_pairs(pairs: DataFrame, scorer=None) -> DataFrame:
    """The neural cross-encoder boundary: ``pairs`` carries
    (query_id, neighbor_id, q_text, d_text); ``scorer`` is a callable
    ``(q_text: pd.Series, d_text: pd.Series) -> pd.Series[double]``
    applied Arrow-batched. The default is the DETERMINISTIC STUB
    :func:`_stub_ce_score` standing in for the model forward pass --
    the real model (e.g. a sentence-transformers CrossEncoder) plugs
    in with no plan change, exactly like the embedding stub
    (operators/embedding.py)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    if scorer is None:
        def scorer(q: "pd.Series", d: "pd.Series") -> "pd.Series":
            return pd.Series(
                [_stub_ce_score(a or "", b or "") for a, b in zip(q, d)],
                dtype=float,
            )

    # wrap annotation-free: pandas_udf would otherwise try to parse the
    # plugged scorer's type hints
    score_udf = pandas_udf(lambda q, d: scorer(q, d), "double")
    return pairs.withColumn("ce_score", score_udf("q_text", "d_text"))


def rag_rerank_crossencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-encoder re-rank stage AS A REGISTERED QUERY: BM25
    prefetch (capped at RERANK_PREFETCH pairs per query), (q_text,
    d_text) pair assembly, Arrow-batched scoring through the
    :func:`crossencoder_score_pairs` model boundary (default stub),
    top-RERANK_K by score. This exercises the REAL serving plan --
    broadcast query texts, pair scoring on Q*prefetch rows only, a
    final tiny window -- with a full DuckDB oracle because the stub's
    rule is SQL-expressible; a neural model swaps in with no plan
    change (and would drop to rows-only checking, like the other
    pluggable boundaries)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("sparse"), F.asc("neighbor_id")
    )
    from .sparse import bm25_scores

    pref = (
        bm25_scores(spark, sf_dir, N_QUERIES)
        .withColumn("sr", F.row_number().over(ws))
        .filter(F.col("sr") <= RERANK_PREFETCH)
        .select("query_id", "neighbor_id")
    )
    qt = docs.select(F.col("doc_id").alias("query_id"),
                     F.col("text").alias("q_text"))
    dt = docs.select(F.col("doc_id").alias("neighbor_id"),
                     F.col("text").alias("d_text"))
    pairs = pref.join(F.broadcast(qt), "query_id").join(dt, "neighbor_id")
    scored = crossencoder_score_pairs(pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ce_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w))
        .filter(F.col("rerank") <= RERANK_K)
        .select("query_id", "neighbor_id", "rerank", "ce_score")
    )


def rag_mmr_rerank(spark: SparkSession, sf_dir: str,
                   lam: float = MMR_LAMBDA) -> DataFrame:
    """MMR diversity re-ranking of the dense prefetch: greedily pick
    argmax lam*sim(q,d) - (1-lam)*max_{s in S} sim(d,s) until MMR_K.
    Candidates come from the persisted-index LSH prefetch; the greedy
    loop runs in applyInPandas keyed by query_id over its <=MMR_PREFETCH
    candidate vectors (one numpy Gram matrix per group). Fully oracled:
    the sequential argmax IS SQL-expressible as a recursive CTE whose
    state row carries the chosen-id list (see :func:`_mmr_oracle_sql`);
    parity against a pure-python reference implementation is
    additionally asserted in tests.

    ROUNDING CONTRACT (docs/ROUNDING.md): every arithmetic step after
    the initial per-engine rounding runs in EXACT INTEGER MICRO-UNITS
    so no emitted value can sit on a decimal boundary two engines round
    differently. ``rel`` enters as the 4-decimal prefetch cosine
    (``rel_u = rint(rel * 1e4)``, exact -- rel is already rounded);
    the pairwise Gram term is half-even-rounded ONCE at 6 decimals
    (``sim_u = rint(sim * 1e6)``, mirrored by the oracle's
    ``round_even(sim * 1e6, 0)``); the score is the integer
    ``score_u = lam_u*rel_u*100 - (100-lam_u)*max(sim_u)`` in 1e-8
    units (``lam`` must be exact at 2 decimals). Selection ranks the
    INTEGER, and the emitted doubles divide the same integers by 1e4 /
    1e8 -- bit-identical across engines. The previous formulation
    (``round(lam*rel, 4)`` with lam=0.5 over a 4-decimal rel) put
    ~half of all rank-1 scores EXACTLY on a 5th-decimal half-boundary,
    where a one-ulp raw-dot difference (numpy BLAS vs DuckDB
    list_dot_product) flipped the rounded value."""
    import numpy as np
    import pandas as pd

    from .similarity import lsh_build, topk_cosine

    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pref = topk_cosine(
        emb, queries, k=MMR_PREFETCH, strategy="lsh",
        cand_signed=lsh_build(spark, sf_dir),
    ).select("query_id", "neighbor_id", F.col("cos_sim").alias("rel"))
    # the greedy kernel needs only (rel, cv): query-candidate
    # similarity is already in rel, so the query vectors never cross
    # the Arrow boundary
    cand = pref.join(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("v").alias("cv")), "neighbor_id"
    )

    out_schema = ("query_id long, neighbor_id long, mmr_rank int, "
                  "relevance double, mmr_score double")

    lam_u = int(round(lam * 100))
    if abs(lam * 100 - lam_u) > 1e-9:
        raise ValueError(
            f"lam must be exact at 2 decimals for the integer-unit "
            f"scoring contract (got {lam!r})"
        )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        C = np.stack(pdf["cv"].to_numpy())
        # rel is the prefetch's 4-decimal cosine: *1e4 recovers the
        # exact integer; the Gram term rounds half-even ONCE at 1e-6
        # (both mirrored in the oracle -- see the docstring contract)
        rel_u = np.rint(pdf["rel"].to_numpy() * 1e4).astype(np.int64)
        G_u = np.rint((C @ C.T) * 1e6).astype(np.int64)
        chosen: list[int] = []
        scores_u: list[int] = []
        avail = list(range(len(pdf)))
        while avail and len(chosen) < MMR_K:
            if chosen:
                div_u = G_u[np.ix_(avail, chosen)].max(axis=1)
            else:
                div_u = np.zeros(len(avail), dtype=np.int64)
            # integer score in 1e-8 units: lam_u(1e-2)*rel_u(1e-4)*100
            # and (100-lam_u)(1e-2)*div_u(1e-6) share the 1e-8 scale
            score_u = lam_u * rel_u[avail] * 100 - (100 - lam_u) * div_u
            # ties break on neighbor_id (rows are id-sorted, argmax
            # returns the first maximum)
            j = int(np.argmax(score_u))
            chosen.append(avail[j])
            scores_u.append(int(score_u[j]))
            avail.pop(j)
        return pd.DataFrame({
            "query_id": pdf["query_id"].iloc[chosen].to_numpy(),
            "neighbor_id": pdf["neighbor_id"].iloc[chosen].to_numpy(),
            "mmr_rank": np.arange(1, len(chosen) + 1, dtype="int32"),
            "relevance": rel_u[chosen] / 1e4,
            "mmr_score": np.asarray(scores_u, dtype=np.int64) / 1e8,
        })

    return cand.groupBy("query_id").applyInPandas(mmr, out_schema)


QUERIES = {
    "rag_retrieve_citations": rag_retrieve_citations,
    "rag_rerank_lexical": rag_rerank_lexical,
    "rag_rerank_crossencoder": rag_rerank_crossencoder,
    "rag_mmr_rerank": rag_mmr_rerank,
}

def _postings_sql() -> str:
    from .sparse import POSTINGS_SQL

    return POSTINGS_SQL


ORACLE = {
    "rag_rerank_lexical": f"""
        WITH {_postings_sql()},
        qterms AS (
            SELECT DISTINCT qt.query_id, v.idx
            FROM (
                SELECT q.doc_id AS query_id, u.term
                FROM (SELECT doc_id,
                             list_distinct(list_filter(
                                 string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                 x -> x <> '')) AS wq
                      FROM documents WHERE doc_id < {N_QUERIES}) q,
                     unnest(q.wq) AS u(term)
            ) qt JOIN vocab v ON qt.term = v.term
        ),
        bm AS (
            SELECT qt.query_id, p.doc_id AS neighbor_id,
                   round(sum(p.w), 6) AS sparse
            FROM post p JOIN qterms qt ON p.idx = qt.idx
            WHERE p.doc_id <> qt.query_id
            GROUP BY qt.query_id, p.doc_id
        ),
        pref AS (
            SELECT query_id, neighbor_id, sparse FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sparse DESC, neighbor_id ASC) AS sr
                FROM bm)
            WHERE sr <= {RERANK_PREFETCH}
        ),
        toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                       x -> x <> '')) AS toks
            FROM documents
        ),
        scored AS (
            SELECT p.query_id, p.neighbor_id, p.sparse,
                   round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                         / len(list_distinct(a.toks || b.toks)), 6) AS jac
            FROM pref p
            JOIN toks a ON a.doc_id = p.query_id
            JOIN toks b ON b.doc_id = p.neighbor_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY jac DESC, sparse DESC, neighbor_id ASC)
                   AS INTEGER) AS rerank,
               jac AS rerank_score, sparse AS bm25_score
        FROM scored
        QUALIFY rerank <= {RERANK_K}
    """,
    # dense top-k over the LSH candidate set (the rh_sig_sql twin,
    # proven by anns_lsh_bucketed's oracle), mirroring the pinned-lsh
    # serve path -- not an exact all-pairs scan
    "rag_retrieve_citations": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL
        ),
        _planes AS (SELECT {{planes}} AS h),
        sig AS ({{sig_body}}),
        cand AS (
            SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS doc_id
            FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
            WHERE a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
        ),
        topk AS (
            SELECT c.query_id, c.doc_id,
                   list_cosine_similarity(qa.v, qb.v) AS cos_raw,
                   CAST(row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY list_cosine_similarity(qa.v, qb.v) DESC,
                                c.doc_id ASC) AS INTEGER) AS rank
            FROM cand c
            JOIN e qa ON qa.vec_id = c.query_id
            JOIN e qb ON qb.vec_id = c.doc_id
            QUALIFY rank <= {RETRIEVER_TOP_K}
        ),
        deduped AS (
            SELECT t.*, d.text, d.source
            FROM topk t JOIN documents d ON t.doc_id = d.doc_id
            QUALIFY row_number() OVER (
                PARTITION BY t.query_id, d.text ORDER BY t.rank ASC) = 1
        )
        SELECT query_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY rank ASC) AS INTEGER)
                   AS source_n,
               doc_id,
               round(cos_raw, 4) AS cos_sim,
               '[source' || row_number() OVER (
                   PARTITION BY query_id ORDER BY rank ASC)
                   || '](' || source || '#doc' || doc_id || ')' AS citation
        FROM deduped
    """.format(
        planes=_sim.planes_sql_literal(
            _sim.hyperplanes(64, _sim.LSH_BITS, _sim.LSH_TABLES)),
        sig_body=_sim.rh_sig_sql(
            _sim.hyperplanes(64, _sim.LSH_BITS, _sim.LSH_TABLES),
            _sim.LSH_BITS, _sim.LSH_TABLES, "e", "vec_id"),
    ),
}


def _mmr_oracle_sql() -> str:
    """DuckDB twin of :func:`rag_mmr_rerank`'s greedy kernel as a
    recursive CTE: the state row per (query, iteration) carries the
    chosen-id list; each step picks argmax over the remaining prefetch
    candidates via a LATERAL top-1, exactly the python loop's selection
    rule. Scoring follows the INTEGER MICRO-UNIT contract the operator
    documents: ``rel_u = round(rel * 1e4)`` recovers the prefetch's
    exact 4-decimal cosine as an integer, the Gram term rounds
    half-even once at 1e-6 (``round_even(sim * 1e6, 0)`` == numpy
    rint), and the selection ranks the exact BIGINT
    ``lam_u*rel_u*100 - (100-lam_u)*max(sim_u)`` (1e-8 units) with
    ties to the smallest neighbor_id. Emitted doubles divide the same
    integers both engines hold, so no decimal boundary exists to
    disagree on. The prefetch CTE is the proven LSH-candidate twin at
    k = MMR_PREFETCH."""
    from .similarity import (LSH_BITS, LSH_TABLES, hyperplanes,
                             planes_sql_literal, rh_sig_sql)

    planes = hyperplanes(64, LSH_BITS, LSH_TABLES)
    lam_u = int(round(MMR_LAMBDA * 100))
    return f"""
        WITH RECURSIVE
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL),
        _planes AS (SELECT {planes_sql_literal(planes)} AS h),
        sig AS ({rh_sig_sql(planes, LSH_BITS, LSH_TABLES, "e", "vec_id")}),
        candp AS (
            SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
            FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
            WHERE a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
        ),
        pref AS (
            SELECT query_id, neighbor_id,
                   CAST(round(round(cos_raw, 4) * 10000) AS BIGINT) AS rel_u
            FROM (
                SELECT c.query_id, c.neighbor_id,
                       list_cosine_similarity(qa.v, qn.v) AS cos_raw,
                       row_number() OVER (PARTITION BY c.query_id
                           ORDER BY list_cosine_similarity(qa.v, qn.v) DESC,
                                    c.neighbor_id ASC) AS rn
                FROM candp c
                JOIN e qa ON qa.vec_id = c.query_id
                JOIN e qn ON qn.vec_id = c.neighbor_id
            ) WHERE rn <= {MMR_PREFETCH}
        ),
        psim AS (
            SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
                   CAST(round_even(list_dot_product(va.v, vb.v) * 1000000,
                                   0) AS BIGINT) AS sim_u
            FROM pref a JOIN pref b ON a.query_id = b.query_id
            JOIN e va ON va.vec_id = a.neighbor_id
            JOIN e vb ON vb.vec_id = b.neighbor_id
        ),
        sel AS (
            SELECT query_id, 1 AS mmr_rank, neighbor_id, rel_u,
                   {lam_u} * rel_u * 100 AS score_u, [neighbor_id] AS chosen
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY {lam_u} * rel_u * 100 DESC, neighbor_id ASC)
                      AS rn
                  FROM pref) WHERE rn = 1
            UNION ALL
            SELECT s.query_id, s.mmr_rank + 1, b.neighbor_id, b.rel_u,
                   b.score_u, list_append(s.chosen, b.neighbor_id)
            FROM sel s, LATERAL (
                SELECT neighbor_id, rel_u, score_u FROM (
                    SELECT c.neighbor_id, c.rel_u,
                           {lam_u} * c.rel_u * 100 - {100 - lam_u} * (
                               SELECT max(p.sim_u) FROM psim p
                               WHERE p.query_id = c.query_id
                                 AND p.a_id = c.neighbor_id
                                 AND list_contains(s.chosen, p.b_id))
                               AS score_u
                    FROM pref c
                    WHERE c.query_id = s.query_id
                      AND NOT list_contains(s.chosen, c.neighbor_id)
                )
                ORDER BY score_u DESC, neighbor_id ASC
                LIMIT 1
            ) b
            WHERE s.mmr_rank < {MMR_K}
        )
        SELECT query_id, neighbor_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
               rel_u / 10000.0 AS relevance,
               score_u / 100000000.0 AS mmr_score
        FROM sel
    """


ORACLE["rag_mmr_rerank"] = _mmr_oracle_sql()


def _crossencoder_oracle_sql() -> str:
    """Full twin of :func:`rag_rerank_crossencoder` under the default
    stub: the BM25 prefetch CTEs are the lexical reranker's proven
    twin; the score is the stub's exact rule -- distinct-token Jaccard
    plus the integer length jitter, emitted UNROUNDED because both
    engines compute the identical float from identical integers."""
    cls = "[ \\t\\n\\x0B\\f\\r]+"
    return f"""
        WITH {_postings_sql()},
        qterms AS (
            SELECT DISTINCT qt.query_id, v.idx
            FROM (
                SELECT q.doc_id AS query_id, u.term
                FROM (SELECT doc_id,
                             list_distinct(list_filter(
                                 string_split_regex(trim(text), '{cls}'),
                                 x -> x <> '')) AS wq
                      FROM documents WHERE doc_id < {N_QUERIES}) q,
                     unnest(q.wq) AS u(term)
            ) qt JOIN vocab v ON qt.term = v.term
        ),
        bm AS (
            SELECT qt.query_id, p.doc_id AS neighbor_id,
                   round(sum(p.w), 6) AS sparse
            FROM post p JOIN qterms qt ON p.idx = qt.idx
            WHERE p.doc_id <> qt.query_id
            GROUP BY qt.query_id, p.doc_id
        ),
        pref AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sparse DESC, neighbor_id ASC) AS sr
                FROM bm)
            WHERE sr <= {RERANK_PREFETCH}
        ),
        toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(
                       string_split_regex(trim(coalesce(text, '')),
                                          '{cls}'),
                       x -> x <> '')) AS toks,
                   length(coalesce(text, '')) AS ln
            FROM documents
        ),
        scored AS (
            SELECT p.query_id, p.neighbor_id,
                   CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                       / greatest(len(list_distinct(a.toks || b.toks)), 1)
                   + ((a.ln * 31 + b.ln) % 997) / 99700.0 AS ce_score
            FROM pref p
            JOIN toks a ON a.doc_id = p.query_id
            JOIN toks b ON b.doc_id = p.neighbor_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY ce_score DESC, neighbor_id ASC)
                   AS INTEGER) AS rerank,
               ce_score
        FROM scored
        QUALIFY rerank <= {RERANK_K}
    """


ORACLE["rag_rerank_crossencoder"] = _crossencoder_oracle_sql()
