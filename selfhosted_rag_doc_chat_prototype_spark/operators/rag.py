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
from .similarity import cosine

N_QUERIES = 8
RETRIEVER_TOP_K = 4  # reference default (shared/defaults.py:88)


def rag_retrieve_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "source")

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("doc_id"), F.col("v").alias("cv"))

    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("doc_id")
    )
    topk = (
        F.broadcast(queries)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id", "doc_id", cosine(F.col("qv"), F.col("cv")).alias("cos_raw")
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= RETRIEVER_TOP_K)
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
        F.round("cos_raw", 4).alias("cos_sim"),
        F.concat(
            F.lit("[source"), F.row_number().over(w_src), F.lit("]("),
            F.col("source"), F.lit("#doc"), F.col("doc_id"), F.lit(")"),
        ).alias("citation"),
    )


QUERIES = {"rag_retrieve_citations": rag_retrieve_citations}

ORACLE = {
    "rag_retrieve_citations": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        topk AS (
            SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
                   list_cosine_similarity(a.v, b.v) AS cos_raw,
                   CAST(row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                b.vec_id ASC) AS INTEGER) AS rank
            FROM e a JOIN e b
              ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
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
    """,
}
