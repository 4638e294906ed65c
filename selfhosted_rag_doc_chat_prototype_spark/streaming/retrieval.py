"""Streaming retrieval serve (SURVEY section 3.1's request loop as a
stream): the reference answers each chat request with a Qdrant top-k
query (``api/endpoints.py:32-65`` -> ``services/database.py:271-272``);
here query vectors ARRIVE AS A STREAM and every micro-batch retrieves
against the PERSISTED sign-LSH signature index -- the index is built
once as a batch job (``operators/similarity.lsh_build``) and the serve
path does no corpus-side work beyond the bucket equi-join probe.

Results land through the engine's idempotent content-addressed upsert
keyed by (query_id, rank), so micro-batch replays after a failure
CONVERGE instead of duplicating -- the exactly-once reply semantics the
reference gets from its ephemeral per-request reply keys
(``utils/ocr_utils.py:60-112``), delivered here by checkpoint + upsert.

Scale shape: per micro-batch work is O(batch_queries x N/2^bits per
table) -- the corpus-side index is a static table joined per batch
(Spark's stream-static join pattern, expressed through foreachBatch so
the per-query top-k window stays a bounded batch computation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import TOP_K, _vectors, lsh_build, topk_cosine


def retrieval_serve(
    spark: SparkSession,
    sf_dir: str,
    query_stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    k: int = TOP_K,
    exclude_self: bool = False,
):
    """Serve a stream of (query_id, qv) rows against ``sf_dir``'s
    persisted LSH index; top-k rows upsert into ``out_path`` keyed by
    (query_id, rank). Returns the started StreamingQuery.

    ``exclude_self`` defaults to False because streamed query ids
    normally live in an EXTERNAL id space (request sequence numbers):
    an accidental collision with a corpus vec_id must not silently
    drop that neighbor. Pass True only when the stream replays corpus
    vectors under their own ids (e.g. re-scoring the corpus against
    itself)."""
    from ..sinks import upsert_table

    idx = lsh_build(spark, sf_dir)
    corpus = _vectors(spark, sf_dir)

    def _serve(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = topk_cosine(
            corpus, batch_df, k=k, strategy="lsh", cand_signed=idx,
            exclude_self=exclude_self,
        )
        keyed = res.select(
            F.concat_ws("|", "query_id", "rank").alias("id"), "*"
        )
        upsert_table(batch_df.sparkSession, keyed, out_path, id_col="id")

    return (
        query_stream.writeStream
        .outputMode("update")
        .foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
