"""Continuous vector-index maintenance: embeddings arrive as a stream
(the reference embeds and upserts points as documents land in staging,
``services/database.py`` batched upsert; SURVEY section 3.2) and each
micro-batch extends the PERSISTED retrieval indexes incrementally --
``lsh_append`` signs only the new batch with the frozen seeded planes,
``pq_append`` encodes it with the frozen codebooks and coarse
centroids. Nothing retrains and the archive is never re-processed.

Exactly-once effect on at-least-once delivery: both append paths are
IDEMPOTENT (already-indexed ids are anti-joined away), so a replayed
micro-batch after a failure converges instead of duplicating index
rows -- the same convergence contract as the chunk-store upsert sink.

Scale shape: per micro-batch cost is O(batch) encode work plus one
anti-join against the index's id column (at real scale a bloom/merge
on a sorted id index); state lives entirely in the persisted tables,
not in streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.pq import pq_append
from ..operators.similarity import lsh_append


def index_maintenance(
    spark: SparkSession,
    sf_dir: str,
    embedding_stream: DataFrame,
    checkpoint_dir: str,
    with_pq: bool = True,
):
    """Maintain the LSH (and optionally PQ) indexes of ``sf_dir`` from
    a stream of (vec_id, label, embedding) rows. Returns the started
    StreamingQuery."""

    def _extend(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lsh_append(spark, sf_dir, batch_df)
        if with_pq:
            pq_append(spark, sf_dir, batch_df)

    return (
        embedding_stream.writeStream
        .outputMode("update")
        .foreachBatch(_extend)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
