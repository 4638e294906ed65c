"""Embedding operator T9 (``utils/llm_setup.py:74-101``): micro-batched
text -> dense-vector transformation.

On a real cluster the executor-side model (sentence-transformers /
HTTP endpoint, batch size = ``EMBEDDING_BATCH_SIZE``) plugs into
``embed_map_in_pandas`` below -- the Arrow-batched ``mapInPandas``
operator whose batch shape mirrors the reference's micro-batching (O2).
The in-container default is a **deterministic hash-projection model**:
16 dims, dim j = sum over the doc's distinct words of
``2 * hexdigit_j(md5(word)) - 15``, L2-normalized. Integer vote sums
make Spark and the DuckDB oracle agree exactly (one float division at
the end). A real model is gated behind an import-try and swaps in
without plan changes.

Output is exploded to (doc_id, dim, val) scalar rows so the driver's
value-hash has no array-formatting ambiguity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sources.tables import rebalance, table

DIM = 16
_ALPHABET = "0123456789abcdef"


def embed_text_py(text: str) -> list[float]:
    """Reference implementation of the deterministic stub model."""
    votes = [0] * DIM
    seen = set()
    for tok in (text or "").split():
        if not tok or tok in seen:
            continue
        seen.add(tok)
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        for j in range(DIM):
            votes[j] += 2 * _ALPHABET.index(h[j]) - 15
    norm = float(np.sqrt(sum(v * v for v in votes)))
    if norm == 0.0:
        return [0.0] * DIM
    return [v / norm for v in votes]


EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def embed_map_in_pandas(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    batch_size: int = 25, model=None,
) -> DataFrame:
    """The production-shaped operator: Arrow batches in, micro-batched
    model calls inside (batch_size mirrors EMBEDDING_BATCH_SIZE), dense
    vectors out. ``model`` is any ``list[str] -> list[list[float]]``
    callable; defaults to the deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = model or (lambda texts: [embed_text_py(t) for t in texts])
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vecs: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vecs.extend(fn(texts[i : i + batch_size]))
            yield pd.DataFrame({"doc_id": pdf[id_col], "embedding": vecs})

    return df.select(id_col, text_col).mapInPandas(run, EMBED_SCHEMA)


def _votes_expr() -> str:
    """Pure-SQL (Spark dialect) equivalent of the stub model's integer
    vote vector, over distinct words in first-occurrence order."""
    words = "array_distinct(filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != ''))"
    return (
        f"transform(sequence(0, {DIM - 1}), j -> "
        f"aggregate(transform({words}, w -> md5(w)), 0, "
        f"(acc, h) -> acc + 2 * (instr('{_ALPHABET}', substring(h, j + 1, 1)) - 1) - 15))"
    )


def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked embedding build: whole-stage-codegen expression
    form of the stub model, exploded to (doc_id, dim, val)."""
    # the vote expression is the CPU; spread it across cores (the
    # corpus parquet is a single input split at test scale)
    docs = rebalance(table(spark, sf_dir, "documents"))
    vec = docs.selectExpr("doc_id", f"{_votes_expr()} AS votes")
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("votes"), lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        vec.withColumn("norm", norm)
        .selectExpr("doc_id", "norm", "posexplode(votes) AS (dim, vote)")
        .select(
            "doc_id",
            "dim",
            F.round(
                F.when(F.col("norm") == 0.0, 0.0).otherwise(
                    F.col("vote").cast("double") / F.col("norm")
                ),
                4,
            ).alias("val"),
        )
    )


# ---- int8 vector quantization ---------------------------------------------
# At 100 TB the embedding column IS the storage/IO bill of the ANN path
# (a 1024-dim float32 vector is 4 KB/doc); symmetric per-vector int8
# quantization cuts it 4x with bounded reconstruction error (half a
# quantization step per component) -- the standard scalar-quantized
# index layout (Qdrant/FAISS SQ8). Per-VECTOR scales keep the operator
# map-only: no global min/max pass, no shuffle, and a vector's code is
# independent of every other row (stable under re-ingest).

QUANT_BITS_MAX = 127.0


def quantize_int8(vectors: DataFrame, vec_col: str = "v") -> DataFrame:
    """(id, v: array<double>) -> (id, scale, qv: array<int>) with
    ``v_i ~= qv_i * scale``; zero vectors carry scale 0 and all-zero
    codes. Pure column expressions (codegen, map-only)."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = F.when(maxabs == 0.0, 0.0).otherwise(maxabs / F.lit(QUANT_BITS_MAX))
    return vectors.withColumn("scale", scale).select(
        *[c for c in vectors.columns if c != vec_col],
        F.round("scale", 9).alias("scale"),
        F.when(
            F.col("scale") == 0.0,
            F.transform(v, lambda x: F.lit(0)),
        )
        .otherwise(
            F.transform(v, lambda x: F.round(x / F.col("scale")).cast("int"))
        )
        .alias("qv"),
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return quantize_int8(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )


MAX_TOKENS = 256  # reference MAX_TOKENS default (shared/defaults.py:61)


def validate_token_budget(
    df: DataFrame, text_col: str = "text", max_tokens: int = MAX_TOKENS,
) -> tuple[DataFrame, DataFrame]:
    """F14: the embed-time safety re-check (consumer_utils.py:43-54)
    as a declarative split -- (within_budget, violations). The
    reference raises on violation with failure accounting; in a batch
    engine the violations side IS the failure accounting (count it,
    route it to a quarantine sink), and the clean side proceeds to the
    embed stage. Whitespace token count, matching the chunker's
    budget convention."""
    from ..functions.text_quality import n_tokens

    flagged = df.withColumn("_n_tokens", n_tokens(F.col(text_col)))
    ok = flagged.filter(F.col("_n_tokens") <= max_tokens).drop("_n_tokens")
    bad = flagged.filter(F.col("_n_tokens") > max_tokens)
    return ok, bad


QUERIES = {
    "embed_documents": embed_documents,
    "embedding_quantize_int8": embedding_quantize_int8,
}

ORACLE = {
    "embed_documents": f"""
        WITH t AS (
            SELECT doc_id,
                   list_transform(list_distinct(list_filter(
                       string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')),
                       w -> md5(w)) AS hs
            FROM documents
        ),
        v AS (
            SELECT doc_id,
                   list_transform(range(0, {DIM}), j ->
                       list_aggregate(list_transform(hs, h ->
                           2 * (strpos('{_ALPHABET}',
                                substr(h, CAST(j + 1 AS INTEGER), 1)) - 1) - 15),
                           'sum')) AS votes
            FROM t
        ),
        n AS (
            SELECT doc_id, votes,
                   sqrt(CAST(list_aggregate(list_transform(votes, x -> x * x),
                        'sum') AS DOUBLE)) AS nrm
            FROM v
        )
        SELECT doc_id,
               CAST(u.j AS INTEGER) AS dim,
               round(CASE WHEN nrm = 0.0 THEN 0.0
                          ELSE CAST(votes[CAST(u.j + 1 AS INTEGER)] AS DOUBLE) / nrm
                     END, 4) AS val
        FROM n, unnest(range(0, {DIM})) AS u(j)
    """,
    "embedding_quantize_int8": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        s AS (
            SELECT vec_id, v,
                   CASE WHEN list_aggregate(list_transform(v, x -> abs(x)),
                                            'max') = 0.0
                        THEN 0.0
                        ELSE list_aggregate(list_transform(v, x -> abs(x)),
                                            'max') / 127.0
                   END AS scale
            FROM e
        )
        SELECT vec_id,
               round(scale, 9) AS scale,
               CASE WHEN scale = 0.0
                    THEN list_transform(v, x -> 0)
                    ELSE list_transform(v, x -> CAST(round(x / scale) AS INTEGER))
               END AS qv
        FROM s
    """,
}
