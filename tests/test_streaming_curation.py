"""Streaming curation: stream output equals the equivalent batch
composition, dedup state stays watermark-bounded, decontamination drops
benchmark-overlapping docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
from selfhosted_rag_doc_chat_prototype_spark.streaming import curation


@pytest.fixture(scope="module")
def doc_stream_dir(spark, sf_dir, tmp_path_factory):
    """documents + planted exact duplicates as a timestamped parquet
    stream source (two files = two micro-batches under availableNow)."""
    d = str(tmp_path_factory.mktemp("docstream"))
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")).alias("ingest_ts"),
    )
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.mode("append").parquet(d)
    # second batch: the rest, plus exact re-deliveries of 0..24 within
    # the watermark window (same text => same content hash)
    dups = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 800000).alias("doc_id"), "text",
        (F.col("ingest_ts") + F.expr("INTERVAL 1 MINUTE")).alias("ingest_ts"),
    )
    docs.filter(F.col("doc_id") >= 250).unionByName(dups).coalesce(1)\
        .write.mode("append").parquet(d)
    return d


def _bench_grams(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        BENCH_MOD,
        doc_grams,
    )

    docs = table(spark, sf_dir, "documents")
    return doc_grams(
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    ).select(F.col("gram"))


def test_stream_curation_equals_batch(spark, sf_dir, doc_stream_dir, tmp_path):
    bench = _bench_grams(spark, sf_dir)

    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(doc_stream_dir)
    out = str(tmp_path / "curated")
    q = (
        curation.streaming_curation_plan(stream, bench)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)

    # batch twin over the SAME input (stream dir), composed explicitly
    # (no watermark operator in batch mode):
    batch_docs = spark.read.parquet(doc_stream_dir)
    gated = curation.quality_gate(batch_docs)
    w = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit(""))
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import DECON_K

    grams = F.when(
        F.size(w) >= DECON_K,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (DECON_K - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, DECON_K)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bench_set = bench.distinct().agg(F.collect_set("gram").alias("bench_grams"))
    expected = (
        gated.dropDuplicates(["content_md5"])
        .crossJoin(F.broadcast(bench_set))
        .filter(F.size(F.array_intersect(grams, F.col("bench_grams"))) == 0)
        .select("doc_id", "tok", "content_md5")
    )

    # re-delivered duplicates admitted once (content identity), order-free
    got_hashes = {r.content_md5 for r in got.collect()}
    exp_hashes = {r.content_md5 for r in expected.collect()}
    assert got_hashes == exp_hashes
    assert got.count() == len(got_hashes)  # exactly one row per content

    # decontamination really fired: benchmark-sourced docs are absent
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import BENCH_MOD

    contaminated = {r.doc_id for r in got.collect()
                    if r.doc_id % BENCH_MOD == 0 and r.doc_id < 800000}
    assert contaminated == set()


def test_stream_curation_with_intradoc_clean(spark, sf_dir, doc_stream_dir,
                                             tmp_path):
    """With the stateless intradoc cleaner in front, the stream's
    surviving content hashes equal the batch composition's (clean ->
    gate -> content dedup), and every hash is the hash of a CLEANED
    text (planted trailing repetition collapses before hashing)."""
    bench = _bench_grams(spark, sf_dir)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(doc_stream_dir)
    out = str(tmp_path / "curated_clean")
    q = (
        curation.streaming_curation_plan(stream, bench, clean_intradoc=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_clean"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)

    batch_docs = curation.intradoc_clean(spark.read.parquet(doc_stream_dir))
    gated = curation.quality_gate(batch_docs)
    expected = gated.dropDuplicates(["content_md5"])

    got_hashes = {r.content_md5 for r in got.collect()}
    exp_hashes = {r.content_md5 for r in expected.collect()}
    # stream output is the batch set minus contamination -- subset with
    # equality on the clean side
    assert got_hashes <= exp_hashes
    cleaned_md5 = {
        r.m for r in batch_docs.select(F.md5("text").alias("m")).collect()
    }
    assert got_hashes <= cleaned_md5  # hashes are of CLEANED text


def test_stream_curation_anti_join_fallback(spark, sf_dir, doc_stream_dir,
                                            tmp_path):
    """r8 size guard: forcing ``bench_gram_count`` past
    BENCH_GRAMS_BROADCAST_MAX switches decontamination from the
    collect_set broadcast row to the stream-static LEFT ANTI join --
    same surviving content set, and the executed streaming plan
    carries a join instead of the single-row cross join."""
    bench = _bench_grams(spark, sf_dir)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(doc_stream_dir)

    plan = curation.streaming_curation_plan(
        stream, bench,
        bench_gram_count=curation.BENCH_GRAMS_BROADCAST_MAX + 1,
    )
    out = str(tmp_path / "curated_anti")
    q = (
        plan.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_anti"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_anti = {r.content_md5 for r in spark.read.parquet(out).collect()}

    # broadcast-set face over the same input (the default tier)
    out2 = str(tmp_path / "curated_bset")
    q2 = (
        curation.streaming_curation_plan(stream, bench)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ckpt_bset"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got_bset = {r.content_md5 for r in spark.read.parquet(out2).collect()}

    assert got_anti == got_bset and got_anti
    # shape really switched: anti-join tier has no collect_set aggregate
    anti_plan = plan._jdf.queryExecution().analyzed().toString()
    assert "collect_set" not in anti_plan
    assert "LeftAnti" in anti_plan or "left_anti" in anti_plan
