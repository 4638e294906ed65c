"""Skew diagnostics + compaction maintenance semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark import sinks
from selfhosted_rag_doc_chat_prototype_spark.plans.diagnostics import (
    salted_key,
    skew_report,
)


def test_skew_report_flags_hot_key(spark):
    """A key owning half the table must surface first with a salt
    factor near n_partitions/2; uniform keys suggest no salting."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hot = spark.range(5000).select(F.lit("viral").alias("k"), F.col("id"))
    cold = spark.range(5000).select(
        F.concat(F.lit("u"), (F.col("id") % 500).cast("string")).alias("k"),
        F.col("id"),
    )
    rep = skew_report(hot.unionByName(cold), ["k"], top_n=5).collect()
    assert rep[0].k == "viral"
    assert abs(rep[0].row_share - 0.5) < 1e-6
    assert rep[0].suggested_salt == n_part // 2
    assert all(r.suggested_salt == 1 for r in rep[1:])


def test_salted_key_levels_hot_key(spark):
    """Salting the hot key spreads it over n_salts distinct grouping
    keys while two-phase aggregation preserves the true counts."""
    hot = spark.range(4000).select(F.lit("viral").alias("k"), F.col("id"))
    salted = hot.select(salted_key("k", 8, seed_col="id").alias("ks"))
    phase1 = salted.groupBy("ks").count()
    assert phase1.count() == 8
    phase2 = (
        phase1.withColumn("k", F.split("ks", "#")[0])
        .groupBy("k").agg(F.sum("count").alias("n"))
        .collect()
    )
    assert phase2[0].n == 4000

    import pytest
    with pytest.raises(ValueError):
        salted_key("k", 8)


def _files_per_bucket(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("bucket="):
            out[d] = len([f for f in os.listdir(os.path.join(path, d))
                          if f.endswith(".parquet")])
    return out


def test_compact_table_collapses_small_files(spark, tmp_path):
    """Three append-ish upserts leave multiple files per bucket;
    compaction collapses each bucket to one file with identical
    contents."""
    path = str(tmp_path / "chunks")

    def batch(n0, n1, salt):
        return spark.range(n0, n1).select(
            F.concat(F.lit("id_"), F.col("id")).alias("id"),
            F.concat(F.lit(f"chunk {salt} "), F.col("id")).alias("chunk"),
        )

    sinks.write_table(batch(0, 40, "a"), path)
    sinks.write_table(batch(40, 70, "b"), path, mode="append")
    sinks.write_table(batch(70, 100, "c"), path, mode="append")
    before = {r.id: r.chunk for r in sinks.read_table(spark, path).collect()}
    assert len(before) == 100
    assert max(_files_per_bucket(path).values()) > 1  # genuinely fragmented

    sinks.compact_table(spark, path)
    after = {r.id: r.chunk for r in sinks.read_table(spark, path).collect()}
    assert after == before
    assert all(n == 1 for n in _files_per_bucket(path).values())
    assert not os.path.exists(path + "__compact")
