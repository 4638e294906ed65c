"""Sink semantics: idempotent content-addressed writes, upsert
convergence, bucket partitioning, and bucket-pruned point lookup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark import sinks


def _chunks(spark, n=50, salt=""):
    return spark.range(n).select(
        F.concat(F.lit("id_"), F.col("id")).alias("id"),
        F.concat(F.lit(f"chunk text {salt}"), F.col("id")).alias("chunk"),
    )


def test_write_is_idempotent_and_bucketed(spark, tmp_path):
    path = str(tmp_path / "chunks")
    df = _chunks(spark)
    sinks.write_table(df.unionByName(df), path)  # duplicated input
    back = sinks.read_table(spark, path)
    assert back.count() == 50  # dedup-by-id
    assert set(back.columns) == {"id", "chunk", "bucket"}
    # partition dirs on disk
    dirs = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert 1 < len(dirs) <= sinks.DEFAULT_BUCKETS


def test_upsert_new_rows_win(spark, tmp_path):
    path = str(tmp_path / "chunks")
    sinks.write_table(_chunks(spark, salt="old"), path)
    newer = _chunks(spark, n=10, salt="new").unionByName(
        spark.createDataFrame([("id_99", "brand new")], "id string, chunk string")
    )
    sinks.upsert_table(spark, newer, path)
    back = {r.id: r.chunk for r in sinks.read_table(spark, path).collect()}
    assert len(back) == 51  # 50 old ids (10 replaced) + 1 new id
    assert back["id_3"] == "chunk text new3"     # replaced
    assert back["id_30"] == "chunk text old30"   # untouched
    assert back["id_99"] == "brand new"


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    path = str(tmp_path / "chunks")
    sinks.write_table(_chunks(spark), path)
    row = sinks.point_lookup(spark, path, "id_7").collect()
    assert [r.chunk for r in row] == ["chunk text 7"]
    plan = sinks.point_lookup(spark, path, "id_7")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Catalog bucketing: two tables bucketed identically on the join
    key must sort-merge join with ZERO shuffle exchanges."""
    import contextlib
    import io

    left = _chunks(spark, 60)
    right = _chunks(spark, 60).withColumnRenamed("chunk", "other")
    sinks.write_bucketed_table(left, "bk_left", n_buckets=4, sort_col="id")
    sinks.write_bucketed_table(right, "bk_right", n_buckets=4, sort_col="id")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 60
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_upsert_cleans_staging_and_raises_on_corrupt_target(spark, tmp_path):
    """A transient/corrupt read of the target must NOT silently
    overwrite it with only the new rows; staging dirs must not leak."""
    import os

    path = str(tmp_path / "t")
    df = spark.createDataFrame([("a", 1)], "id string, v int")
    sinks.upsert_table(spark, df, path)
    sinks.upsert_table(spark, spark.createDataFrame([("b", 2)], "id string, v int"), path)
    assert not os.path.exists(path.rstrip("/") + "__staging")
    assert sinks.read_table(spark, path).count() == 2
    # corrupt target: unreadable parquet footer -> must raise, not clobber
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    import pytest as _pytest

    with _pytest.raises(Exception):
        sinks.upsert_table(spark, df, bad)
    # the garbage file is still there -- nothing was clobbered
    assert os.path.exists(os.path.join(bad, "part-00000.parquet"))


def test_streaming_upsert_sink_converges(spark, tmp_path):
    """Continuous ingest through foreachBatch + upsert_table: replayed
    (duplicate) documents converge to one row per content id, and a
    second delivery batch with overlapping ids replaces in place."""
    src = str(tmp_path / "incoming")
    target = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _chunks(spark, n=20, salt="v1").write.mode("append").json(src)
    stream = (
        spark.readStream.schema("id string, chunk string").json(src)
    )
    q = sinks.streaming_upsert_sink(stream, target, ckpt)
    q.awaitTermination(120)
    back = {r.id: r.chunk for r in sinks.read_table(spark, target).collect()}
    assert len(back) == 20
    assert back["id_3"] == "chunk text v13"

    # second delivery: 5 overlapping ids updated + 5 fresh ids; the
    # checkpoint ensures already-processed files are not re-merged
    _chunks(spark, n=25, salt="v2").filter(
        F.col("id").isin(*[f"id_{i}" for i in range(15, 25)])
    ).write.mode("append").json(src)
    q2 = sinks.streaming_upsert_sink(
        spark.readStream.schema("id string, chunk string").json(src),
        target, ckpt,
    )
    q2.awaitTermination(120)
    back = {r.id: r.chunk for r in sinks.read_table(spark, target).collect()}
    assert len(back) == 25  # 20 originals + 5 fresh (20..24)
    assert back["id_3"] == "chunk text v13"      # untouched
    assert back["id_15"] == "chunk text v215"    # replaced by v2
    assert back["id_22"] == "chunk text v222"    # fresh insert


def test_compact_table_keeps_max_version_deterministically(spark, tmp_path):
    """Append-mode writes can leave conflicting rows per id; compaction
    must keep the max-version row (never dropDuplicates' arbitrary
    partition-order pick), and re-running must be byte-stable."""
    path = str(tmp_path / "tbl")
    rows = [("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"),
            ("b", 1, "only")]
    df = spark.createDataFrame(rows, "id string, version int, payload string")
    sinks.write_table(df.filter("version = 1"), path, "id")
    # raw appends bypass upsert's dedup, leaving 3 rows for id 'a'
    for v in (3, 2):
        d = df.filter(F.col("version") == v)
        d.withColumn(
            "bucket", F.pmod(F.xxhash64("id"), F.lit(sinks.DEFAULT_BUCKETS))
        ).write.partitionBy("bucket").mode("append").parquet(path)
    for _ in range(2):  # idempotent under re-runs
        sinks.compact_table(spark, path, "id", version_col="version")
        got = {r.id: (r.version, r.payload)
               for r in sinks.read_table(spark, path).collect()}
        assert got == {"a": (3, "new"), "b": (1, "only")}


def test_versioned_table_snapshot_isolation_and_time_travel(spark, tmp_path):
    """versioned_write commits immutable snapshots via atomic marker
    creation: latest read sees the newest COMMITTED version, time
    travel reads any prior one, an orphan data directory without a
    marker (a crashed write) is invisible, and re-committing a taken
    version number raises instead of clobbering history."""
    from selfhosted_rag_doc_chat_prototype_spark.sinks import (
        versioned_read,
        versioned_versions,
        versioned_write,
    )

    base = str(tmp_path / "vt")
    df1 = _chunks(spark, 10, salt="a")
    df2 = _chunks(spark, 15, salt="b")
    assert versioned_write(df1, base) == 1
    assert versioned_write(df2, base) == 2
    assert versioned_versions(spark, base) == [1, 2]
    assert versioned_read(spark, base).count() == 15
    assert versioned_read(spark, base, 1).count() == 10
    # snapshot immutability: v1 content is byte-stable after v2
    got1 = {tuple(r) for r in versioned_read(spark, base, 1).collect()}
    assert got1 == {tuple(r) for r in df1.collect()}

    # crashed write: data dir exists, marker does not -> invisible
    _chunks(spark, 99, salt="c").write.parquet(f"{base}/v=3")
    assert versioned_versions(spark, base) == [1, 2]
    assert versioned_read(spark, base).count() == 15
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        versioned_read(spark, base, 3)

    # the next commit legally RECLAIMS the orphaned number (the
    # crashed write was never visible, so overwriting it is safe)
    assert versioned_write(_chunks(spark, 5, salt="d"), base) == 3
    assert versioned_versions(spark, base) == [1, 2, 3]
    assert versioned_read(spark, base).count() == 5
    assert versioned_read(spark, base, 3).count() == 5


def test_recover_replace_dir_heals_crash_window(spark, tmp_path):
    """The _replace_dir delete->rename crash window (ADVICE r7): a
    process dying between the delete and the rename leaves the target
    missing and a complete staging dir orphaned. recover_replace_dir
    must finish the rename (missing target + job-committed staging),
    refuse half-written staging (no _SUCCESS), and never touch an
    existing target."""
    path = str(tmp_path / "state")
    staging = path + "__staging"
    df = _chunks(spark, 20)

    # incomplete staging (no _SUCCESS) + missing target -> first write
    df.write.parquet(staging)
    os.remove(os.path.join(staging, "_SUCCESS"))
    assert sinks.recover_replace_dir(spark, staging, path) is False
    assert not os.path.exists(path)

    # complete staging + missing target -> heal: rename into place
    sinks._delete_dir(spark, staging)
    df.write.parquet(staging)
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))
    assert sinks.recover_replace_dir(spark, staging, path) is True
    assert not os.path.exists(staging)
    assert spark.read.parquet(path).count() == 20

    # existing target -> untouched even with a fresh staging orphan
    _chunks(spark, 5, salt="x").write.parquet(staging)
    assert sinks.recover_replace_dir(spark, staging, path) is False
    assert spark.read.parquet(path).count() == 20


def test_versioned_write_skips_reserved_slots_and_hides_staging(
        spark, tmp_path):
    """Concurrent-writer safety (ADVICE r7): a slot another writer has
    locked is never reused -- the next commit takes the next free
    number (the burned number stays unreadable forever) -- and
    in-flight writer-private staging under _staging/ is invisible to
    readers."""
    import pytest

    from selfhosted_rag_doc_chat_prototype_spark.sinks import (
        versioned_read,
        versioned_versions,
        versioned_write,
    )

    base = str(tmp_path / "vt")
    assert versioned_write(_chunks(spark, 10, salt="a"), base) == 1

    # a rival writer holds the lock for slot 2 (crashed or mid-write)
    open(os.path.join(base, "_versions", "2.lock"), "w").close()
    assert versioned_write(_chunks(spark, 7, salt="b"), base) == 3

    # an in-flight private staging dir is not a version
    _chunks(spark, 99, salt="c").write.parquet(
        os.path.join(base, "_staging", "deadbeef"))

    assert versioned_versions(spark, base) == [1, 3]
    assert versioned_read(spark, base).count() == 7
    with pytest.raises(FileNotFoundError):
        versioned_read(spark, base, 2)
