"""Sinks (SURVEY.md section 2.2): the reference's DuckDB ``INSERT OR
REPLACE`` + Parquet archival export (K2/K3, ``services/
parquet_service.py:152-200``) and batched vector upsert with
idempotent content-addressed ids (K1, ``utils/consumer_utils.py:
21-132``), re-expressed as Spark table writes.

Idempotency comes from the data model, not retry choreography: ids are
content-addressed (mmh3 of content, SURVEY 1.2), so ``INSERT OR
REPLACE`` == dedup-by-id before an atomic overwrite, and re-ingestion
converges to the same table. Spark's atomic job commit replaces the
reference's staging-WAL + sentinel finalize (O10).

Scale: writes are hash-bucketed on the content id (``pmod(xxhash64(id),
n_buckets)``), giving (a) bounded file counts independent of document
skew, (b) co-location of any given id for later joins/compaction, and
(c) partition-pruned point lookups by recomputing the bucket from the
id. ``n_buckets`` sizes to the target corpus (1024 at 100 TB keeps
partitions ~100 GB; local tests use 8).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def bucket_col(id_col: str = "id", n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket")


def write_table(
    df: DataFrame, path: str, id_col: str = "id",
    n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite",
) -> None:
    """K2/K3: dedup on the content-addressed id, bucket, write parquet.
    Re-running on the same (or re-ingested) data converges byte-wise:
    `INSERT OR REPLACE` semantics without a transaction log."""
    (
        df.dropDuplicates([id_col])
        .withColumn("bucket", bucket_col(id_col, n_buckets))
        .repartition(n_buckets, "bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def upsert_table(
    spark: SparkSession, df: DataFrame, path: str, id_col: str = "id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """K1-style upsert into an existing table: new rows win on id
    conflicts (the reference's INSERT OR REPLACE / deterministic-UUID5
    upsert). Implemented as (existing ANTI-JOIN new) UNION new, then a
    full bucketed overwrite -- the Parquet-only stand-in for a Delta
    MERGE; on a transactional table format the same statement is
    ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``.

    r10 latency shape: the merge is staged ONCE in final bucketed
    layout and swapped in with the two-metadata-op directory flip
    (:func:`_replace_dir`, crash window healed by
    :func:`recover_replace_dir` on the next call) -- one read + one
    write per upsert where the previous shape paid one read + two full
    writes + an extra staging read; measured ~2x off the serve-path
    micro-batch constant. On a transactional format the same
    statement is a partition-pruned MERGE that touches only the
    buckets the batch hashes into."""
    staging = path.rstrip("/") + "__staging"
    recover_replace_dir(spark, staging, path)
    try:
        existing = spark.read.parquet(path).drop("bucket")
    except AnalysisException as e:
        # ONLY a missing target means "first write": any other read
        # failure (corrupt footer, permissions) must propagate -- falling
        # through would overwrite the table with just the new rows
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        write_table(df, path, id_col, n_buckets)
        return
    merged = existing.join(
        df.select(F.col(id_col).alias("_new_id")).distinct(),
        existing[id_col] == F.col("_new_id"),
        "left_anti",
    ).unionByName(df)
    # stage the merge distributed (never through the driver) in the
    # FINAL bucketed layout: the read-before-overwrite hazard is broken
    # by the staging directory, exactly like the reference's .tmp ->
    # .md atomic rename (gatekeeper_logic.py:282-284)
    (
        merged.dropDuplicates([id_col])
        .withColumn("bucket", bucket_col(id_col, n_buckets))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    _replace_dir(spark, staging, path)


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Remove a staging directory through the Hadoop FS API (works for
    any configured filesystem, not just file://)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _replace_dir(spark: SparkSession, staging: str, path: str) -> None:
    """Flip a fully-written staging directory onto the target path via
    delete + rename -- two METADATA operations instead of a second full
    data rewrite.

    CRASH WINDOW (documented, parquet-directory stand-in): the two ops
    are not jointly atomic, so a crash between the delete and the
    rename leaves the target missing while the complete staging
    directory survives next to it; a crash before the delete leaves the
    pre-merge target untouched. In NEITHER case is a partial table ever
    readable at ``path`` (the failure mode of the rewrite this
    replaces, where a replayed micro-batch could merge against
    half-written state). On a transactional table format (Delta/
    Iceberg) the same flip is the manifest-pointer swap and the window
    disappears; recovery is AUTOMATIC -- every foreachBatch merge
    sink opens its state through :func:`recover_replace_dir`, which
    detects the missing-target/complete-staging signature on the next
    (replayed) micro-batch and renames the survivor into place BEFORE
    reading state, so replay merges against the full history instead
    of silently rebuilding from one batch. For a WINDOWLESS variant
    use the :func:`versioned_write` marker-commit primitive below
    (immutable snapshot dirs, atomic marker create, time travel
    included)."""
    jvm = spark._jvm
    src = jvm.org.apache.hadoop.fs.Path(staging)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"rename {staging} -> {path} failed")


def recover_replace_dir(spark: SparkSession, staging: str, path: str) -> bool:
    """Heal the :func:`_replace_dir` crash window before reading merge
    state: if the target is MISSING but a COMPLETE staging directory
    survives (job-committed, i.e. its ``_SUCCESS`` marker exists), the
    process died between the delete and the rename -- finish the
    rename now and return True. A missing target with no (or an
    incomplete, not-yet-committed) staging dir is a genuine first
    write and returns False; an existing target is never touched, so
    a crash BEFORE the delete (pre-merge state intact, staging
    orphaned) resolves by the replayed batch simply overwriting the
    orphan. Idempotent and safe to call on every micro-batch."""
    jvm = spark._jvm
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(dst):
        return False
    src = jvm.org.apache.hadoop.fs.Path(staging)
    marker = jvm.org.apache.hadoop.fs.Path(staging.rstrip("/") + "/_SUCCESS")
    if not (fs.exists(src) and fs.exists(marker)):
        return False
    if not fs.rename(src, dst):
        raise IOError(f"crash recovery rename {staging} -> {path} failed")
    return True


def write_bucketed_table(
    df: DataFrame, table_name: str, id_col: str = "id",
    n_buckets: int = DEFAULT_BUCKETS, sort_col: str | None = None,
) -> None:
    """Catalog-bucketed write (``bucketBy`` + ``saveAsTable``): unlike
    the directory-partitioned ``write_table``, this records bucketing
    in the catalog, so joins/aggregations between tables bucketed the
    same way on the same key plan WITHOUT a shuffle exchange -- the
    co-located-join strategy for the chunks x embeddings hot path
    (ST1's partitioned-queue co-location, done the Spark way)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, id_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def streaming_upsert_sink(
    stream_df: DataFrame, path: str, checkpoint_dir: str,
    id_col: str = "id", n_buckets: int = DEFAULT_BUCKETS,
):
    """The K1 upsert's STREAMING face: continuous ingest lands each
    micro-batch through the same idempotent content-addressed merge the
    batch path uses (``foreachBatch`` -> :func:`upsert_table`), so
    at-least-once delivery (source replays after failure) still
    converges -- a redelivered document hits the same id and replaces
    itself. This is the reference's staging -> searchable continuous
    flow (claim loop + INSERT OR REPLACE, ``utils/consumer_utils.py:
    21-132``) with Spark's checkpointed micro-batch exactly-once
    bookkeeping replacing the Redis claim choreography (SURVEY
    section 2.10).

    Returns the started ``StreamingQuery``; callers own its lifecycle.
    """
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table(batch_df.sparkSession, batch_df, path, id_col, n_buckets)

    return (
        stream_df.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_table(
    spark: SparkSession, path: str, id_col: str = "id",
    n_buckets: int = DEFAULT_BUCKETS, version_col: str | None = None,
) -> None:
    """Maintenance compaction: every micro-batch landed through
    :func:`streaming_upsert_sink` (or any append) leaves its own file
    set per bucket directory, and small files are the classic death of
    100 TB scan throughput (per-file open cost, starved vectorized
    reads, NameNode/listing pressure). Rewrite the table through the
    same dedup-and-bucket path so each bucket collapses back to its
    target file count, staged first so the read never races its own
    overwrite.

    Compaction is DETERMINISTIC even when append-mode writes left
    conflicting rows for one id: the survivor per id is max over a
    struct of the non-id columns -- ``version_col`` first when given
    (newest version wins), remaining columns in name order as the
    total-order tiebreak -- never dropDuplicates' partition-order
    pick. Tables with unorderable (map-typed) columns fall back to
    dropDuplicates after ASSERTING ids are unique, so a silent
    arbitrary pick can never happen."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        # recursive: a map nested in an array/struct is just as
        # unorderable as a top-level one (F.max would fail at analysis)
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    staging = path.rstrip("/") + "__compact"
    df = spark.read.parquet(path).drop("bucket")
    others = [c for c in df.columns if c != id_col]
    if any(_has_map(f.dataType) for f in df.schema.fields):
        dup = (
            df.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"compact_table: conflicting rows per {id_col!r} and "
                "map-typed columns prevent a deterministic survivor; "
                "resolve versions upstream"
            )
        deduped = df.dropDuplicates([id_col])
    else:
        order = (
            [version_col] + sorted(c for c in others if c != version_col)
            if version_col else sorted(others)
        )
        deduped = (
            df.groupBy(id_col)
            .agg(F.max(F.struct(*order)).alias("_s"))
            .select(id_col, *[F.col(f"_s.{c}").alias(c) for c in order])
            .select(id_col, *others)  # restore original column order
        )
    deduped.write.mode("overwrite").parquet(staging)
    write_table(spark.read.parquet(staging), path, id_col, n_buckets)
    _delete_dir(spark, staging)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def point_lookup(
    spark: SparkSession, path: str, id_value: str, id_col: str = "id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Bucket-pruned point lookup: recompute the bucket from the id so
    the scan touches ONE partition directory."""
    df = spark.read.parquet(path)
    bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(id_value)), F.lit(n_buckets)))
        .first()[0]
    )
    return df.filter((F.col("bucket") == bucket) & (F.col(id_col) == id_value))


# --------------------------------------------------------------------------
# Versioned table: snapshot isolation + time travel for the parquet
# stand-in (the manifest-pointer design a transactional format gives
# for free, reduced to its two primitives: immutable version dirs and
# an atomically-created commit marker).
# --------------------------------------------------------------------------
def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def versioned_versions(spark: SparkSession, base: str) -> list[int]:
    """COMMITTED versions of a versioned table, ascending. A version
    counts only once its marker file exists -- data directories
    without a marker are in-flight or crashed writes and are never
    read."""
    fs, jvm = _fs(spark, base)
    d = jvm.org.apache.hadoop.fs.Path(f"{base}/_versions")
    if not fs.exists(d):
        return []
    out = []
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.isdigit():
            out.append(int(name))
    return sorted(out)


def _versioned_reserved(spark: SparkSession, base: str) -> list[int]:
    """All version numbers any writer has ever RESERVED (lock files)
    or committed (markers) -- the set a new writer must not reuse.
    Crashed writers leave orphan locks; those numbers stay burned
    (never readable, never reassigned), which is what keeps the
    protocol safe without distributed consensus."""
    fs, jvm = _fs(spark, base)
    d = jvm.org.apache.hadoop.fs.Path(f"{base}/_versions")
    if not fs.exists(d):
        return []
    out = set()
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.isdigit():
            out.add(int(name))
        elif name.endswith(".lock") and name[:-5].isdigit():
            out.add(int(name[:-5]))
    return sorted(out)


def versioned_write(df: DataFrame, base: str) -> int:
    """Commit ``df`` as a NEW immutable snapshot of the table at
    ``base`` and return its version number. Safe under CONCURRENT
    writers, not just crashes.

    Protocol (three steps, each hazard closed by the one after it):

    1. **Stage writer-private**: data lands in
       ``base/_staging/<uuid>/`` -- no other writer can ever observe
       or commit a half-written directory, because nothing under
       ``_staging`` is addressable by a version number.
    2. **Reserve a slot**: atomically create
       ``base/_versions/<n>.lock`` (``createNewFile``) for the first
       free ``n`` above every committed marker AND every existing
       lock. Two racing writers asking for the same ``n`` serialize
       on the create -- the loser retries at ``n+1``. This is the fix
       for the marker race: the OLD protocol let both writers write
       ``v=<n>`` directly and the winner's marker could commit the
       loser's still-writing data.
    3. **Publish, then commit**: rename the staging dir to
       ``base/v=<n>`` (private -> public, the data is already
       complete) and only then create the marker
       ``base/_versions/<n>``.

    Readers trust markers alone (``versioned_versions`` filters locks
    out), so a crash at any point leaves either an invisible staging
    orphan or a burned lock number -- never a readable partial or
    mixed snapshot -- and old snapshots stay intact for time travel.
    This is the manifest-pointer swap ADVICE asked the streaming
    sinks' delete+rename to evolve toward, as a reusable primitive."""
    import uuid

    spark = df.sparkSession
    staging = f"{base}/_staging/{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(staging)
    fs, jvm = _fs(spark, base)
    reserved = _versioned_reserved(spark, base)
    new = (reserved[-1] + 1) if reserved else 1
    while not fs.createNewFile(
        jvm.org.apache.hadoop.fs.Path(f"{base}/_versions/{new}.lock")
    ):
        new += 1  # another writer took the slot between list and create
    src = jvm.org.apache.hadoop.fs.Path(staging)
    dst = jvm.org.apache.hadoop.fs.Path(f"{base}/v={new}")
    # a pre-existing dst here is necessarily an UNMARKED orphan (a
    # marker would have made `new` committed and thus unreservable;
    # the lock we hold excludes live writers): no reader ever saw it,
    # so reclaiming the number by clearing it is safe
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"publish rename {staging} -> {base}/v={new} failed")
    marker = jvm.org.apache.hadoop.fs.Path(f"{base}/_versions/{new}")
    if not fs.createNewFile(marker):
        raise IOError(f"version {new} already committed at {base}")
    return new


def versioned_read(spark: SparkSession, base: str,
                   version: int | None = None) -> DataFrame:
    """Read a committed snapshot: the latest by default, or any prior
    version for time travel. Raises on an uncommitted/unknown
    version rather than silently reading an orphan directory."""
    versions = versioned_versions(spark, base)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {base}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not committed at {base} "
            f"(committed: {versions})"
        )
    return spark.read.parquet(f"{base}/v={version}")
