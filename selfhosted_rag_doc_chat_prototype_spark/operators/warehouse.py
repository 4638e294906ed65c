"""Warehouse-side table maintenance: Z-order layout keys and SCD2
dimension-history compaction.

Reference parity: the reference stores chunks/telemetry in SQLite and
Qdrant and has no lakehouse layout step -- at 100 TB, HOW rows are
laid out in parquet decides whether a two-dimensional predicate scans
1% or 100% of the files. ``zorder_layout`` computes the Morton
(bit-interleaved) key Delta's Z-ORDER / Iceberg's sort-order use and
PROVES the clustering property the optimizer exploits: every
Z-bucket's stats row shows a tight min/max envelope on BOTH source
dimensions, which is exactly the file-skipping predicate a reader
applies. ``scd2_user_segments`` is the classic slowly-changing-
dimension build (type 2: validity intervals, not overwrites) over the
telemetry stream -- the reference keeps only current agent state
(``mqtt_agent_hub`` upserts); a warehouse keeps the history.

Scale shape: the Z-key is pure map-side integer bit arithmetic
(whole-stage codegen, no Python), and the bucket-stats aggregation is
a partial-agg groupBy on a 4096-ary key -- the production write path
is ``df.repartitionByRange("zkey").sortWithinPartitions("zkey")``
straight into parquet, which this operator's stats validate. SCD2 is
two per-user streaming window passes (lag to find change points, lead
to close intervals) over a column-pruned scan; both engines order by
(ts, event_id) so equal-timestamp ties are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table

Z_BITS = 16           # bits interleaved per dimension (key < 2^32)
# bucket = zkey >> 12: drops 6 interleaved bits per dimension, i.e. a
# bucket covers a 64 x 64 tile of the (user, value) plane -- coarse
# enough that the stats table stays tiny, fine enough that every
# bucket's min/max envelope is tight on BOTH dimensions (the pruning
# evidence); a real writer picks the shift from the target file count
Z_BUCKET_SHIFT = 12
_Z_DIM_MOD = 1 << Z_BITS


def _z_spark() -> str:
    """Morton interleave of (za, zb) as a Spark SQL expression: bit i
    of za lands at position 2i, bit i of zb at 2i+1. Pure integer
    shifts/ands -- constant-folded multipliers, fully codegen."""
    return " + ".join(
        f"(shiftleft(shiftright(za, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright(zb, {i}) & 1, {2 * i + 1}))"
        for i in range(Z_BITS)
    )


def _z_duck() -> str:
    return " + ".join(
        f"((((za >> {i}) & 1) * {1 << (2 * i)})"
        f" + (((zb >> {i}) & 1) * {1 << (2 * i + 1)}))"
        for i in range(Z_BITS)
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order bucket statistics over events: dimension A is the
    low 16 bits of user_id, dimension B the floored value (both
    positive-mod folded); the emitted per-bucket envelope
    (min/max of the key AND of each source dimension) is the
    file-skipping evidence -- a reader probing ``user_id = U AND
    value BETWEEN lo, hi`` prunes every bucket whose envelope
    excludes the probe, which only works because Morton buckets
    bound both dimensions at once (a single-column sort bounds one).

    NULL/NaN/out-of-range values fold to dimension 0 (they cluster
    together -- the same "nulls first" region a real table format
    gives them)."""
    ev = table(spark, sf_dir, "events")
    keyed = zorder_cols(ev.select("user_id", "value")).select(
        "za", "zb", "zkey"
    )
    return (
        keyed.groupBy(
            F.shiftright("zkey", Z_BUCKET_SHIFT).cast("long").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zkey").alias("zkey_min"),
            F.max("zkey").alias("zkey_max"),
            F.min("za").alias("u16_min"),
            F.max("za").alias("u16_max"),
            F.min("zb").alias("v16_min"),
            F.max("zb").alias("v16_max"),
        )
    )


def _zorder_oracle_sql() -> str:
    return f"""
        WITH dims AS (
            SELECT ((coalesce(user_id, 0) % {_Z_DIM_MOD}) + {_Z_DIM_MOD})
                       % {_Z_DIM_MOD} AS za,
                   (((CASE WHEN value IS NULL OR isnan(value)
                           OR value < -1e15 OR value > 1e15 THEN 0
                      ELSE CAST(floor(value) AS BIGINT) END)
                     % {_Z_DIM_MOD}) + {_Z_DIM_MOD}) % {_Z_DIM_MOD} AS zb
            FROM events
        ),
        keyed AS (
            SELECT za, zb, CAST({_z_duck()} AS BIGINT) AS zkey FROM dims
        )
        SELECT CAST(zkey >> {Z_BUCKET_SHIFT} AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n_events,
               min(zkey) AS zkey_min, max(zkey) AS zkey_max,
               min(za) AS u16_min, max(za) AS u16_max,
               min(zb) AS v16_min, max(zb) AS v16_max
        FROM keyed GROUP BY 1
    """


def zorder_cols(ev: DataFrame) -> DataFrame:
    """Attach the (za, zb, zkey) layout columns to events: dimension A
    is the positive-mod-folded user_id, dimension B the floored value
    (NULL/NaN/out-of-range fold to 0) -- identical folding to
    :func:`zorder_layout`, kept in one place so the stats query and
    the writer can never disagree about the key."""
    b_raw = (
        F.when(
            F.col("value").isNull() | F.isnan("value")
            | (F.col("value") < -1e15) | (F.col("value") > 1e15),
            F.lit(0).cast("long"),
        ).otherwise(F.floor("value").cast("long"))
    )
    return (
        ev.withColumn(
            "za",
            F.pmod(F.coalesce(F.col("user_id"), F.lit(0)),
                   F.lit(_Z_DIM_MOD)).cast("long"),
        )
        .withColumn("zb", F.pmod(b_raw, F.lit(_Z_DIM_MOD)).cast("long"))
        .withColumn("zkey", F.expr(_z_spark()).cast("long"))
    )


def zorder_write(events: DataFrame, path: str, n_files: int = 16) -> None:
    """The PRODUCTION write path the ``zorder_layout`` stats validate:
    range-partition the rows by Morton key and sort within each file,
    so every parquet file's footer carries a tight min/max envelope on
    BOTH source dimensions -- which is what lets any footer-reading
    scanner (Spark's parquet filter pushdown included) skip files for
    a two-dimensional predicate. ``tests/test_selection_warehouse.py``
    proves the skip end-to-end: a (user_id, value) box predicate
    touches a small fraction of the z-ordered files vs ALL files of a
    shuffled layout.

    ``repartitionByRange`` is one range-shuffle (sampled bounds);
    the per-partition sort is local. At 100 TB, ``n_files`` sizes to
    the target file count (~1 GB files) and the same two lines run
    unchanged."""
    (
        zorder_cols(events).drop("za", "zb")
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(path)
    )


def scd2_build(ev: DataFrame) -> DataFrame:
    """SCD2 core: lag-compaction + interval derivation over rows of
    ``(user_id, ts, event_id, segment)``. Consecutive duplicate
    segments per user compact away; each surviving CHANGE row opens a
    validity interval closed by the next change's ``ts`` (``valid_to``
    NULL = current). Keeps the raw ``(ts, event_id)`` ordering columns
    in the output so an incremental merge can re-compact (the
    streaming sink below stores them)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "ts", "event_id", "segment",
        F.lag("segment").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
    )
    starts = marked.filter(
        (F.col("rn") == 1)
        | ~F.col("prev").eqNullSafe(F.col("segment"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id", "ts", "event_id",
        F.row_number().over(w2).cast("int").alias("version"),
        "segment",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss")
        .alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


SCD2_COLS = ["user_id", "version", "segment",
             "valid_from", "valid_to", "is_current"]


def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the event stream: each
    user's event_type is treated as their current segment, and every
    CHANGE of segment opens a new validity interval ``[valid_from,
    valid_to)``; the open interval (``valid_to`` NULL) is the current
    row. Consecutive duplicates compact away -- this is the
    lag-to-detect / lead-to-close pattern every warehouse dimension
    build uses, expressed as two per-user window passes
    (:func:`scd2_build`).

    Rows with NULL ts are excluded (an unordered fact cannot version
    a dimension); NULL event_type is a legitimate segment value and
    compacts null-safely (IS DISTINCT FROM on both engines). Equal
    timestamps order by event_id, so boundary ties are deterministic.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id",
                F.col("event_type").alias("segment"))
    )
    return scd2_build(ev).select(*SCD2_COLS)


def scd2_streaming_sink(
    stream_events: DataFrame, path: str, checkpoint_dir: str,
):
    """The SCD2 build's STREAMING face: the reference's telemetry
    upsert path (``mqtt_agent_hub/mqtt/registry.py:30-36``) keeps only
    each agent's CURRENT state; this sink consumes the same stream and
    keeps the full dimension history, maintained incrementally per
    micro-batch through ``foreachBatch`` (the ``continuous_rollup_sink``
    pattern).

    Merge semantics: a batch touches only its users -- unaffected
    users' interval rows pass through untouched; affected users'
    stored change rows (which carry their raw ``ts``/``event_id``)
    are pooled with the batch rows, deduped on ``(user_id,
    event_id)`` (replay convergence: redelivered events collapse),
    and re-compacted by the same :func:`scd2_build`. Because
    compaction only ever DROPS non-change rows, re-delivering any
    subset of already-seen events is a no-op, so at-least-once
    delivery converges.

    Ordering contract (the one every incremental SCD2 merge makes):
    a user's events may arrive in any order WITHIN a micro-batch
    (full per-user recompute handles it), but an event older than an
    already-recorded LATER change row of the same user would need the
    dropped in-between rows back -- bound cross-batch disorder with
    the source's watermark, or rebuild affected users from the fact
    table.

    Scale shape: per batch, one broadcast-able semi/anti join on
    ``user_id`` against the dimension (dimension tables are small
    relative to facts -- one row per segment CHANGE, not per event)
    plus the windowed re-compaction over affected users only. The
    parquet stand-in stages and rewrites the table like
    ``sinks.upsert_table``; on a transactional format the same merge
    is partition-scoped ``MERGE INTO``. Returns the started
    StreamingQuery."""
    from pyspark.errors import AnalysisException

    from ..sinks import _replace_dir, recover_replace_dir

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # heal a delete->rename crash from a prior run BEFORE reading
        # state (else replay rebuilds history from this batch alone)
        recover_replace_dir(
            spark, path.rstrip("/") + "__scd2staging", path)
        batch = (
            batch_df.filter(F.col("ts").isNotNull())
            .select("user_id", "ts", "event_id",
                    F.col("event_type").alias("segment"))
        )
        keep = None
        pool = batch
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            existing = None
        if existing is not None:
            affected = batch.select("user_id").distinct()
            keep = existing.join(F.broadcast(affected), "user_id",
                                 "left_anti")
            pool = (
                existing.join(F.broadcast(affected), "user_id",
                              "left_semi")
                .select("user_id", "ts", "event_id", "segment")
                .unionByName(batch)
                .dropDuplicates(["user_id", "event_id"])
            )
        rebuilt = scd2_build(pool)
        out = rebuilt if keep is None else keep.unionByName(rebuilt)
        staging = path.rstrip("/") + "__scd2staging"
        out.write.mode("overwrite").parquet(staging)
        # delete+rename flip: a partial history table is never
        # readable at `path` (crash window documented in _replace_dir)
        _replace_dir(spark, staging, path)

    return (
        stream_events.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _scd2_oracle_sql() -> str:
    return """
        WITH ordered AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events WHERE ts IS NOT NULL
        ),
        starts AS (
            SELECT user_id, ts, event_id, event_type
            FROM ordered
            WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        )
        SELECT user_id,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS INTEGER) AS version,
               event_type AS segment,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), '%Y-%m-%d %H:%M:%S') AS valid_to,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) IS NULL AS is_current
        FROM starts
    """


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join of the fact stream against the SCD2
    dimension: every event gets the (version, segment) that was valid
    AT its own (ts, event_id) -- the leakage-safe join a feature
    store / training-data build must use (joining facts to the
    dimension's CURRENT row leaks future attribute values into past
    training examples; this is the classic label-leakage bug).

    As-of semantics on the (ts, event_id) lexicographic order: a fact
    matches the LAST dimension change at-or-before it; the change
    event itself already carries its NEW segment (dimension row
    sorts first on ties). Implemented as the union-and-fill as-of
    join -- dimension rows and facts interleave in ONE per-user
    window pass (last_value IGNORE NULLS), so there is no range join
    and no per-fact probe: cost is one shuffle on user_id, the same
    partitioning the SCD2 build itself used. Facts with NULL ts are
    excluded (no timeline position -- same contract as the build).
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id",
                F.col("event_type").alias("segment"))
    )
    dim = scd2_build(ev).select(
        "user_id", "ts", "event_id", "version", F.lit(1).alias("is_dim")
    )
    facts = ev.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("int").alias("version"),
        F.lit(0).alias("is_dim"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", F.desc("is_dim"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        dim.unionByName(facts)
        .withColumn("v_asof", F.last("version", ignorenulls=True).over(w))
        .filter(F.col("is_dim") == 0)
        .select("user_id", "ts", "event_id",
                F.col("v_asof").cast("int").alias("version"))
    )
    seg = scd2_build(ev).select(
        "user_id", "version", F.col("segment").alias("segment_asof")
    )
    return filled.join(F.broadcast(seg), ["user_id", "version"]).select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "version", "segment_asof",
    )


def _pit_oracle_sql() -> str:
    return """
        WITH ev AS (
            SELECT user_id, ts, event_id, event_type AS segment
            FROM events WHERE ts IS NOT NULL
        ),
        ordered AS (
            SELECT *,
                   lag(segment) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM ev
        ),
        dim AS (
            SELECT user_id, ts, event_id,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS INTEGER) AS version,
                   segment
            FROM ordered
            WHERE rn = 1 OR prev IS DISTINCT FROM segment
        ),
        unioned AS (
            SELECT user_id, ts, event_id, version, 1 AS is_dim FROM dim
            UNION ALL
            SELECT user_id, ts, event_id, NULL, 0 FROM ev
        ),
        filled AS (
            SELECT user_id, ts, event_id, is_dim,
                   last_value(version IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id, is_dim DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS version
            FROM unioned
        )
        SELECT f.event_id, f.user_id,
               strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               f.version,
               d.segment AS segment_asof
        FROM filled f
        JOIN dim d ON d.user_id = f.user_id AND d.version = f.version
        WHERE f.is_dim = 0
    """


PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
PROFILE_SCALE = 10 ** 6


def table_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA PROFILING of the documents table: one row per column with
    null count/fraction, distinct count, average stringified length,
    and min/max (as strings) -- the table-health report a warehouse
    publishes next to every dataset (and the first thing a pipeline
    owner checks when a 100 TB refresh looks wrong). Fractions and
    averages are 1e6-scaled truncating integers so the row hashes
    bit-equal across engines; zero-denominator groups emit 0.

    Scale shape: ONE aggregation pass computes every metric for every
    column (the per-column rows are unpivoted from a single agg row
    with ``stack``), so the profile costs one scan + one 1-row
    reduce regardless of column count; count(DISTINCT) per column
    rides the same pass via Spark's expand."""
    df = table(spark, sf_dir, "documents").select(*PROFILE_COLS)
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")]
    for c in PROFILE_COLS:
        sc = F.col(c).cast("string")
        nn = F.count(c)
        aggs += [
            (n - nn).cast("long").alias(f"{c}__nnull"),
            F.countDistinct(c).cast("long").alias(f"{c}__ndist"),
            F.when(nn > 0,
                   F.expr(f"sum(length(CAST({c} AS STRING)))"
                          f" * {PROFILE_SCALE} div count({c})"))
            .otherwise(0).cast("long").alias(f"{c}__avglen"),
            F.min(sc).alias(f"{c}__min"),
            F.max(sc).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nnull, {c}__ndist, {c}__avglen, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return one.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.expr(f"stack({len(PROFILE_COLS)}, {stack}) AS "
               "(column, n_null, n_distinct, avg_len_u, min_s, max_s)"),
    ).select(
        "column", "n_rows", "n_null",
        F.expr(f"n_null * {PROFILE_SCALE} div n_rows").cast("long")
        .alias("null_frac_u"),
        "n_distinct", "avg_len_u", "min_s", "max_s",
    )


def _profile_oracle_sql() -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST((count(*) - count({c})) * {PROFILE_SCALE}
                    // count(*) AS BIGINT) AS null_frac_u,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(CASE WHEN count({c}) > 0 THEN
                    sum(length(CAST({c} AS VARCHAR)))
                    * {PROFILE_SCALE} // count({c})
                    ELSE 0 END AS BIGINT) AS avg_len_u,
               min(CAST({c} AS VARCHAR)) AS min_s,
               max(CAST({c} AS VARCHAR)) AS max_s
        FROM documents""")
    return " UNION ALL ".join(parts)


COMPACT_TARGET_BYTES = 8_192  # per-file payload target (tiny at test
# scale so the plan is non-trivial; production passes 128 MiB)
COMPACT_ROW_OVERHEAD = 16     # per-row fixed-column footprint estimate


def compaction_plan(spark: SparkSession, sf_dir: str,
                    target: int = COMPACT_TARGET_BYTES) -> DataFrame:
    """SMALL-FILES compaction planner: for every partition key
    (source) of the documents table, estimate the payload bytes and
    emit how many output files a compaction pass should write and the
    rows-per-file budget -- the planning step behind every
    ``repartitionByRange(...).sortWithinPartitions(...)`` rewrite. At
    100 TB the small-files problem IS the warehouse problem: a
    partition fragmented into thousands of KB-files destroys scan
    throughput (per-file open cost, no row-group parallelism), and a
    partition forced into one huge file destroys write parallelism --
    the planner's ``n_files`` is exactly the ``repartition`` argument
    that fixes both.

    All sizing is integer ceiling division; the only float is each
    partition's share of total bytes (ONE correctly-rounded division
    of two exact integers).

    Scale shape: one partially-aggregated groupBy over a
    column-pruned scan (octet_length of the payload column -- the
    text itself never shuffles); totals ride along broadcast; output
    is partition-key cardinality rows."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.octet_length(F.coalesce(F.col("text"), F.lit(""))))
         + F.count(F.lit(1)) * COMPACT_ROW_OVERHEAD).alias("est_bytes"),
    )
    tot = per.agg(F.sum("est_bytes").alias("tot_bytes"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("est_bytes").cast("long").alias("est_bytes"),
            F.expr(f"(est_bytes + {target} - 1) div {target}")
            .cast("int").alias("n_files"),
            F.expr(
                f"(n_rows + ((est_bytes + {target} - 1) div {target}) - 1)"
                f" div ((est_bytes + {target} - 1) div {target})"
            ).cast("long").alias("rows_per_file"),
            (F.col("est_bytes") * 2 < F.lit(target)).cast("int")
            .alias("merge_candidate"),
            (F.col("est_bytes").cast("double")
             / F.col("tot_bytes").cast("double")).alias("bytes_share"),
        )
    )


def apply_compaction_plan(docs: DataFrame, plan: DataFrame,
                          path: str) -> None:
    """EXECUTE a :func:`compaction_plan` -- the write that makes the
    planner's numbers real, proven on disk by
    ``tests/test_selection_warehouse.py`` the same way
    ``zorder_write`` proves ``zorder_layout``. Every row routes to its
    planned bin: ``file_idx = (per-source row_number - 1) div
    rows_per_file``, then ONE parquet file materializes per
    (source, file_idx) group -- a hash repartition on the pair puts
    each group wholly inside one task, and ``partitionBy`` gives each
    group its own directory, so the post-state file count per source
    is exactly the plan's predicted ``ceil(n_rows / rows_per_file)``
    and no file exceeds ``rows_per_file`` rows.

    Scale shape: the per-source window shuffles exactly the partition
    being rewritten -- which is the compaction job's own input, the
    same rows a Delta OPTIMIZE bin-packs; nothing outside the
    fragmented partitions moves. At 100 TB each source partition is an
    independent rewrite, so a maintenance scheduler fans the plan out
    row-by-row as separate jobs over disjoint inputs; this single-pass
    form is the one-job version of the same routing."""
    w = Window.partitionBy("source").orderBy("doc_id")
    routed = (
        docs.join(F.broadcast(plan.select("source", "rows_per_file")),
                  "source")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("file_idx",
                    F.expr("CAST((_rn - 1) div rows_per_file AS INT)"))
        .drop("_rn", "rows_per_file")
    )
    (
        routed.repartition("source", "file_idx")
        .write.mode("overwrite").partitionBy("source", "file_idx")
        .parquet(path)
    )


def _compaction_oracle_sql() -> str:
    t = COMPACT_TARGET_BYTES
    files = f"(est_bytes + {t} - 1) // {t}"
    return f"""
        WITH per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(strlen(coalesce(text, '')))
                        + count(*) * {COMPACT_ROW_OVERHEAD} AS BIGINT)
                       AS est_bytes
            FROM documents GROUP BY source
        ),
        tot AS (SELECT sum(est_bytes) AS tot_bytes FROM per)
        SELECT source, n_rows, est_bytes,
               CAST({files} AS INTEGER) AS n_files,
               CAST((n_rows + {files} - 1) // ({files}) AS BIGINT)
                   AS rows_per_file,
               CASE WHEN est_bytes * 2 < {t} THEN 1 ELSE 0 END
                   AS merge_candidate,
               CAST(est_bytes AS DOUBLE) / CAST(t.tot_bytes AS DOUBLE)
                   AS bytes_share
        FROM per CROSS JOIN tot t
    """


def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-CONTRACT VALIDATION -- the expectations suite a warehouse
    runs before publishing a table (the Great Expectations / dbt-test
    pattern as ONE queryable report): range rules, positivity rules,
    referential integrity, and key uniqueness over the TPC-H tables,
    each emitting (rule, table_name, n_checked, n_violations, passed).

    Scale shape: every range/positivity rule is one column-pruned scan
    with a map-side conditional count (rules over the same table share
    the scan); the two referential rules are anti-join counts whose
    dimension side broadcasts under AQE; uniqueness is a partial-agg
    groupBy on the key. Nothing scans a table twice for a second rule
    on the same table."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey")

    def report(rule, tname, checked, violations):
        return F.struct(
            F.lit(rule).alias("rule"), F.lit(tname).alias("table_name"),
            checked.cast("long").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
            (violations == 0).alias("passed"),
        )

    li_rules = li.agg(
        F.array(
            report(
                "quantity_in_1_50", "lineitem", F.count(F.lit(1)),
                F.count(F.when(
                    F.col("l_quantity").isNull()
                    | (F.col("l_quantity") < 1)
                    | (F.col("l_quantity") > 50), 1)),
            ),
            report(
                "discount_in_0_0.1", "lineitem", F.count(F.lit(1)),
                F.count(F.when(
                    F.col("l_discount").isNull()
                    | (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 0.1), 1)),
            ),
        ).alias("rs")
    ).select(F.explode("rs").alias("r"))
    ord_rules = orders.agg(
        F.array(
            report(
                "totalprice_positive", "orders", F.count(F.lit(1)),
                F.count(F.when(
                    F.col("o_totalprice").isNull()
                    | (F.col("o_totalprice") <= 0), 1)),
            ),
        ).alias("rs")
    ).select(F.explode("rs").alias("r"))
    ref_li = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(F.broadcast(li.agg(F.count(F.lit(1)).alias("n"))))
        .select(report("lineitem_orderkey_in_orders", "lineitem",
                       F.col("n"), F.col("v")).alias("r"))
    )
    ref_ord = (
        orders.select("o_custkey")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(F.broadcast(orders.agg(F.count(F.lit(1)).alias("n"))))
        .select(report("orders_custkey_in_customer", "orders",
                       F.col("n"), F.col("v")).alias("r"))
    )
    uniq = (
        cust.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count(F.when(F.col("c") > 1, 1)).alias("v"))
        .select(report("custkey_unique", "customer",
                       F.col("n"), F.col("v")).alias("r"))
    )
    out = li_rules.unionByName(ord_rules).unionByName(ref_li) \
        .unionByName(ref_ord).unionByName(uniq)
    return out.select("r.rule", "r.table_name", "r.n_checked",
                      "r.n_violations", "r.passed")


def _dq_oracle_sql() -> str:
    return """
        SELECT 'quantity_in_1_50' AS rule, 'lineitem' AS table_name,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(count(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                    OR l_quantity > 50 THEN 1 END) AS BIGINT)
                   AS n_violations,
               count(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                    OR l_quantity > 50 THEN 1 END) = 0 AS passed
        FROM lineitem
        UNION ALL
        SELECT 'discount_in_0_0.1', 'lineitem',
               CAST(count(*) AS BIGINT),
               CAST(count(CASE WHEN l_discount IS NULL OR l_discount < 0
                    OR l_discount > 0.1 THEN 1 END) AS BIGINT),
               count(CASE WHEN l_discount IS NULL OR l_discount < 0
                    OR l_discount > 0.1 THEN 1 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'totalprice_positive', 'orders',
               CAST(count(*) AS BIGINT),
               CAST(count(CASE WHEN o_totalprice IS NULL
                    OR o_totalprice <= 0 THEN 1 END) AS BIGINT),
               count(CASE WHEN o_totalprice IS NULL
                    OR o_totalprice <= 0 THEN 1 END) = 0
        FROM orders
        UNION ALL
        SELECT 'lineitem_orderkey_in_orders', 'lineitem',
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)) = 0
        UNION ALL
        SELECT 'orders_custkey_in_customer', 'orders',
               (SELECT CAST(count(*) AS BIGINT) FROM orders),
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)) = 0
        UNION ALL
        SELECT 'custkey_unique', 'customer',
               (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT)
                FROM customer),
               CAST((SELECT count(*) FROM (SELECT c_custkey
                     FROM customer GROUP BY c_custkey
                     HAVING count(*) > 1)) AS BIGINT),
               (SELECT count(*) FROM (SELECT c_custkey FROM customer
                GROUP BY c_custkey HAVING count(*) > 1)) = 0
    """


ZM_BLOCK_IDS = 512  # natural-layout block width in event ids
# (name, user bounds, value bounds); NULL bound = unconstrained.
ZM_PREDS = (
    ("user_eq_7", 7, 7, None, None),
    ("user_band_0_3", 0, 3, None, None),
    ("value_band_100_120", None, None, 100.0, 120.0),
    ("user0_3_and_value100_120", 0, 3, 100.0, 120.0),
)


def zonemap_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZONE-MAP DATA-SKIPPING comparison -- the report that justifies
    the z-order layout with numbers: for the SAME corpus laid out (a)
    in natural insertion order (blocks of ZM_BLOCK_IDS consecutive
    event ids -- what an append-only writer produces) and (b) in
    Morton buckets (``zorder_layout``'s zbucket), compute each block's
    min/max envelope on (user_id, value) and, for a fixed family of
    point/band/conjunctive predicates, how many blocks a footer-
    reading scanner skips and how many rows it still scans. The
    natural layout scatters both dimensions across every block, so it
    skips almost nothing; the Morton layout bounds both at once.

    Skip rule (sound, null-aware): a block is skippable for a
    user-constrained predicate when its non-null user envelope is
    disjoint from the band OR it contains no non-null user at all
    (NULL never matches an equality/band predicate); same for value;
    a conjunction skips when EITHER side prunes. Fractions are ratios
    of exactly-computed integers.

    Scale shape: both block assignments are map-only expressions (no
    global sort -- natural blocks key on the id, Morton blocks on the
    bucketized interleave), the per-block envelopes are ONE shared
    partial-aggregated groupBy per layout over one pruned scan, and
    the predicate evaluation runs over block-count x 4 rows with the
    predicate table broadcast."""
    ev = zorder_cols(
        table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ).select(
        "event_id", "user_id", "value",
        F.shiftright("zkey", Z_BUCKET_SHIFT).cast("long").alias("zbucket"),
    )

    def _blocks(layout: str, key) -> DataFrame:
        return (
            ev.groupBy(key.alias("blk"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("user_id").alias("u_min"),
                F.max("user_id").alias("u_max"),
                F.min("value").alias("v_min"),
                F.max("value").alias("v_max"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    blocks = _blocks(
        "natural",
        F.expr(f"coalesce(event_id, 0) div {ZM_BLOCK_IDS}"),
    ).unionByName(_blocks("zorder", F.col("zbucket")))

    preds = F.explode(F.array(*[
        F.struct(
            F.lit(n).alias("predicate"),
            F.lit(ul).cast("long").alias("u_lo"),
            F.lit(uh).cast("long").alias("u_hi"),
            F.lit(vl).cast("double").alias("v_lo"),
            F.lit(vh).cast("double").alias("v_hi"),
        )
        for n, ul, uh, vl, vh in ZM_PREDS
    ])).alias("p")
    crossed = blocks.select("*", preds).select("*", "p.*").drop("p")
    skip_u = F.col("u_lo").isNotNull() & (
        F.col("u_min").isNull() | (F.col("u_min") > F.col("u_hi"))
        | (F.col("u_max") < F.col("u_lo"))
    )
    skip_v = F.col("v_lo").isNotNull() & (
        F.col("v_min").isNull() | (F.col("v_min") > F.col("v_hi"))
        | (F.col("v_max") < F.col("v_lo"))
    )
    skip = (skip_u | skip_v).alias("skip")
    return (
        crossed.select("*", skip)
        .groupBy("layout", "predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.col("skip").cast("long")).alias("n_skipped"),
            F.sum(F.when(~F.col("skip"), F.col("n_rows")).otherwise(0))
            .cast("long").alias("rows_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
        )
        .select(
            "layout", "predicate", "n_blocks", "n_skipped",
            (F.col("n_skipped").cast("double")
             / F.col("n_blocks").cast("double")).alias("skip_frac"),
            "rows_scanned", "rows_total",
        )
    )


def _zonemap_oracle_sql() -> str:
    pred_rows = ",\n                ".join(
        "({}, {}, {}, {}, {})".format(
            f"'{n}'",
            "CAST(NULL AS BIGINT)" if ul is None else str(ul),
            "CAST(NULL AS BIGINT)" if uh is None else str(uh),
            "CAST(NULL AS DOUBLE)" if vl is None else repr(vl),
            "CAST(NULL AS DOUBLE)" if vh is None else repr(vh),
        )
        for n, ul, uh, vl, vh in ZM_PREDS
    )
    return f"""
        WITH dims AS (
            SELECT event_id, user_id, value,
                   ((coalesce(user_id, 0) % {_Z_DIM_MOD})
                    + {_Z_DIM_MOD}) % {_Z_DIM_MOD} AS za,
                   (((CASE WHEN value IS NULL OR isnan(value)
                           OR value < -1e15 OR value > 1e15 THEN 0
                      ELSE CAST(floor(value) AS BIGINT) END)
                     % {_Z_DIM_MOD}) + {_Z_DIM_MOD}) % {_Z_DIM_MOD} AS zb
            FROM events
        ),
        keyed AS (
            SELECT event_id, user_id, value,
                   CAST({_z_duck()} AS BIGINT) >> {Z_BUCKET_SHIFT}
                       AS zbucket
            FROM dims
        ),
        blocks AS (
            SELECT 'natural' AS layout,
                   coalesce(event_id, 0) // {ZM_BLOCK_IDS} AS blk,
                   count(*) AS n_rows,
                   min(user_id) AS u_min, max(user_id) AS u_max,
                   min(value) AS v_min, max(value) AS v_max
            FROM keyed GROUP BY 2
            UNION ALL
            SELECT 'zorder', zbucket, count(*),
                   min(user_id), max(user_id), min(value), max(value)
            FROM keyed GROUP BY 2
        ),
        preds(predicate, u_lo, u_hi, v_lo, v_hi) AS (
            VALUES {pred_rows}
        ),
        flagged AS (
            SELECT layout, predicate, n_rows,
                   ((u_lo IS NOT NULL AND (u_min IS NULL
                      OR u_min > u_hi OR u_max < u_lo))
                    OR (v_lo IS NOT NULL AND (v_min IS NULL
                      OR v_min > v_hi OR v_max < v_lo))) AS skip
            FROM blocks, preds
        )
        SELECT layout, predicate,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(CASE WHEN skip THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_skipped,
               CAST(sum(CASE WHEN skip THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS skip_frac,
               CAST(sum(CASE WHEN NOT skip THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_scanned,
               CAST(sum(n_rows) AS BIGINT) AS rows_total
        FROM flagged GROUP BY layout, predicate
    """


ERASE_MOD = 97  # pinned erasure cohort: c_custkey % 97 == 0


def erasure_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN impact report -- the dry-run a warehouse
    runs before executing a deletion request: for the pinned customer
    cohort (c_custkey % ERASE_MOD == 0), how many rows each table
    loses under the referential CASCADE (customer directly; orders by
    custkey; lineitem through the deleted orders' keys). Fractions
    are ratios of exactly-counted integers. The executing twin is
    :func:`erase_customers`, proven on disk in
    tests/test_selection_warehouse.py.

    Scale shape: the cohort and the deleted-order keyset are
    dimension-sized and broadcast; each table contributes one
    column-pruned scan with a map-side conditional count (lineitem's
    membership probe is a broadcast semi-join, never a shuffle of the
    fact table)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    doomed = F.col("c_custkey") % ERASE_MOD == 0
    c_stats = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(doomed.cast("long")).alias("n_delete"),
    ).select(F.lit("customer").alias("table_name"), "n_rows", "n_delete")
    o_doomed = F.col("o_custkey") % ERASE_MOD == 0
    o_stats = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(o_doomed.cast("long")).alias("n_delete"),
    ).select(F.lit("orders").alias("table_name"), "n_rows", "n_delete")
    doomed_orders = orders.filter(o_doomed).select("o_orderkey")
    l_flag = (
        li.join(F.broadcast(doomed_orders),
                li["l_orderkey"] == doomed_orders["o_orderkey"],
                "left")
        .select(F.col("o_orderkey").isNotNull().alias("d"))
    )
    l_stats = l_flag.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("d").cast("long")).alias("n_delete"),
    ).select(F.lit("lineitem").alias("table_name"), "n_rows", "n_delete")
    return (
        c_stats.unionByName(o_stats).unionByName(l_stats)
        .select(
            "table_name", "n_rows", "n_delete",
            (F.col("n_delete").cast("double")
             / F.col("n_rows").cast("double")).alias("delete_frac"),
        )
    )


def _erasure_oracle_sql() -> str:
    return f"""
        WITH doomed_orders AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey % {ERASE_MOD} = 0
        ),
        legs AS (
            SELECT 'customer' AS table_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN c_custkey % {ERASE_MOD} = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_delete
            FROM customer
            UNION ALL
            SELECT 'orders', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN o_custkey % {ERASE_MOD} = 0
                        THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'lineitem', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM doomed_orders d
                        WHERE d.o_orderkey = l.l_orderkey)
                        THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem l
        )
        SELECT table_name, n_rows, n_delete,
               CAST(n_delete AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS delete_frac
        FROM legs
    """


def erase_customers(spark: SparkSession, sf_dir: str, dst_dir: str,
                    erase_mod: int = ERASE_MOD) -> DataFrame:
    """EXECUTE the cascade erasure :func:`erasure_impact_report`
    plans: write erased copies of customer/orders/lineitem under
    ``dst_dir`` (broadcast anti-joins against the doomed keysets --
    the fact table never shuffles) and return the audit relation
    (rows before/after/deleted per table). The on-disk proof test
    asserts audit == impact report == post-state."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    doomed_c = cust.filter(
        F.col("c_custkey") % erase_mod == 0).select("c_custkey")
    doomed_o = orders.join(
        F.broadcast(doomed_c),
        orders["o_custkey"] == doomed_c["c_custkey"], "left_semi"
    ).select("o_orderkey")
    keep = {
        "customer": cust.join(F.broadcast(doomed_c), ["c_custkey"],
                              "left_anti"),
        "orders": orders.join(F.broadcast(doomed_o), ["o_orderkey"],
                              "left_anti"),
        "lineitem": li.join(
            F.broadcast(doomed_o),
            li["l_orderkey"] == doomed_o["o_orderkey"], "left_anti"),
    }
    audits = []
    for name, kept in keep.items():
        kept.write.mode("overwrite").parquet(f"{dst_dir}/{name}.parquet")
        before = (cust if name == "customer"
                  else orders if name == "orders" else li).count()
        after = spark.read.parquet(f"{dst_dir}/{name}.parquet").count()
        audits.append((name, before, after, before - after))
    return spark.createDataFrame(
        audits, "table_name string, n_before long, n_after long, "
                "n_deleted long"
    )


MERGE_DEL_CENTS = 40_000_000  # matched rows above this spend are purged
MERGE_INS_SHIFT = 10_000_000  # synthetic insert keys (source-only rows)


def merge_into_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full three-clause MERGE INTO (the Delta/Iceberg upsert
    statement: WHEN MATCHED AND <pred> THEN DELETE / WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED THEN INSERT) expressed the way every
    lakehouse engine physically executes it -- ONE full outer
    equi-join of target and source on the merge key, then a map-side
    clause projection. Target is the customer table; the source is the
    per-customer order spend (exact integer cents) plus shifted-key
    rows for the urgent-order cohort, so all three clauses fire:

    - matched, spend > ``MERGE_DEL_CENTS``    -> row deleted;
    - matched otherwise                        -> balance updated
      (+= spend div 100, exact cents);
    - source-only (shifted keys)               -> row inserted;
    - target-only                              -> row kept unchanged.

    Emits the post-merge table with its ``merge_action`` lineage
    column (kept/updated/inserted; deleted rows are absent).

    Scale shape: the single key-equi-join shuffles both sides once
    (AQE broadcasts the source when it is small); every clause is a
    codegen CASE over the joined row -- exactly one pass over the
    target, the property that makes MERGE viable at lakehouse scale."""
    tgt = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
        .alias("bal_cents"),
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .alias("spend_cents")
    )
    inserts = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("spend_cents"))
        .select(
            (F.col("o_custkey") + MERGE_INS_SHIFT).alias("o_custkey"),
            "spend_cents",
        )
    )
    src = spend.unionByName(inserts)
    j = tgt.join(src, tgt["c_custkey"] == src["o_custkey"], "full_outer")
    matched = F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull()
    return (
        j.filter(
            # WHEN MATCHED AND spend > bound THEN DELETE
            ~(matched & (F.col("spend_cents") > MERGE_DEL_CENTS))
        )
        .select(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey"))
            .alias("c_custkey"),
            F.coalesce(
                F.col("c_name"),
                F.concat(F.lit("MERGED#"), F.col("o_custkey")),
            ).alias("c_name"),
            F.when(
                matched,
                F.col("bal_cents")
                + F.expr("spend_cents div 100"),
            ).otherwise(
                F.coalesce(F.expr("spend_cents div 100"),
                           F.col("bal_cents"))
            ).cast("long").alias("bal_cents"),
            F.when(matched, F.lit("updated"))
            .when(F.col("c_custkey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("kept")).alias("merge_action"),
        )
    )


def _merge_oracle_sql() -> str:
    return f"""
        WITH tgt AS (
            SELECT c_custkey, c_name,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents
            FROM customer
        ),
        spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS spend_cents
            FROM orders WHERE o_custkey IS NOT NULL
            GROUP BY o_custkey
        ),
        ins AS (
            SELECT o_custkey + {MERGE_INS_SHIFT} AS o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS spend_cents
            FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_orderpriority = '1-URGENT'
            GROUP BY o_custkey
        ),
        src AS (SELECT * FROM spend UNION ALL SELECT * FROM ins),
        j AS (
            SELECT t.c_custkey, t.c_name, t.bal_cents,
                   s.o_custkey, s.spend_cents
            FROM tgt t FULL OUTER JOIN src s
              ON t.c_custkey = s.o_custkey
        )
        SELECT coalesce(c_custkey, o_custkey) AS c_custkey,
               coalesce(c_name, 'MERGED#' || o_custkey) AS c_name,
               CAST(CASE
                   WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                   THEN bal_cents + spend_cents // 100
                   ELSE coalesce(spend_cents // 100, bal_cents)
               END AS BIGINT) AS bal_cents,
               CASE
                   WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                       THEN 'updated'
                   WHEN c_custkey IS NULL THEN 'inserted'
                   ELSE 'kept'
               END AS merge_action
        FROM j
        WHERE NOT (c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                   AND spend_cents > {MERGE_DEL_CENTS})
    """


def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY (the Debezium-consumer compaction): a change feed of
    keyed INSERT/UPDATE/DELETE ops collapses to final table state by
    LAST-WRITER-WINS on the change sequence number -- upserts land,
    a trailing DELETE tombstones the key out. The feed derives
    deterministically from orders (key = customer, seq = order key --
    unique, so the winner is never a tie; op from status/key
    arithmetic), with payloads in exact integer cents.

    Scale shape: ONE partial-aggregated groupBy -- ``max_by(payload,
    seq)`` folds to the winning change map-side (no per-key window, no
    sort); tombstoned keys drop in a codegen filter. This is the shape
    that lets a 100 TB change feed compact in a single shuffle."""
    ch = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    ).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.expr(
            "CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0 "
            "THEN 'D' WHEN o_orderkey % 3 = 0 THEN 'I' ELSE 'U' END"
        ).alias("op"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .alias("cents"),
    )
    final = ch.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_changes"),
        F.expr("max(seq)").cast("long").alias("last_seq"),
        F.expr("max_by(op, seq)").alias("last_op"),
        F.expr("max_by(cents, seq)").cast("long").alias("value_cents"),
    )
    return final.filter(F.col("last_op") != "D").select(
        "key", "n_changes", "last_seq", "last_op", "value_cents",
    )


def cdc_streaming_sink(
    stream_changes: DataFrame, path: str, checkpoint_dir: str,
):
    """The CDC apply's STREAMING face: consume a change feed of
    ``(key, seq, op, value_cents)`` rows and maintain the compacted
    last-writer-wins state table incrementally per micro-batch
    (``foreachBatch``, the scd2 sink pattern).

    Merge semantics per batch: pool the batch's rows with the stored
    winners of the touched keys only and re-fold with the SAME
    ``max_by(payload, seq)`` aggregate the batch operator uses.
    Because max_by over a unique ``seq`` is ORDER-FREE and idempotent
    (folding any subset of already-seen changes cannot move the
    winner backwards), at-least-once redelivery and cross-batch
    disorder BOTH converge to the batch result -- strictly stronger
    than the scd2 sink's ordering contract. Two deliberate deltas from
    the batch face: the state stores ONLY the winner row per key (the
    change-count observable needs the full log and stays batch-only --
    a winner-only state cannot count redelivered-then-compacted seqs
    exactly), and tombstones are KEPT in the stored state (dropping a
    'D' winner would resurrect the key when an older change replays);
    the read face filters them.

    Scale shape: per batch, one broadcast anti/semi join against the
    state table on the touched keys + one partial-aggregated fold
    over touched-key rows; staged delete->rename flip with the crash
    healer, same as every foreachBatch sink here. Returns the started
    StreamingQuery."""
    from pyspark.errors import AnalysisException

    from ..sinks import _replace_dir, recover_replace_dir

    cols = ["key", "seq", "op", "value_cents"]

    def _fold(pool: DataFrame) -> DataFrame:
        return pool.groupBy("key").agg(
            F.expr("max(seq)").cast("long").alias("seq"),
            F.expr("max_by(op, seq)").alias("op"),
            F.expr("max_by(value_cents, seq)").cast("long")
            .alias("value_cents"),
        ).select(*cols)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        staging = path.rstrip("/") + "__cdcstaging"
        recover_replace_dir(spark, staging, path)
        batch = batch_df.select("key", "seq", "op", "value_cents")
        keep = None
        pool = batch
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            existing = None
        if existing is not None:
            touched = batch.select("key").distinct()
            keep = existing.join(F.broadcast(touched), "key", "left_anti")
            pool = (
                existing.join(F.broadcast(touched), "key", "left_semi")
                .select(*cols)
                .unionByName(batch)
                # replay convergence: a redelivered change is the SAME
                # (key, seq) row -- collapse before counting
                .dropDuplicates(["key", "seq"])
            )
        out = _fold(pool)
        out = out if keep is None else keep.unionByName(out)
        out.write.mode("overwrite").parquet(staging)
        _replace_dir(spark, staging, path)

    return (
        stream_changes.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cdc_state_read(spark: SparkSession, path: str) -> DataFrame:
    """Read face of :func:`cdc_streaming_sink`: live rows only
    (tombstone winners stay stored for replay safety, hidden here)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("op") != "D")
        .select("key", F.col("seq").alias("last_seq"),
                F.col("op").alias("last_op"), "value_cents")
    )


def _cdc_oracle_sql() -> str:
    return """
        WITH ch AS (
            SELECT o_custkey AS key, o_orderkey AS seq,
                   CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0
                        THEN 'D' WHEN o_orderkey % 3 = 0
                        THEN 'I' ELSE 'U' END AS op,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM orders WHERE o_custkey IS NOT NULL
        ),
        f AS (
            SELECT key,
                   CAST(count(*) AS BIGINT) AS n_changes,
                   CAST(max(seq) AS BIGINT) AS last_seq,
                   arg_max(op, seq) AS last_op,
                   CAST(arg_max(cents, seq) AS BIGINT) AS value_cents
            FROM ch GROUP BY key
        )
        SELECT key, n_changes, last_seq, last_op, value_cents
        FROM f WHERE last_op <> 'D'
    """


# ---- export shard manifest -------------------------------------------------

MANIFEST_SHARDS = 16  # one hex nibble; a real export picks ~bytes/shard


def shard_manifest_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard MANIFEST: assign every document to a
    shard, fix the within-shard record order, and compute each
    record's starting BYTE OFFSET in its (jsonl-framed) shard file --
    the seekable index a dataloader or resumable exporter needs
    (WebDataset/MDS-style sample index; the reference's parquet
    archival sink K3 writes the files, this writes the map).

    Sharding is content-addressed (first md5 nibble of the doc id) so
    shard BYTES stay balanced whatever the id distribution; the
    within-shard order is (doc_id) so an export resumes monotonically.
    Record framing is text + 1 newline byte; a NULL text exports as
    the empty record (1 byte), never a skipped id.

    Scale shape: NO global sort or single-partition window -- the
    offset cumsum is a window PARTITIONED BY shard (the per-shard
    prefix sum is inherently sequential: it IS the file layout), so
    the sort fans out across MANIFEST_SHARDS partitions; at 100 TB
    raise the nibble count so each shard's manifest partition fits an
    executor (the same lever as epoch_shuffle_shards). Byte lengths
    are utf-8 octet_length -- map-side codegen, never Python."""
    docs = table(spark, sf_dir, "documents")
    shard = F.conv(
        F.substring(
            F.md5(F.coalesce(F.col("doc_id").cast("string"), F.lit(""))),
            1, 1),
        16, 10,
    ).cast("int")
    byte_len = F.octet_length(F.coalesce(F.col("text"), F.lit("")))
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    return (
        docs.select("doc_id", shard.alias("shard"),
                    byte_len.cast("long").alias("byte_len"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .withColumn(
            "byte_offset",
            F.coalesce(F.sum(F.col("byte_len") + 1).over(cum), F.lit(0))
            .cast("long"),
        )
        .select("shard", "pos", "doc_id", "byte_offset", "byte_len")
    )


def _manifest_oracle_sql() -> str:
    return """
        WITH d AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(
                       coalesce(CAST(doc_id AS VARCHAR), '')), 1, 1)
                       AS INT) AS INTEGER) AS shard,
                   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
                       AS byte_len
            FROM documents
        )
        SELECT shard,
               CAST(row_number() OVER (
                   PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS pos,
               doc_id,
               CAST(coalesce(sum(byte_len + 1) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS byte_offset,
               byte_len
        FROM d
    """


QUERIES = {
    "merge_into_customers": merge_into_customers,
    "cdc_apply_orders": cdc_apply_orders,
    "table_profile_documents": table_profile_documents,
    "zorder_layout": zorder_layout,
    "scd2_user_segments": scd2_user_segments,
    "scd2_point_in_time_join": scd2_point_in_time_join,
    "compaction_plan": compaction_plan,
    "data_quality_expectations": data_quality_expectations,
    "zonemap_skipping_report": zonemap_skipping_report,
    "erasure_impact_report": erasure_impact_report,
    "shard_manifest_offsets": shard_manifest_offsets,
}

ORACLE = {
    "merge_into_customers": _merge_oracle_sql(),
    "cdc_apply_orders": _cdc_oracle_sql(),
    "table_profile_documents": _profile_oracle_sql(),
    "zorder_layout": _zorder_oracle_sql(),
    "scd2_user_segments": _scd2_oracle_sql(),
    "scd2_point_in_time_join": _pit_oracle_sql(),
    "compaction_plan": _compaction_oracle_sql(),
    "data_quality_expectations": _dq_oracle_sql(),
    "zonemap_skipping_report": _zonemap_oracle_sql(),
    "erasure_impact_report": _erasure_oracle_sql(),
    "shard_manifest_offsets": _manifest_oracle_sql(),
}
