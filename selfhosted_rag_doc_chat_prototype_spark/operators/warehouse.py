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
    b_raw = (
        F.when(
            F.col("value").isNull() | F.isnan("value")
            | (F.col("value") < -1e15) | (F.col("value") > 1e15),
            F.lit(0).cast("long"),
        ).otherwise(F.floor("value").cast("long"))
    )
    keyed = (
        ev.select(
            F.pmod(F.coalesce(F.col("user_id"), F.lit(0)), F.lit(_Z_DIM_MOD))
            .cast("long").alias("za"),
            F.pmod(b_raw, F.lit(_Z_DIM_MOD)).cast("long").alias("zb"),
        )
        .withColumn("zkey", F.expr(_z_spark()).cast("long"))
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


def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the event stream: each
    user's event_type is treated as their current segment, and every
    CHANGE of segment opens a new validity interval ``[valid_from,
    valid_to)``; the open interval (``valid_to`` NULL) is the current
    row. Consecutive duplicates compact away -- this is the
    lag-to-detect / lead-to-close pattern every warehouse dimension
    build uses, expressed as two per-user window passes.

    Rows with NULL ts are excluded (an unordered fact cannot version
    a dimension); NULL event_type is a legitimate segment value and
    compacts null-safely (IS DISTINCT FROM on both engines). Equal
    timestamps order by event_id, so boundary ties are deterministic.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
    )
    starts = marked.filter(
        (F.col("rn") == 1)
        | ~F.col("prev").eqNullSafe(F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        F.row_number().over(w2).cast("int").alias("version"),
        F.col("event_type").alias("segment"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss")
        .alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
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


QUERIES = {
    "zorder_layout": zorder_layout,
    "scd2_user_segments": scd2_user_segments,
}

ORACLE = {
    "zorder_layout": _zorder_oracle_sql(),
    "scd2_user_segments": _scd2_oracle_sql(),
}
