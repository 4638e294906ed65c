"""Shuffle-skew diagnostics: the pre-flight check for any 100 TB
groupBy/join key choice.

AQE's skew-join splitting handles MODERATE skew at runtime, but a key
whose heaviest value owns a double-digit share of the table (a viral
document, a null-ish default id, a hot tenant) needs a plan change --
salting, pre-aggregation, or a different key. This report quantifies
that before the job runs at scale: per-key concentration plus the salt
factor that would level the heaviest key to the mean partition load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 20,
                n_part: int | None = None) -> DataFrame:
    """Top-``top_n`` heaviest keys of ``df`` grouped by ``key_cols``,
    with each key's share of all rows and the suggested salt factor:
    ``ceil(key_count / mean_partition_load)`` -- the number of salt
    shards that spreads that key across executors at the target
    shuffle parallelism (1 = no salting needed). ``n_part`` defaults
    to the session's shuffle parallelism; pass it explicitly for a
    session-independent (oracle-stable) report.

    One aggregation pass over the keys (map-side combined) plus a
    scalar broadcast -- safe to run on the full fact table."""
    spark = df.sparkSession
    if n_part is None:
        try:
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions",
                                        "200"))
        except ValueError:
            # the conf is "auto" under AQE-managed parallelism on some
            # builds; fall back to the cluster's default parallelism
            n_part = spark.sparkContext.defaultParallelism or 200
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("row_share"),
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("n_rows")
                    / (F.col("total_rows") / F.lit(float(n_part)))
                ),
            ).cast("int").alias("suggested_salt"),
        )
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top_n)
    )


def salted_key(key_col: str, n_salts: int, *, seed_col: str | None = None):
    """The matching salting expression: append a deterministic shard in
    [0, n_salts) derived from ``seed_col`` (default: the key itself is
    NOT usable -- that keeps all rows together -- so callers pass a
    high-cardinality column such as the row's id). GroupBy the salted
    key, then aggregate the partials a second time on the bare key --
    the classic two-phase skew aggregation."""
    if seed_col is None:
        raise ValueError("salting needs a high-cardinality seed column")
    return F.concat_ws(
        "#", F.col(key_col),
        F.pmod(F.xxhash64(F.col(seed_col)), F.lit(n_salts)).cast("string"),
    )
