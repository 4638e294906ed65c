"""Parquet table loaders for the driver's synthetic star schema.

Mirrors the reference's archival-parquet readback path
(``doc-ingest-chat/services/parquet_service.py:196-200``) as a native
``spark.read.parquet`` scan -- Catalyst gets predicate pushdown, column
pruning and partition pruning for free on every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized
        # reader rejects; read nanos as long and truncate to micros
        # exactly (integer div -- double math would lose precision at
        # 1e18), matching DuckDB's ns->us truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rebalance(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan is under-split
    (fewer partitions than cores) -- the local small-file corpus lands
    in one parquet row group, serializing CPU-heavy per-row operators
    onto a single core. On a real many-file table partitions >= cores,
    so this is a no-op and costs no shuffle at scale. Same guard as
    the ingest binary-file rebalance (operators/ingest.py).

    The always-true non-deterministic guard after the exchange is a
    predicate-pushdown BARRIER: without it, Catalyst pushes any later
    deterministic filter (e.g. a quality-flag predicate over expensive
    gram metrics) back through the round-robin exchange into the
    single-split scan stage, serializing exactly the CPU-heavy work the
    repartition exists to spread (measured 9.5s -> 1.1s on the curation
    flags path at sf0.1). Column pruning still reaches the scan; only
    row filters stay above the exchange, where the corpus paths using
    this helper want them anyway."""
    spark = df.sparkSession
    par = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par).where(F.monotonically_increasing_id() >= 0)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same parquet scans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
