"""SparkSession factory tuned for the engine.

Defaults target the test/bench harness (``local[$SPARK_GRAFT_CPUS]``),
but every knob is chosen to also hold on a large cluster:

- AQE on (runtime coalescing, skew-join splitting).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a higher initial number.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (naive timestamps) and are cluster-invariant.
- Arrow enabled for every Pandas UDF / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "selfhosted-rag-doc-chat-prototype-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if str(cpus).isdigit() else 32, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # tz-less parquet timestamps (timestamp[us]) must read as
        # instant-typed TIMESTAMP, not TIMESTAMP_NTZ: event-time
        # watermarks reject NTZ, and under a UTC session the two have
        # identical wall-clock semantics vs the DuckDB oracle.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # cost-based optimizer: inert on bare parquet paths (no catalog
        # stats) but lets ANALYZE'd tables feed rowCount into join
        # reordering and the engine's own strategy pricing
        # (operators/similarity.planner_rowcount)
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # progress-bar carriage returns clobber interleaved stdout lines
        # (the r5 gate artifact lost 2 result rows to this); harness
        # output must be grep-auditable
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally created
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # non-runtime-settable on some builds; fine
    return spark
