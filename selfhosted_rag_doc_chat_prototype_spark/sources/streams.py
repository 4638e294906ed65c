"""Pluggable telemetry stream source (S8).

The reference ingests agent telemetry over MQTT
(``mqtt_agent_hub/mqtt/client.py``, topics + JSON payloads). Spark has
no first-party MQTT source, so the engine treats the broker as a
CONFIG, not an architecture: every streaming plan in
``streaming/telemetry.py`` consumes a plain DataFrame with the
telemetry schema, and :func:`telemetry_stream` builds that DataFrame
from whichever wire is available --

- ``files``  : file-source stream over parquet drops (the in-container
  stand-in; also the replay/backfill path at scale).
- ``jsonl``  : file-source stream over JSON-lines drops routed through
  the SAME payload parser the kafka face uses -- proves the broker
  wire format end-to-end without a broker.
- ``rate``   : Spark's built-in rate source mapped onto the telemetry
  schema (synthetic heartbeats; liveness/load testing).
- ``kafka_replay`` : recorded topic frames (parquet in the EXACT
  kafka connector wire schema, :data:`KAFKA_WIRE_SCHEMA`) through the
  identical parse path as the live connector -- the in-container
  integration proof for the kafka face and the replay/backfill path
  for archived topic dumps.
- ``kafka``  : ``format("kafka")`` + :func:`parse_telemetry_payload`.
  The connector jar (``spark-sql-kafka-0-10``) is not baked into this
  container (re-verified round 6: no kafka jar under pyspark/jars and
  no network to fetch one), so the face raises a clear error naming
  the package when
  the source is absent; when present it is a pure config swap. An MQTT
  broker reaches this face through the standard MQTT->Kafka bridge
  (the pattern replacing the retired Bahir MQTT source).

The payload parser is deliberately separated from the socket: batch
and stream tests drive it with JSON bytes matching Kafka's wire schema
(``key binary, value binary, topic, partition, offset, timestamp``),
so everything except the TCP connection itself is exercised in CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical telemetry schema -- mirrors the events table
# (TESTDATA.md) and the reference's heartbeat payload fields
# (mqtt_agent_hub/mqtt/registry.py:30-36)
TELEMETRY_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


# the EXACT column set Spark's format("kafka") source emits (minus the
# optional headers array): recorded topic dumps in this shape replay
# through the identical parse path as the live connector, so only the
# jar/TCP boundary itself is untested in-container
KAFKA_WIRE_SCHEMA = T.StructType([
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("timestampType", T.IntegerType()),
])


def telemetry_to_kafka_frames(events: DataFrame,
                              topic: str = "agents/telemetry",
                              n_partitions: int = 4) -> DataFrame:
    """Encode telemetry rows as RECORDED KAFKA FRAMES -- every column
    ``format("kafka")`` would emit (:data:`KAFKA_WIRE_SCHEMA`): key =
    the producer's partition key (user_id, the reference's per-agent
    topic identity, ``mqtt_agent_hub/shared/topics.py``), value = the
    JSON payload bytes, partition = hash(key) % n, offset = a
    per-partition-unique monotone long (event_id -- a fixture stand-in
    for the broker's log offset), timestampType = 0 (CreateTime).
    Producers feeding an archive sink and tests replaying through the
    ``kafka_replay`` face share this encoder."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        # same encoder expression as telemetry_frames_to_json
        # (microsecond timestamps)
        F.to_json(
            F.struct(*[f.name for f in TELEMETRY_SCHEMA.fields]),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int")
        .alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def parse_telemetry_payload(df: DataFrame,
                            value_col: str = "value") -> DataFrame:
    """Decode a broker frame column (binary/string JSON) into the
    telemetry schema. This is the kafka/mqtt-bridge wire format: one
    JSON object per message. Malformed frames surface as all-null
    rows with the raw frame retained in ``_corrupt`` for a dead-letter
    sink, never a thrown task (a poison message must not kill a 100-TB
    stream)."""
    raw = F.col(value_col).cast("string")
    # default ISO-8601 timestamp handling round-trips microsecond
    # precision through to_json/from_json
    parsed = F.from_json(raw, TELEMETRY_SCHEMA, {"mode": "PERMISSIVE"})
    return df.select(
        parsed.alias("m"), raw.alias("_raw")
    ).select(
        "m.*",
        F.when(F.col("m.event_id").isNull(), F.col("_raw")).alias("_corrupt"),
    )


def telemetry_frames_to_json(events: DataFrame) -> DataFrame:
    """Inverse of :func:`parse_telemetry_payload` -- encode telemetry
    rows as broker frames (``value`` JSON bytes). Used by tests to
    round-trip the wire format and by producers feeding the bridge."""
    return events.select(
        F.to_json(
            F.struct(*[f.name for f in TELEMETRY_SCHEMA.fields]),
            # microsecond precision: to_json's default truncates to
            # millis, which would corrupt event-time ordering on replay
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).cast("binary").alias("value")
    )


def telemetry_stream(
    spark: SparkSession,
    source: str = "files",
    path: str | None = None,
    brokers: str | None = None,
    topic: str | None = None,
    rate_rows_per_second: int = 100,
) -> DataFrame:
    """Build the telemetry stream from the configured wire. Returns a
    streaming DataFrame with :data:`TELEMETRY_SCHEMA` columns (the
    ``jsonl``/``kafka`` faces add ``_corrupt`` for dead-lettering);
    every downstream plan is source-agnostic."""
    if source == "files":
        if not path:
            raise ValueError("files source requires path=")
        return spark.readStream.schema(TELEMETRY_SCHEMA).parquet(path)
    if source == "jsonl":
        if not path:
            raise ValueError("jsonl source requires path=")
        frames = spark.readStream.text(path)
        return parse_telemetry_payload(frames, "value")
    if source == "rate":
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rate_rows_per_second)).load()
        )
        return rate.select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            F.pmod("value", F.lit(16)).cast("long").alias("user_id"),
            F.lit("heartbeat").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    if source == "kafka_replay":
        # recorded-frame replay (r9): a parquet archive of frames in
        # the EXACT kafka wire schema drives the identical
        # parse_telemetry_payload path the live connector feeds --
        # the in-container integration proof for the kafka face (only
        # the jar/TCP boundary remains untested), and the standard
        # replay/backfill path for archived topic dumps at scale
        if not path:
            raise ValueError("kafka_replay source requires path=")
        frames = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(path)
        return parse_telemetry_payload(frames, "value")
    if source == "kafka":
        if not (brokers and topic):
            raise ValueError("kafka source requires brokers= and topic=")
        try:
            frames = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", brokers)
                .option("subscribe", topic)
                .option("startingOffsets", "earliest")
                .load()
            )
        except Exception as e:  # connector jar absent in this container
            raise RuntimeError(
                "kafka source unavailable: add the connector package "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "(--packages / spark.jars.packages, or set "
                "SPARK_GRAFT_EXTRA_PACKAGES before session start); full "
                "enablement runbook incl. the MQTT->Kafka bridge: "
                "docs/KAFKA.md. The telemetry plans themselves are "
                "source-agnostic -- kafka_replay exercises the same "
                "parse path from recorded frames"
            ) from e
        return parse_telemetry_payload(frames, "value")
    raise ValueError(f"unknown telemetry source: {source!r}")
