"""Kafka source/sink wiring for the streaming operators.

Every op in :mod:`pgdedupe_spark.streaming.ops` is a transformation on an
unbounded DataFrame with the canonical event schema, so swapping the file
source for Kafka is ONLY a source change: ``read_events_kafka`` produces the
same columns `(event_id, event_time, user_id, event_type, value)` and every
downstream dedup/rollup/session/stateful op runs unchanged.

The payload codec (:func:`parse_event_payload` / :func:`event_payload`) is
pure DataFrame logic and is tested against batch frames shaped like Kafka's
wire schema (key/value binary) — no broker needed. The ``format("kafka")``
reader/writer construction requires the spark-sql-kafka package and a
broker, neither of which exists in this container, so those entry points
raise a clear error at ``.load()`` time in CI but are the production path
on a real cluster (100 TB/day ingest = Kafka partitions → Spark tasks;
parallelism is the topic's partition count, state/watermark semantics are
identical to the file source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical wire schema for the `events` payload (JSON in kafka value)
EVENT_PAYLOAD_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, value double"
)


def parse_event_payload(raw: DataFrame) -> DataFrame:
    """Kafka wire rows (binary key/value) → canonical event columns.

    ``ts`` arrives as epoch nanos (the driver's parquet convention, read as
    long); ``event_time`` is derived exactly like the file source does so
    stream/batch parity holds across sources. Malformed JSON yields NULL
    ``event_id`` rows, which are dropped (poison-pill tolerance — at scale
    route them to a dead-letter sink instead of failing the query)."""
    return (
        raw.select(
            F.from_json(F.col("value").cast("string"), EVENT_PAYLOAD_SCHEMA).alias("e")
        )
        .select(
            F.col("e.event_id").alias("event_id"),
            F.timestamp_micros(F.expr("e.ts DIV 1000")).alias("event_time"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
        )
        .filter(F.col("event_id").isNotNull())
    )


def event_payload(events: DataFrame) -> DataFrame:
    """Canonical event columns → Kafka wire rows: key = user_id (keeps a
    user's events in one partition → per-user ordering guarantees), value =
    JSON payload with ``ts`` restored to epoch nanos."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                (F.unix_micros(F.col("event_time")) * 1000).alias("ts"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
            )
        )
        .cast("binary")
        .alias("value"),
    )


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Production source: one Spark task per Kafka partition; backpressure
    via ``maxOffsetsPerTrigger``. Requires the spark-sql-kafka package."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_event_payload(reader.load())


def write_events_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Production sink: exactly-once into Kafka via the checkpointed sink.
    Returns the started StreamingQuery."""
    return (
        event_payload(events)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )
