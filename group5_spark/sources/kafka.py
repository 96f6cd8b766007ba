"""Kafka ingestion (SURVEY §2 A14, A16-A17) — gated behind import-try.

Two paths, both optional in this container (no broker, no kafka libs):

- ``consume_bounded``: parity with the reference's bounded poll-window
  consumer (``ingest_kafka_to_landing.py:21-51``): poll until a
  wall-clock deadline, write one NDJSON landing file, commit offsets
  only after a successful write (at-least-once, A16).
- ``read_kafka_batch`` / ``read_kafka_stream``: the Spark-native
  replacements — ``spark.read.format("kafka")`` bounded by offsets, or
  ``readStream`` with ``Trigger.AvailableNow`` (checkpointed
  exactly-once, superseding the file-buffer compromise).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

try:
    from kafka import KafkaConsumer  # type: ignore

    HAVE_KAFKA_PYTHON = True
except ImportError:
    HAVE_KAFKA_PYTHON = False


def consume_bounded(
    topic: str,
    batch_duration_sec: int,
    landing_dir: str,
    bootstrap_servers: str = "localhost:9094",
) -> int:
    """Bounded Kafka poll-window consume → NDJSON landing file.

    At-least-once: offsets commit only after the file write succeeds.
    Returns the number of messages written.
    """
    if not HAVE_KAFKA_PYTHON:
        raise NotImplementedError(
            "kafka-python not installed in this environment; "
            "use sources.landing.write_ndjson_batch with generated data, "
            "or the Spark-native read_kafka_batch."
        )
    from group5_spark.sources.landing import write_ndjson_batch

    consumer = KafkaConsumer(
        topic,
        bootstrap_servers=bootstrap_servers,
        value_deserializer=lambda b: json.loads(b.decode("utf-8")),
        group_id=f"{topic}_id",
        enable_auto_commit=False,
        auto_offset_reset="earliest",
    )
    deadline = time.monotonic() + batch_duration_sec
    messages: list[dict] = []
    while time.monotonic() < deadline:
        polled = consumer.poll(timeout_ms=1000)
        for records in polled.values():
            messages.extend(r.value for r in records)
    if messages:
        write_ndjson_batch(messages, topic, landing_dir)
        consumer.commit()
    consumer.close()
    return len(messages)


def read_kafka_batch(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    bootstrap_servers: str = "localhost:9094",
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Spark-native bounded Kafka read: value JSON parsed with an
    explicit schema, key kept (producer keys by user_id, A17)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), schema).alias("payload"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    ).select("kafka_key", "payload.*", "topic", "partition", "offset", "kafka_ts")


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    bootstrap_servers: str = "localhost:9094",
) -> DataFrame:
    """Structured Streaming Kafka source; pair with
    ``Trigger.AvailableNow`` + checkpointLocation at the sink for the
    exactly-once replacement of the reference's file buffer."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("payload")
    ).select("payload.*")
