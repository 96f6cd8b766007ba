"""Streaming-native variants of the micro-batch pipeline (SURVEY §7
Phase S — beyond reference parity).

The reference deliberately avoids continuous streaming ("NOT
compatible with Airflow task execution",
``Stream_Analytics_Platform.md:11``) and uses a bounded poll + file
buffer instead. These jobs supersede that compromise with
``readStream`` + ``Trigger.AvailableNow``: each invocation drains
exactly the data available at start, checkpoints offsets, and
terminates — Airflow-compatible AND exactly-once, no NDJSON buffer.

Watermarked event-time windows provide the late-data semantics the
reference never had: counts/revenue per tumbling window keep state
bounded by the watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_landing(
    spark: SparkSession,
    glob: str,
    schema: StructType,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """File-source stream over the landing zone: new NDJSON batch
    files are discovered and processed incrementally — the streaming
    equivalent of the reference's 'glob everything each run'."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return reader.json(glob)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "event_ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window event counts (streaming B39):
    state per (window, event_type) is dropped once the watermark
    passes — bounded memory under unbounded input."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def windowed_revenue(
    transactions: DataFrame,
    ts_col: str = "txn_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked streaming daily-revenue (streaming B28)."""
    return (
        transactions.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.sum(F.col("total").cast("decimal(18,2)")).alias("gross_revenue"),
            F.count(F.lit(1)).alias("n_transactions"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "gross_revenue",
            "n_transactions",
        )
    )


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    output_table: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Execute a streaming DataFrame with Trigger.AvailableNow into an
    in-memory sink table, blocking until the drain completes.

    AvailableNow = process everything available, checkpoint, stop —
    the exactly-once replacement for the reference's bounded poll
    window (A14-A16): re-runs resume from the checkpoint instead of
    re-reading committed offsets.
    """
    query = (
        df.writeStream.format("memory")
        .queryName(output_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
