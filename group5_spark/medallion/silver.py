"""Silver layer: typed, deduplicated staging tables (SURVEY §2 B19-B22,
replacing the Snowflake MERGE at A29 with window-dedup + INSERT
OVERWRITE).

Bronze keeps raw JSON strings; silver applies explicit schemas
(``from_json``), casts money to DECIMAL(12,2), parses ISO-8601
timestamps, and dedups by natural key keeping the latest load — the
idempotent, re-runnable equivalent of the reference's Task-driven
MERGE chain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from group5_spark.schemas import (
    ISO_TS_FORMAT,
    MONEY,
    TRANSACTION_SCHEMA,
    USER_EVENT_SCHEMA,
)


def _dedup_latest(df: DataFrame, key: str, order_col: str = "load_ts") -> DataFrame:
    """Keep the most recently loaded row per natural key (A29).

    row_number over (partition by key order by load_ts desc) = 1 —
    one shuffle on the key; at scale this is the idempotency
    workhorse for re-runs and backfills.
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stg_user_events(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """B19: bronze raw_user_events → typed, event_id-deduped rows."""
    bronze = spark.read.parquet(os.path.join(warehouse_dir, "bronze", "raw_user_events"))
    parsed = bronze.select(
        F.from_json("raw_payload", USER_EVENT_SCHEMA).alias("p"),
        "source_file",
        "load_ts",
    ).select("p.*", "source_file", "load_ts")
    typed = parsed.withColumn(
        "event_ts", F.to_timestamp("timestamp", ISO_TS_FORMAT)
    ).withColumn("event_date", F.to_date(F.to_timestamp("timestamp", ISO_TS_FORMAT)))
    return _dedup_latest(typed.filter(F.col("event_id").isNotNull()), "event_id")


def stg_transactions(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """B20: transaction headers, typed; line_items kept nested here."""
    bronze = spark.read.parquet(
        os.path.join(warehouse_dir, "bronze", "raw_transactions")
    )
    parsed = bronze.select(
        F.from_json("raw_payload", TRANSACTION_SCHEMA).alias("p"),
        "source_file",
        "load_ts",
    ).select("p.*", "source_file", "load_ts")
    typed = (
        parsed.withColumn("txn_ts", F.to_timestamp("timestamp", ISO_TS_FORMAT))
        .withColumn("txn_date", F.to_date(F.to_timestamp("timestamp", ISO_TS_FORMAT)))
        .withColumn("subtotal", F.col("subtotal").cast(MONEY))
        .withColumn("tax", F.col("tax").cast(MONEY))
        .withColumn("total", F.col("total").cast(MONEY))
    )
    return _dedup_latest(typed.filter(F.col("transaction_id").isNotNull()), "transaction_id")


def stg_transaction_items(stg_txn: DataFrame) -> DataFrame:
    """B21: one row per line item ("flattened from nested products",
    ``Stream_Analytics_Phase_2.md:70,151``) — explode + struct flatten
    with DECIMAL unit_price and a derived line_total."""
    exploded = stg_txn.select(
        "transaction_id",
        "user_id",
        "transaction_type",
        "status",
        "txn_ts",
        "txn_date",
        F.posexplode_outer("line_items").alias("line_number", "item"),
    )
    return exploded.select(
        "transaction_id",
        "user_id",
        "transaction_type",
        "status",
        "txn_ts",
        "txn_date",
        "line_number",
        F.col("item.product_id").alias("product_id"),
        F.col("item.product_name").alias("product_name"),
        F.col("item.category").alias("category"),
        F.col("item.brand").alias("brand"),
        F.col("item.quantity").alias("quantity"),
        F.col("item.unit_price").cast(MONEY).alias("unit_price"),
        (F.col("item.quantity") * F.col("item.unit_price")).cast(MONEY).alias(
            "line_total"
        ),
    )


def stg_dimension(df: DataFrame, date_cols: list[str], money_cols: list[str]) -> DataFrame:
    """B22: typed dimension staging (dates + decimals)."""
    for c in date_cols:
        df = df.withColumn(c, F.to_date(c))
    for c in money_cols:
        df = df.withColumn(c, F.col(c).cast(MONEY))
    return df


def refresh_silver(spark: SparkSession, warehouse_dir: str) -> dict[str, int]:
    """Ordered silver refresh (A31 chain, silver stage): writes
    stg_user_events, stg_transactions, stg_transaction_items as
    Parquet, partitioned by event date for downstream pruning (B15).
    """
    counts = {}
    sue = stg_user_events(spark, warehouse_dir)
    sue.write.mode("overwrite").partitionBy("event_date").parquet(
        os.path.join(warehouse_dir, "silver", "stg_user_events")
    )
    counts["stg_user_events"] = sue.count()

    stx = stg_transactions(spark, warehouse_dir)
    stx.write.mode("overwrite").partitionBy("txn_date").parquet(
        os.path.join(warehouse_dir, "silver", "stg_transactions")
    )
    counts["stg_transactions"] = stx.count()

    items = stg_transaction_items(
        spark.read.parquet(os.path.join(warehouse_dir, "silver", "stg_transactions"))
    )
    items.write.mode("overwrite").partitionBy("txn_date").parquet(
        os.path.join(warehouse_dir, "silver", "stg_transaction_items")
    )
    counts["stg_transaction_items"] = items.count()
    return counts
