"""Gold-zone ETL, reference-parity surface (SURVEY §2 A4-A13, §3.2).

Produces the exact output shapes of the reference's ``etl_job.py``:
- transactions: explode ``line_items`` + 24-column flatten
  (``etl_job.py:29-64``) — one row per line item, addresses flattened
  to ``billing_*`` / ``shipping_*``;
- user events: 13-column projection incl. sparse fields
  (``etl_job.py:99-113``).

Fixes folded in (SURVEY §2.C): no ``purchase_df`` scope bug (each
entity is independent), one action per output (cache-free single
pass instead of count+write+head re-execution), ``coalesce(1)`` only
behind ``single_file=True`` (the reference forces it always —
O(1)-parallelism at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group5_spark.sources.landing import read_transactions, read_user_events

TRANSACTION_COLUMNS = [
    "transaction_id",
    "user_id",
    "transaction_type",
    "timestamp",
    "status",
    "payment_method",
    "currency",
    "subtotal",
    "tax",
    "total",
    "product_id",
    "product_name",
    "category",
    "brand",
    "quantity",
    "unit_price",
    "billing_street",
    "billing_city",
    "billing_state",
    "billing_zip",
    "billing_country",
    "shipping_city",
    "shipping_country",
    "original_transaction_id",
]

USER_EVENT_COLUMNS = [
    "event_id",
    "user_id",
    "session_id",
    "event_type",
    "timestamp",
    "page",
    "device",
    "browser",
    "country",
    "city",
    "product_id",
    "quantity",
    "search_query",
]


def flatten_transactions(df: DataFrame) -> DataFrame:
    """Explode line_items and flatten to the 24-column gold shape
    (parity with ``etl_job.py:29-64``)."""
    item = df.withColumn("item", F.explode("line_items"))
    return item.select(
        "transaction_id",
        "user_id",
        "transaction_type",
        "timestamp",
        "status",
        "payment_method",
        "currency",
        "subtotal",
        "tax",
        "total",
        F.col("item.product_id").alias("product_id"),
        F.col("item.product_name").alias("product_name"),
        F.col("item.category").alias("category"),
        F.col("item.brand").alias("brand"),
        F.col("item.quantity").alias("quantity"),
        F.col("item.unit_price").alias("unit_price"),
        F.col("billing_address.street").alias("billing_street"),
        F.col("billing_address.city").alias("billing_city"),
        F.col("billing_address.state").alias("billing_state"),
        F.col("billing_address.zip").alias("billing_zip"),
        F.col("billing_address.country").alias("billing_country"),
        F.col("shipping_address.city").alias("shipping_city"),
        F.col("shipping_address.country").alias("shipping_country"),
        "original_transaction_id",
    )


def project_user_events(df: DataFrame) -> DataFrame:
    """13-column user-event projection (parity with ``etl_job.py:99-113``)."""
    return df.select(*USER_EVENT_COLUMNS)


def write_gold_zone(
    df: DataFrame, path: str, fmt: str = "parquet", single_file: bool = False
) -> None:
    """Gold-zone sink (A9-A10): Parquet primary, CSV for reference
    parity, ORC/JSON via the format router; overwrite mode keeps
    re-runs idempotent."""
    from group5_spark.sources.formats import write_table

    write_table(df, path, fmt=fmt, single_file=single_file)


def _date_filter(df: DataFrame, date: str | None) -> DataFrame:
    """B18 backfill filter: keep events whose ISO timestamp falls on
    ``date`` (YYYY-MM-DD). The payload timestamps are UTC ISO-8601
    strings, so a lexicographic prefix match is exact and sargable."""
    if date is None:
        return df
    return df.filter(F.col("timestamp").startswith(date))


def run_etl(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    fmt: str = "parquet",
    single_file: bool = False,
    date: str | None = None,
) -> dict[str, int]:
    """The reference's ``run_etl`` contract (``etl_job.py:8-129``):
    per-entity read → transform → write, tolerating missing sources.
    Returns row counts per entity (telemetry, A7). ``date`` restricts
    the run to one event day (backfill, B18)."""
    counts: dict[str, int] = {}

    txn = read_transactions(spark, input_dir)
    if txn is not None:
        flat = flatten_transactions(_date_filter(txn, date))
        write_gold_zone(flat, f"{output_dir}/transactions", fmt, single_file)
        counts["transactions"] = spark.read.format(fmt).options(
            **({"header": True} if fmt == "csv" else {})
        ).load(f"{output_dir}/transactions").count()

    ue = read_user_events(spark, input_dir)
    if ue is not None:
        proj = project_user_events(_date_filter(ue, date))
        write_gold_zone(proj, f"{output_dir}/user_events", fmt, single_file)
        counts["user_events"] = spark.read.format(fmt).options(
            **({"header": True} if fmt == "csv" else {})
        ).load(f"{output_dir}/user_events").count()
    return counts


def validate_outputs(output_dir: str, fmt: str = "parquet") -> list[str]:
    """Output validation (A21): recursive scan for data files, raises
    FileNotFoundError when none exist (parity with
    ``dag_streamflow.py:27-40``)."""
    from pathlib import Path

    ext = ".csv" if fmt == "csv" else ".parquet"
    files = [str(p) for p in Path(output_dir).rglob(f"*{ext}")]
    if not files:
        raise FileNotFoundError(f"no {ext} outputs under {output_dir}")
    return files
