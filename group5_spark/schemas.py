"""Explicit StructType schemas for every entity the engine handles.

The reference infers schemas on every read (``etl_job.py:24,91`` uses
``spark.read.json`` with no schema — an extra full scan plus sampling
nondeterminism on sparse columns). This engine declares schemas once:
schema-on-read is eliminated, sparse conditional fields are stable
nullable columns, and the scan can prune to exactly the referenced
columns.

Entity shapes follow the reference producers (ground truth for the
wire format): ``user_events_producer.py:77-99`` for user events,
``transaction_events_producer.py:73-145`` for transactions (nested
``line_items`` array + two address structs), ``Assets/data/*.json``
for the two dimensions.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------
# StreamFlow wire-format schemas (bronze: types as produced — doubles
# for money, strings for timestamps; silver applies typing).
# --------------------------------------------------------------------

# user_events_producer.py:77-89 base fields; 91-98 conditional fields
# (nullable: present only for some event types).
USER_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("session_id", StringType(), True),
        StructField("event_type", StringType(), False),
        StructField("timestamp", StringType(), False),
        StructField("page", StringType(), True),
        StructField("device", StringType(), True),
        StructField("browser", StringType(), True),
        StructField("ip_address", StringType(), True),
        StructField("country", StringType(), True),
        StructField("city", StringType(), True),
        # Conditional (sparse) fields — user_events_producer.py:91-98.
        StructField("search_query", StringType(), True),
        StructField("element_id", StringType(), True),
        StructField("product_id", StringType(), True),
        StructField("quantity", IntegerType(), True),
    ]
)

# transaction_events_producer.py:83-90 — one line item.
LINE_ITEM_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), False),
        StructField("product_name", StringType(), True),
        StructField("category", StringType(), True),
        StructField("brand", StringType(), True),
        StructField("quantity", IntegerType(), False),
        StructField("unit_price", DoubleType(), False),
    ]
)

# transaction_events_producer.py:126-139 — billing/shipping address.
ADDRESS_SCHEMA = StructType(
    [
        StructField("street", StringType(), True),
        StructField("city", StringType(), True),
        StructField("state", StringType(), True),
        StructField("zip", StringType(), True),
        StructField("country", StringType(), True),
    ]
)

# transaction_events_producer.py:114-145.
TRANSACTION_SCHEMA = StructType(
    [
        StructField("transaction_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("transaction_type", StringType(), False),
        StructField("timestamp", StringType(), False),
        StructField("status", StringType(), True),
        StructField("payment_method", StringType(), True),
        StructField("currency", StringType(), True),
        StructField("subtotal", DoubleType(), True),
        StructField("tax", DoubleType(), True),
        StructField("total", DoubleType(), True),
        StructField("line_items", ArrayType(LINE_ITEM_SCHEMA), True),
        StructField("billing_address", ADDRESS_SCHEMA, True),
        StructField("shipping_address", ADDRESS_SCHEMA, True),
        # Refund/chargeback back-reference —
        # transaction_events_producer.py:142-143.
        StructField("original_transaction_id", StringType(), True),
    ]
)

# Assets/data/customers.json (1,000 records; field list at
# Stream_Analytics_Phase_2.md:93).
CUSTOMER_DIM_SCHEMA = StructType(
    [
        StructField("user_id", StringType(), False),
        StructField("email", StringType(), True),
        StructField("first_name", StringType(), True),
        StructField("last_name", StringType(), True),
        StructField("registration_date", StringType(), True),
        StructField("account_type", StringType(), True),
        StructField("date_of_birth", StringType(), True),
        StructField("loyalty_points", IntegerType(), True),
        StructField("state", StringType(), True),
    ]
)

# Assets/data/products.json (2,000 records; Stream_Analytics_Phase_2.md:90).
PRODUCT_DIM_SCHEMA = StructType(
    [
        StructField("product_id", StringType(), False),
        StructField("product_name", StringType(), True),
        StructField("description", StringType(), True),
        StructField("category", StringType(), True),
        StructField("subcategory", StringType(), True),
        StructField("brand", StringType(), True),
        StructField("manufacturer", StringType(), True),
        StructField("msrp", DoubleType(), True),
        StructField("cost_price", DoubleType(), True),
        StructField("created_date", StringType(), True),
        StructField("is_active", BooleanType(), True),
    ]
)

# Silver-layer typed variants: money → DECIMAL(12,2), ISO strings →
# timestamp/date (SURVEY §1.5 mapping).
MONEY = DecimalType(12, 2)

SILVER_TYPES = {
    "subtotal": MONEY,
    "tax": MONEY,
    "total": MONEY,
    "unit_price": MONEY,
    "msrp": MONEY,
    "cost_price": MONEY,
    "registration_date": DateType(),
    "date_of_birth": DateType(),
    "created_date": DateType(),
}

# Timestamp format emitted by both producers
# (user_events_producer.py:82): 2026-01-09T01:02:40.276090Z
ISO_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
