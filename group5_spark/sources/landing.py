"""Landing-zone NDJSON contract (SURVEY §2 A1-A3, A11, A15).

The reference's landing zone: one NDJSON file per consumed batch,
named ``{topic}_batch_{unix_ts}.json``, one JSON object per line
(``ingest_kafka_to_landing.py:55-70``). Readers split one glob into
per-entity reads by filename pattern (``etl_job.py:19,86``) and
tolerate missing sources (``etl_job.py:78-79``).

Differences from the reference, by design:
- explicit StructType schemas instead of inference (kills the extra
  scan + sampling nondeterminism, SURVEY §1.4);
- PERMISSIVE mode with a ``_corrupt_record`` column instead of
  silently skipping bad rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StringType, StructType
from pyspark.sql.utils import AnalysisException

from group5_spark.schemas import TRANSACTION_SCHEMA, USER_EVENT_SCHEMA


def write_ndjson_batch(
    records: list[dict], topic: str, landing_dir: str, batch_ts: int | None = None
) -> str:
    """Write one landing batch file: ``{topic}_batch_{ts}.json``,
    one JSON object per line (A15)."""
    os.makedirs(landing_dir, exist_ok=True)
    ts = batch_ts if batch_ts is not None else int(time.time())
    path = os.path.join(landing_dir, f"{topic}_batch_{ts}.json")
    with open(path, "w", encoding="utf-8") as fh:
        for rec in records:
            fh.write(json.dumps(rec) + "\n")
    return path


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == "_corrupt_record" for f in schema.fields):
        return schema
    return StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
    )


def read_landing(
    spark: SparkSession, glob: str, schema: StructType
) -> DataFrame | None:
    """Read landing NDJSON with an explicit schema; ``None`` when no
    files match (graceful missing-source skip, A11)."""
    try:
        return (
            spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(glob)
        )
    except AnalysisException:
        return None


def read_user_events(spark: SparkSession, landing_dir: str) -> DataFrame | None:
    """Per-entity read via filename pattern (A2): ``user_events_batch_*``."""
    return read_landing(
        spark, os.path.join(landing_dir, "user_events_batch_*.json"), USER_EVENT_SCHEMA
    )


def read_transactions(spark: SparkSession, landing_dir: str) -> DataFrame | None:
    """Per-entity read via filename pattern (A2): ``transaction_events_batch_*``."""
    return read_landing(
        spark,
        os.path.join(landing_dir, "transaction_events_batch_*.json"),
        TRANSACTION_SCHEMA,
    )
