"""Format router (sources/formats.py): round-trips, mandatory-schema
policy for text formats, and pushdown on the ORC backend."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from group5_spark.plans import inspect as I
from group5_spark.sources.formats import read_table, write_table

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
        StructField("day", DateType()),
    ]
)

ROWS = [
    Row(id=1, name="a", score=1.5, day=datetime.date(2026, 1, 1)),
    Row(id=2, name="b", score=-2.25, day=datetime.date(2026, 2, 2)),
    Row(id=3, name=None, score=None, day=None),
]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip_preserves_values(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert sorted(back.collect()) == sorted(df.collect())


def test_text_formats_require_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for fmt in ("json", "csv"):
        path = str(tmp_path / f"noschema_{fmt}")
        write_table(df, path, fmt=fmt)
        with pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, path, fmt=fmt)


def test_unknown_format_rejected(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(df, str(tmp_path / "x"), fmt="avro")


def test_orc_scan_pushes_filters_and_prunes(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("grp", F.col("id") % 10).withColumn(
        "payload", F.concat(F.lit("p"), F.col("id"))
    )
    path = str(tmp_path / "orc_push")
    write_table(df, path, fmt="orc")
    scan = read_table(spark, path, fmt="orc").filter(F.col("id") > 900).select(
        "id", "grp"
    )
    I.assert_filter_pushed(scan, "id")
    # 3 columns on disk, 2 read
    I.assert_scan_pruned(scan, table_cols=3, max_cols=2)
    assert scan.count() == 99


def test_partitioned_write_prunes_directories(spark, tmp_path):
    df = spark.range(0, 100).withColumn("part", (F.col("id") % 4).cast("string"))
    path = str(tmp_path / "orc_parts")
    write_table(df, path, fmt="orc", partition_by=["part"])
    scan = read_table(spark, path, fmt="orc").filter(F.col("part") == "2")
    plan = I.formatted_plan(scan)
    assert scan.count() == 25
    # partition filter never appears as a data filter — pruned at plan
    assert "PartitionFilters: [isnotnull(part" in plan or "part#" in plan
