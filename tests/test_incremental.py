"""Incremental aggregate maintenance (medallion.incremental):
changed-partition-only refresh equals the full rebuild."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from group5_spark.medallion.incremental import refresh_aggregate, replace_partitions


def _orders(spark, rows):
    return spark.createDataFrame(rows, ["okey", "d", "price"])


def _build(df):
    return df.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("price").cast("decimal(18,2)")).cast("decimal(18,2)").alias("rev"),
        F.count_distinct("okey").alias("n_keys"),  # non-subtractable agg
    )


BASE = [
    (1, "2024-01-01", 10.0),
    (2, "2024-01-01", 20.0),
    (3, "2024-01-02", 30.0),
    (4, "2024-01-03", 40.0),
]


def _read_agg(spark, path):
    return {
        str(r["d"]): (r["n_orders"], str(r["rev"]), r["n_keys"])
        for r in spark.read.parquet(path).collect()
    }


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    agg_path = str(tmp_path / "agg")
    _orders(spark, BASE).write.partitionBy("d").parquet(fact_path)
    full = _build(spark.read.parquet(fact_path))
    full.write.partitionBy("d").parquet(agg_path)

    # a change batch lands for 01-01 only: one new order
    batch = [(5, "2024-01-01", 5.0)]
    _orders(spark, batch).write.mode("append").partitionBy("d").parquet(fact_path)

    untouched = sorted(os.listdir(os.path.join(agg_path, "d=2024-01-03")))
    replaced = refresh_aggregate(
        spark,
        spark.read.parquet(fact_path),
        agg_path,
        "d",
        _build,
        ["2024-01-01"],
    )
    assert replaced == ["d=2024-01-01"]
    # other agg partitions physically untouched
    assert sorted(os.listdir(os.path.join(agg_path, "d=2024-01-03"))) == untouched

    # incremental result == full rebuild from the updated fact
    expect = {
        str(r["d"]): (r["n_orders"], str(r["rev"]), r["n_keys"])
        for r in _build(spark.read.parquet(fact_path)).collect()
    }
    assert _read_agg(spark, agg_path) == expect
    assert _read_agg(spark, agg_path)["2024-01-01"] == (3, "35.00", 3)


def test_replace_partitions_only_named(spark, tmp_path):
    path = str(tmp_path / "t")
    _orders(spark, BASE).write.partitionBy("d").parquet(path)
    fresh = _orders(spark, [(9, "2024-01-02", 99.0)])
    replaced = replace_partitions(spark, path, fresh, "d")
    assert replaced == ["d=2024-01-02"]
    got = {
        (str(r["d"]), r["okey"]) for r in spark.read.parquet(path).collect()
    }
    # 01-02 now holds only the fresh row; 01-01/01-03 untouched
    assert got == {
        ("2024-01-01", 1),
        ("2024-01-01", 2),
        ("2024-01-02", 9),
        ("2024-01-03", 4),
    }
