"""Derived ``partsupp`` table: the part↔supplier bridge the driver's
testdata lacks, synthesized deterministically from ``part`` ×
``supplier`` so TPC-H Q2/Q11/Q20 run as real queries.

The derivation mirrors the public dbgen rule (each part is stocked by
exactly 4 suppliers, spread across the supplier keyspace at stride
S/4 so no supplier is hot) with closed-form availqty/supplycost in
place of dbgen's RNG streams — the formulas are integer arithmetic
over the two keys, so Spark and the DuckDB oracle (which builds the
SAME table via :data:`PARTSUPP_CTES`) agree bit-for-bit:

- ``ps_suppkey   = (p_partkey + j * floor(S/4)) % S``  for j ∈ 0..3
- ``ps_availqty  = (ps_partkey*7 + ps_suppkey*11) % 9999 + 1``
- ``ps_supplycost = ((ps_partkey*31 + ps_suppkey*17) % 100000)/100 + 1``

``supplycost`` is unique per part across its 4 suppliers (17·Δs ≢ 0
mod 100000 for any Δs < S), so MIN-cost-supplier queries have a
unique argmin and deterministic results.

At 100 TB: partsupp is 4× |part| rows — a mid-sized dimension built
with one broadcast of a 1-row supplier count and a 4-way map-side
explode; no shuffle, no RNG, reproducible on every executor.

Reference parity: beyond-reference (the reference has no part/supplier
bridge); shapes follow TPC-H's public spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group5_spark.catalog import load_table

__all__ = ["partsupp_df", "PARTSUPP_CTES"]

#: DuckDB CTE fragment building the identical table for oracle SQL.
#: Compose as ``f"WITH {PARTSUPP_CTES}, more AS (...) SELECT ..."``.
PARTSUPP_CTES = """
    sc AS (SELECT COUNT(*) AS s_count FROM supplier),
    ps0 AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + j * CAST(FLOOR(s_count / 4) AS BIGINT)) % s_count
                   AS ps_suppkey
        FROM part, sc, (SELECT UNNEST([0, 1, 2, 3]) AS j) js
    ),
    partsupp AS (
        SELECT ps_partkey,
               ps_suppkey,
               ((ps_partkey * 7 + ps_suppkey * 11) % 9999) + 1 AS ps_availqty,
               CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 AS DOUBLE)
                   / 100.0 + 1.0 AS ps_supplycost
        FROM ps0
    )
"""


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table as a DataFrame.

    Plan shape: part scan (1 column) × broadcast 1-row supplier count
    → 4-way posexplode — map-only, zero shuffles; Catalyst folds the
    arithmetic into whole-stage codegen.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_count = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("s_count"))
    )
    stride = F.floor(F.col("s_count") / 4).cast("long")
    return (
        part.crossJoin(F.broadcast(s_count))
        .select(
            "p_partkey",
            "s_count",
            F.explode(F.expr("array(0, 1, 2, 3)")).alias("j"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("j") * stride) % F.col("s_count"))
            .alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999)
                + 1
            ).alias("ps_availqty"),
            (
                ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000)
                .cast("double")
                / 100.0
                + 1.0
            ).alias("ps_supplycost"),
        )
    )
