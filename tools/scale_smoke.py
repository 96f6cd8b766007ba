"""Scale-up smoke: run headline aggregations on an N×-replicated
lineitem to probe how the plans behave beyond the bench SF.

The testdata tops out at sf0.1 (~600k lineitem rows, one parquet row
group → serial scans). This tool replicates lineitem in-memory via
``explode(sequence(1, N))`` — N× the rows WITHOUT N× the storage —
repartitions to restore scan parallelism, and times the core
aggregate/join/window shapes. It verifies the property that matters
for the 100 TB claim: the plans stay shuffle-bounded, so runtime
scales ~linearly in rows while partial-aggregate output stays tiny.

Usage: python tools/scale_smoke.py [replication] [sf_dir]
Prints one JSON line per query: name, rows_in, seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from group5_spark.catalog import load_table  # noqa: E402
from group5_spark.session import create_spark_session  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = create_spark_session("group5-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .drop("_r")
        .repartition(32)
        .persist()
    )
    rows = li.count()  # materialize once so timings measure the query

    def bench(name, df):
        start = time.perf_counter()
        df.count()
        print(json.dumps({
            "query": name,
            "rows_in": rows,
            "seconds": round(time.perf_counter() - start, 3),
        }))

    # Q1 shape: scan → 6-group agg
    bench(
        "pricing_summary_shape",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
            F.count(F.lit(1)).alias("n"),
        ),
    )
    # broadcast dim join + agg
    sup = load_table(spark, sf_dir, "supplier")
    bench(
        "dim_join_agg_shape",
        li.withColumnRenamed("l_suppkey", "s_suppkey")
        .join(F.broadcast(sup), "s_suppkey")
        .groupBy("s_nationkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")),
    )
    # keyed window: rank per order
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"))
    bench(
        "window_rank_shape",
        li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1),
    )
    # hot-key aggregation: 50% of rows forced onto ONE supplier key —
    # the shape AQE skew handling + two-phase partial aggregation must
    # absorb (partials collapse the hot key map-side, so the shuffle
    # stays balanced even though the key distribution isn't)
    skewed = li.withColumn(
        "s_key",
        F.when(F.rand(7) < 0.5, F.lit(1)).otherwise(F.col("l_suppkey")),
    )
    bench(
        "skewed_key_agg_shape",
        skewed.groupBy("s_key").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        ),
    )
    li.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
