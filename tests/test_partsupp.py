"""Derived partsupp bridge (sources/partsupp.py): structural
invariants the Q2/Q11/Q20 family depends on, plus bit-equality with
the oracle-side CTE construction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from group5_spark.sources.partsupp import PARTSUPP_CTES, partsupp_df


def test_four_distinct_suppliers_per_part(spark, sf_dir):
    ps = partsupp_df(spark, sf_dir)
    per_part = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("n_supp"),
        F.countDistinct("ps_supplycost").alias("n_cost"),
    )
    bad = per_part.filter(
        (F.col("n") != 4) | (F.col("n_supp") != 4) | (F.col("n_cost") != 4)
    ).count()
    # 4 rows per part, all suppliers distinct, and supplycost distinct
    # within a part — the unique-argmin guarantee Q2 relies on
    assert bad == 0


def test_suppkeys_within_range_and_deterministic(spark, sf_dir):
    ps = partsupp_df(spark, sf_dir)
    from group5_spark.catalog import load_table

    n_sup = load_table(spark, sf_dir, "supplier").count()
    out_of_range = ps.filter(
        (F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_sup)
    ).count()
    assert out_of_range == 0
    # re-derivation is bit-identical (no RNG anywhere)
    a = sorted(map(tuple, partsupp_df(spark, sf_dir).collect()))
    b = sorted(map(tuple, ps.collect()))
    assert a == b


def test_matches_oracle_cte_bit_for_bit(spark, sf_dir):
    got = {
        (r["ps_partkey"], r["ps_suppkey"]): (r["ps_availqty"], r["ps_supplycost"])
        for r in partsupp_df(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = {
        (pk, sk): (aq, sc)
        for pk, sk, aq, sc in con.execute(
            f"WITH {PARTSUPP_CTES} SELECT * FROM partsupp"
        ).fetchall()
    }
    assert got == want
