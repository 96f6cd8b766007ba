"""Smoke + invariant tests for the query registry at sf0.001.

The full oracle-differential gate is tools/check_oracle.py (and the
driver's CORRECTNESS run at sf0.01); these tests assert structural
invariants cheaply so pytest stays fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from group5_spark.queries import ORACLES, QUERIES


def test_registry_shape():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 20


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_nonempty_schema(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    # every query must be collectable at sf0.001
    df.limit(5).collect()


def test_funnel_monotone(spark, sf_dir):
    row = QUERIES["funnel_steps"](spark, sf_dir).collect()[0]
    assert row.step_view >= row.step_view_click >= row.step_view_click_purchase


def test_daily_revenue_reconciles(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = QUERIES["daily_revenue"](spark, sf_dir)
    total_daily = daily.agg(F.sum("revenue").alias("t")).collect()[0].t
    from group5_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    total_orders = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t")
    ).collect()[0].t
    assert total_daily == total_orders
