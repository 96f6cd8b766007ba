"""Smoke + invariant tests for the query registry at sf0.001.

The full oracle-differential gate is tools/check_oracle.py (and the
driver's CORRECTNESS run at sf0.01); these tests assert structural
invariants cheaply so pytest stays fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from conftest import SF_DIR
from group5_spark.queries import ORACLES, QUERIES


def test_registry_shape():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 20


def test_check_window_first_and_oracle_gated():
    """The driver correctness-checks only the first 50 registered
    queries; every slot in that window must be oracle-gated (a
    rows-only entry there wastes a correctness slot) and the window
    must match the explicit priority list. Since round 8 there are NO
    rows-only exceptions: sketch_scale_stats was reworked onto the
    deterministic KMV+histogram sketches and carries an exact oracle
    like everything else (round-7 VERDICT #3)."""
    from group5_spark.queries import _CHECK_WINDOW

    names = list(QUERIES)
    assert len(_CHECK_WINDOW) == 50
    assert names[: len(_CHECK_WINDOW)] == _CHECK_WINDOW
    assert list(entrymod.queries())[:50] == _CHECK_WINDOW
    missing_oracle = [n for n in _CHECK_WINDOW if n not in ORACLES]
    assert not missing_oracle, missing_oracle


def test_every_registered_query_has_an_oracle():
    """Every registered query is exact-oracle-gated — no query ships
    on a rows-only check any more (count-free on purpose: the registry
    grows every round)."""
    missing = [n for n in QUERIES if n not in ORACLES]
    assert not missing, missing


def test_builtin_sketches_accuracy(spark):
    """The production approximate built-ins (HLL++
    approx_count_distinct, approx_percentile) stay within their
    advertised error of the exact aggregates on the test corpus —
    the showcase that sketch_scale_stats carried before round 8 moved
    it onto the deterministic (oracle-replayable) sketch family."""
    from pyspark.sql import functions as F

    from group5_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_percentile(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.05 * row.exact
    assert (
        abs(float(row.p50_approx) - float(row.p50_exact))
        <= 0.02 * float(row.p50_exact)
    )


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
    # daily revenue is emitted as double (canonical output type); the
    # re-sum of per-day doubles can differ from the exact decimal
    # total only by float accumulation error
    assert total_daily == pytest.approx(float(total_orders), rel=1e-12)
