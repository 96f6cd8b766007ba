"""Materialized-view rewrite (plans/mv.py): summary-table matching,
partial-state re-aggregation soundness, derived AVG, and refusal for
non-decomposable or unmatched shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from group5_spark.catalog import load_table
from group5_spark.plans.mv import MVCatalog


@pytest.fixture()
def catalog(spark, sf_dir, tmp_path):
    cat = MVCatalog()
    mv = cat.register(
        name="orders_by_date_status",
        source="orders",
        group_cols=["o_orderdate", "o_orderstatus"],
        measures={
            "sum_total": ("sum", "o_totalprice"),
            "n_orders": ("count", "*"),
            "n_total": ("count", "o_totalprice"),
            "max_total": ("max", "o_totalprice"),
        },
        path=str(tmp_path / "mv_orders"),
    )
    cat.build(load_table(spark, sf_dir, "orders"), mv)
    return cat


def _rows(df, keys):
    return {
        tuple(r[k] for k in keys): tuple(
            round(float(v), 4) if v is not None else None
            for k2, v in r.asDict().items() if k2 not in keys
        )
        for r in df.collect()
    }


def test_exact_grain_served_from_mv(spark, sf_dir, catalog):
    orders = load_table(spark, sf_dir, "orders")
    measures = {"rev": ("sum", "o_totalprice"), "n": ("count", "*")}
    got, used = catalog.aggregate(
        spark, "orders", ["o_orderdate", "o_orderstatus"], measures, orders
    )
    assert used == "orders_by_date_status"
    # the plan must scan the summary, not the base table
    assert all("mv_orders" in f for f in got.inputFiles())
    want = orders.groupBy("o_orderdate", "o_orderstatus").agg(
        F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")
    )
    assert _rows(got, ["o_orderdate", "o_orderstatus"]) == _rows(
        want, ["o_orderdate", "o_orderstatus"]
    )


def test_coarser_grain_rolls_up_partials(spark, sf_dir, catalog):
    orders = load_table(spark, sf_dir, "orders")
    measures = {
        "rev": ("sum", "o_totalprice"),
        "n": ("count", "*"),
        "mx": ("max", "o_totalprice"),
    }
    got, used = catalog.aggregate(
        spark, "orders", ["o_orderstatus"], measures, orders
    )
    assert used == "orders_by_date_status"
    want = orders.groupBy("o_orderstatus").agg(
        F.sum("o_totalprice").alias("rev"),
        F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("mx"),
    )
    assert _rows(got, ["o_orderstatus"]) == _rows(want, ["o_orderstatus"])


def test_avg_derived_from_sum_and_count(spark, sf_dir, catalog):
    orders = load_table(spark, sf_dir, "orders")
    got, used = catalog.aggregate(
        spark, "orders", ["o_orderstatus"],
        {"aov": ("avg", "o_totalprice")}, orders,
    )
    assert used == "orders_by_date_status"
    want = orders.groupBy("o_orderstatus").agg(
        F.avg("o_totalprice").alias("aov")
    )
    assert _rows(got, ["o_orderstatus"]) == _rows(want, ["o_orderstatus"])


def test_avg_refused_without_same_column_count(spark, tmp_path):
    """Regression: an MV carrying sum + ROW count must NOT serve AVG —
    F.avg ignores NULLs, so sum/rowcount is wrong on nullable columns.
    The matcher requires a ("count", col) measure of the same column."""
    base = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("b", 4.0), ("b", 2.0)],
        "k string, v double",
    )
    cat = MVCatalog()
    mv = cat.register(
        name="rowcount_only", source="t", group_cols=["k"],
        measures={"s": ("sum", "v"), "n": ("count", "*")},
        path=str(tmp_path / "mv_rowcount"),
    )
    cat.build(base, mv)
    got, used = cat.aggregate(
        spark, "t", ["k"], {"a": ("avg", "v")}, base
    )
    assert used is None  # refused: no non-null count of v
    vals = {r["k"]: r["a"] for r in got.collect()}
    # base-path AVG ignores the NULL: 10.0, not 5.0 (= sum/rowcount)
    assert vals["a"] == 10.0 and vals["b"] == 3.0

    # with ("count", col) materialized the rewrite is allowed and
    # matches NULL-ignoring AVG semantics exactly
    mv2 = cat.register(
        name="colcount", source="t", group_cols=["k"],
        measures={"s": ("sum", "v"), "nv": ("count", "v")},
        path=str(tmp_path / "mv_colcount"),
    )
    cat.build(base, mv2)
    got2, used2 = cat.aggregate(
        spark, "t", ["k"], {"a": ("avg", "v")}, base
    )
    assert used2 == "colcount"
    vals2 = {r["k"]: float(r["a"]) for r in got2.collect()}
    assert vals2["a"] == 10.0 and vals2["b"] == 3.0


def test_unmatched_shapes_fall_back_to_base(spark, sf_dir, catalog):
    orders = load_table(spark, sf_dir, "orders")
    # grouping col outside the MV grain
    got, used = catalog.aggregate(
        spark, "orders", ["o_custkey"],
        {"rev": ("sum", "o_totalprice")}, orders,
    )
    assert used is None
    # measure the MV doesn't carry
    got2, used2 = catalog.aggregate(
        spark, "orders", ["o_orderstatus"],
        {"mn": ("min", "o_totalprice")}, orders,
    )
    assert used2 is None
    assert got.count() > 0 and got2.count() > 0


def test_non_decomposable_measures_rejected_at_registration(tmp_path):
    cat = MVCatalog()
    with pytest.raises(ValueError, match="not decomposable"):
        cat.register(
            "bad", "orders", ["o_orderdate"],
            {"users": ("count_distinct", "o_custkey")},
            str(tmp_path / "bad"),
        )


def test_filtered_mv_subsumption_serves_tighter_predicate(
    spark, sf_dir, tmp_path
):
    """An MV filtered to o_year >= 1996 serves a query filtered to
    o_year >= 1997: the residual applies on the summary (grouping
    column), and the plan reads ONLY the MV parquet."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    cat = MVCatalog()
    mv = cat.register(
        name="recent_years",
        source="orders",
        group_cols=["o_year", "o_orderstatus"],
        measures={"s": ("sum", "o_totalprice"), "n": ("count", "*")},
        path=str(tmp_path / "mv_recent"),
        predicate=[("o_year", ">=", 1996)],
    )
    cat.build(orders, mv)
    got, used = cat.aggregate(
        spark, "orders", ["o_orderstatus"],
        {"rev": ("sum", "o_totalprice"), "n": ("count", "*")},
        orders, predicate=[("o_year", ">=", 1997)],
    )
    assert used == "recent_years"
    assert got.inputFiles() and all("mv_recent" in f for f in got.inputFiles())
    want = orders.filter(F.col("o_year") >= 1997).groupBy("o_orderstatus").agg(
        F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")
    )
    assert _rows(got, ["o_orderstatus"]) == _rows(want, ["o_orderstatus"])


def test_filtered_mv_refuses_looser_or_unanswerable_predicates(
    spark, sf_dir, tmp_path
):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    cat = MVCatalog()
    mv = cat.register(
        name="recent_years",
        source="orders",
        group_cols=["o_year"],
        measures={"s": ("sum", "o_totalprice")},
        path=str(tmp_path / "mv_recent2"),
        predicate=[("o_year", ">=", 1997)],
    )
    cat.build(orders, mv)
    # looser than the MV's filter: MV is missing 1996 rows → refuse,
    # and the base fallback must still apply the query predicate
    got, used = cat.aggregate(
        spark, "orders", ["o_year"], {"rev": ("sum", "o_totalprice")},
        orders, predicate=[("o_year", ">=", 1996)],
    )
    assert used is None
    want = orders.filter(F.col("o_year") >= 1996).groupBy("o_year").agg(
        F.sum("o_totalprice").alias("rev")
    )
    assert _rows(got, ["o_year"]) == _rows(want, ["o_year"])
    # residual on a non-grouped column is unanswerable post-agg → refuse
    _, used2 = cat.aggregate(
        spark, "orders", ["o_year"], {"rev": ("sum", "o_totalprice")},
        orders,
        predicate=[("o_year", ">=", 1998), ("o_orderstatus", "=", "F")],
    )
    assert used2 is None


def test_join_mv_serves_same_join_shape(spark, sf_dir, tmp_path):
    """A pre-joined star MV answers the same join shape (canonical
    order-insensitive signature) at a coarser grain, reading only the
    MV parquet — no fact scan, no join."""
    from group5_spark.plans.mv import join_source

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    cat = MVCatalog()
    mv = cat.register(
        name="star",
        source=join_source(["orders", "customer"], [("o_custkey", "c_custkey")]),
        group_cols=["c_mktsegment", "o_orderstatus"],
        measures={"s": ("sum", "o_totalprice"), "n": ("count", "*")},
        path=str(tmp_path / "mv_star"),
    )
    cat.build(joined, mv)
    # flipped table and key order canonicalizes to the same signature
    got, used = cat.aggregate(
        spark,
        join_source(["customer", "orders"], [("c_custkey", "o_custkey")]),
        ["c_mktsegment"],
        {"rev": ("sum", "o_totalprice"), "n": ("count", "*")},
        joined,
    )
    assert used == "star"
    assert got.inputFiles() and all("mv_star" in f for f in got.inputFiles())
    want = joined.groupBy("c_mktsegment").agg(
        F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")
    )
    assert _rows(got, ["c_mktsegment"]) == _rows(want, ["c_mktsegment"])
    # a different join shape (different key pair) does not match
    _, used2 = cat.aggregate(
        spark,
        join_source(["orders", "customer"], [("o_orderkey", "c_custkey")]),
        ["c_mktsegment"],
        {"rev": ("sum", "o_totalprice")},
        joined,
    )
    assert used2 is None


def test_mv_refreshes_incrementally_and_still_serves(spark, sf_dir, tmp_path):
    """The layers compose: an MV summary maintained by
    changed-partition-only refresh (medallion.incremental) keeps
    serving rewrites with post-refresh data — full rebuild never runs.
    """
    from group5_spark.medallion.incremental import refresh_aggregate

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "mv_daily")
    cat = MVCatalog()
    mv = cat.register(
        name="orders_daily",
        source="orders",
        group_cols=["o_orderdate"],
        measures={
            "sum_total": ("sum", "o_totalprice"),
            "n_orders": ("count", "*"),
        },
        path=path,
    )

    def build(df):
        return df.groupBy("o_orderdate").agg(
            F.sum("o_totalprice").alias("sum_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    # initial build partitioned by the grain column so incremental
    # refresh can swap single dates
    build(orders).write.partitionBy("o_orderdate").mode("overwrite").parquet(path)

    some_date = orders.select(F.min("o_orderdate")).first()[0]
    # simulate a late-arriving batch doubling that date's orders
    fact2 = orders.unionByName(
        orders.filter(F.col("o_orderdate") == some_date)
    )
    refresh_aggregate(
        spark, fact2, path, "o_orderdate", build, [some_date]
    )

    got, used = cat.aggregate(
        spark, "orders", ["o_orderdate"],
        {"n": ("count", "*")}, orders,
    )
    assert used == "orders_daily"
    rows = {str(r["o_orderdate"]): r["n"] for r in got.collect()}
    base = {
        str(r["o_orderdate"]): r["n"]
        for r in orders.groupBy("o_orderdate")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # refreshed date reflects the doubled batch; all others untouched
    assert rows[str(some_date)] == 2 * base[str(some_date)]
    for d, n in base.items():
        if d != str(some_date):
            assert rows[d] == n, d
