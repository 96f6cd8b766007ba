"""End-to-end pipeline test (SURVEY §5.2 plan #3-#4): generator →
landing NDJSON → ETL → bronze → silver → gold → measures, asserting
the reference's data invariants and idempotency."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from group5_spark.etl import run_etl, validate_outputs
from group5_spark.functions import measures
from group5_spark.generator import events as gen
from group5_spark.medallion.gold import refresh_gold
from group5_spark.medallion.silver import refresh_silver
from group5_spark.sources.bronze import build_bronze
from group5_spark.sources.landing import write_ndjson_batch

N_USER_EVENTS = 800
N_TXN = 300


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wh")
    landing = str(root / "landing")
    wh = str(root / "warehouse")
    customers = gen.make_customers(100)
    products = gen.make_products(150)
    ue = gen.make_user_events(N_USER_EVENTS, customers, products)
    txn = gen.make_transactions(N_TXN, customers, products)
    write_ndjson_batch(ue, "user_events", landing, batch_ts=1)
    write_ndjson_batch(txn, "transaction_events", landing, batch_ts=1)
    run_etl(spark, landing, f"{wh}/goldzone")
    build_bronze(spark, landing, wh)
    refresh_silver(spark, wh)
    refresh_gold(spark, wh)
    return {
        "landing": landing,
        "wh": wh,
        "customers": customers,
        "products": products,
        "ue": ue,
        "txn": txn,
    }


def g(spark, warehouse, table):
    return spark.read.parquet(os.path.join(warehouse["wh"], "gold", table))


def test_etl_parity_shapes(spark, warehouse):
    tx = spark.read.parquet(f"{warehouse['wh']}/goldzone/transactions")
    assert len(tx.columns) == 24  # etl_job.py:31-64 parity
    n_items = sum(len(t["line_items"]) for t in warehouse["txn"])
    assert tx.count() == n_items  # one row per line item
    ue = spark.read.parquet(f"{warehouse['wh']}/goldzone/user_events")
    assert len(ue.columns) == 13  # etl_job.py:99-113 parity
    assert ue.count() == N_USER_EVENTS
    assert validate_outputs(f"{warehouse['wh']}/goldzone")


def test_bronze_lineage(spark, warehouse):
    bronze = spark.read.parquet(f"{warehouse['wh']}/bronze/raw_transactions")
    assert bronze.columns == ["raw_payload", "source_file", "load_ts"]
    assert bronze.count() == N_TXN
    assert bronze.filter(F.col("source_file").contains("transaction_events_batch")).count() == N_TXN


def test_silver_counts_and_types(spark, warehouse):
    stx = spark.read.parquet(f"{warehouse['wh']}/silver/stg_transactions")
    assert stx.count() == N_TXN  # dedup no-op on unique ids
    types = dict(stx.dtypes)
    assert types["total"] == "decimal(12,2)"
    assert types["txn_ts"] == "timestamp"
    sue = spark.read.parquet(f"{warehouse['wh']}/silver/stg_user_events")
    assert sue.count() == N_USER_EVENTS
    # sparse conditional columns survive as nullable
    assert sue.filter(F.col("search_query").isNotNull()).count() > 0
    assert sue.filter(F.col("quantity").isNotNull()).count() > 0


def test_fk_containment(spark, warehouse):
    """A20 invariant: every event user_id resolves to a customer."""
    sue = spark.read.parquet(f"{warehouse['wh']}/silver/stg_user_events")
    valid = {c["user_id"] for c in warehouse["customers"]}
    bad = sue.filter(~F.col("user_id").isin(list(valid))).count()
    assert bad == 0


def test_money_invariants(spark, warehouse):
    """subtotal = Σ qty×unit_price (±0.01); total = subtotal+tax;
    refund/chargeback totals ≤ 0 (SURVEY §1.3)."""
    stx = spark.read.parquet(f"{warehouse['wh']}/silver/stg_transactions")
    items = spark.read.parquet(f"{warehouse['wh']}/silver/stg_transaction_items")
    recomputed = items.groupBy("transaction_id").agg(
        F.sum("line_total").alias("sum_items")
    )
    joined = stx.join(recomputed, "transaction_id")
    drift = joined.filter(
        F.abs(F.col("subtotal").cast("double") - F.col("sum_items").cast("double"))
        > 0.011
    ).count()
    assert drift == 0
    neg = stx.filter(
        F.col("transaction_type").isin("refund", "chargeback") & (F.col("total") > 0)
    ).count()
    assert neg == 0
    pos_mismatch = stx.filter(
        (F.col("transaction_type") == "purchase")
        & (F.abs((F.col("subtotal") + F.col("tax") - F.col("total")).cast("double")) > 0.011)
    ).count()
    assert pos_mismatch == 0


def test_gold_reconciliation(spark, warehouse):
    """agg_daily_revenue totals equal fact_transactions sums (SURVEY §5.2)."""
    fact = g(spark, warehouse, "fact_transactions")
    agg = g(spark, warehouse, "agg_daily_revenue")
    t1 = fact.agg(F.sum("total")).collect()[0][0]
    t2 = agg.agg(F.sum("gross_revenue")).collect()[0][0]
    assert t1 == t2
    # dim_date covers every fact date
    dd = g(spark, warehouse, "dim_date").select(F.col("date_key")).distinct()
    uncovered = fact.select("date_key").distinct().join(
        dd, "date_key", "left_anti"
    ).count()
    assert uncovered == 0


def test_measures_run(spark, warehouse):
    fact_txn = g(spark, warehouse, "fact_transactions")
    fact_items = g(spark, warehouse, "fact_transaction_items")
    fact_act = g(spark, warehouse, "fact_user_activity")
    dd = g(spark, warehouse, "dim_date")

    rev = measures.total_revenue(fact_txn).collect()[0].total_revenue
    assert rev is not None
    aov = measures.avg_order_value(fact_txn).collect()[0]
    assert aov.aov is not None and aov.n_orders > 0
    top = measures.top_n_products(fact_items, 5).collect()
    assert 0 < len(top) <= 5 and top[0].rank == 1
    fn = measures.funnel(fact_act).collect()[0]
    assert fn.viewed >= fn.carted >= fn.checked_out
    conv = measures.conversion_rate(fact_act, fact_txn).collect()[0]
    assert conv.active_users > 0
    cat = measures.category_revenue(fact_items)
    pct_sum = cat.agg(F.round(F.sum("pct_of_total"), 3)).collect()[0][0]
    assert abs(pct_sum - 1.0) < 0.01
    mtd = measures.mtd_revenue(fact_txn, dd)
    assert mtd.count() > 0
    kpi = measures.kpi_cards(fact_txn, fact_act).collect()[0]
    assert kpi.events == N_USER_EVENTS


def test_idempotent_rerun(spark, warehouse):
    """Overwrite semantics: re-running silver+gold yields identical counts."""
    c1 = refresh_silver(spark, warehouse["wh"])
    c2 = refresh_silver(spark, warehouse["wh"])
    assert c1 == c2
    g1 = refresh_gold(spark, warehouse["wh"])
    g2 = refresh_gold(spark, warehouse["wh"])
    assert g1 == g2


def test_generator_determinism():
    a = gen.make_transactions(50, gen.make_customers(10), gen.make_products(10))
    b = gen.make_transactions(50, gen.make_customers(10), gen.make_products(10))
    assert a == b


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """B16: two tables bucketed on the same key with the same bucket
    count join without any shuffle exchange."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.gold import save_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    save_bucketed(left, "bkt_left", "k", n_buckets=4, sort_by="k")
    save_bucketed(right, "bkt_right", "k", n_buckets=4, sort_by="k")
    try:
        j = (
            spark.table("bkt_left")
            .hint("merge")
            .join(spark.table("bkt_right"), "k")
        )
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_silver_quarantines_malformed_rows(spark, tmp_path):
    """Malformed bronze payloads must land in quarantine with lineage,
    not silently vanish (bronze.py contract)."""
    import json

    from group5_spark.medallion.silver import stg_user_events
    from group5_spark.sources.bronze import build_bronze

    landing = tmp_path / "landing"
    landing.mkdir()
    good = {"event_id": "e1", "user_id": "u1", "session_id": "s", "event_type": "login",
            "timestamp": "2026-01-02T00:00:00.000000Z", "page": "p", "device": "d",
            "browser": "b", "ip_address": "i", "country": "US", "city": "c"}
    (landing / "user_events_batch_1.json").write_text(
        json.dumps(good) + "\nthis is not json\n"
    )
    wh = str(tmp_path / "wh")
    counts = build_bronze(spark, str(landing), wh)
    assert counts["raw_user_events"] == 2  # bad line still in bronze
    silver_df = stg_user_events(spark, wh)
    assert silver_df.count() == 1
    q = spark.read.parquet(f"{wh}/silver/_quarantine/stg_user_events")
    assert q.count() == 1
    assert "source_file" in q.columns


def test_bronze_skips_missing_source(spark, tmp_path):
    """A source glob with no files is a skip (count 0), not a crash."""
    from group5_spark.sources.bronze import build_bronze

    landing = tmp_path / "empty_landing"
    landing.mkdir()
    counts = build_bronze(spark, str(landing), str(tmp_path / "wh2"))
    assert counts == {"raw_user_events": 0, "raw_transactions": 0}


def test_etl_date_backfill_filter(spark, tmp_path):
    """--date restricts the ETL run to one event day (B18)."""
    from group5_spark.etl import run_etl
    from group5_spark.generator import events as gen
    from group5_spark.sources.landing import write_ndjson_batch

    customers = gen.make_customers(10)
    products = gen.make_products(10)
    ue = gen.make_user_events(50, customers, products)
    # all generated events share a recent date range; pick the date of
    # the first event and expect only that day's rows
    target = ue[0]["timestamp"][:10]
    n_target = sum(1 for e in ue if e["timestamp"].startswith(target))
    landing = str(tmp_path / "landing")
    write_ndjson_batch(ue, "user_events", landing, batch_ts=1)
    counts = run_etl(spark, landing, str(tmp_path / "gold"), date=target)
    assert counts["user_events"] == n_target > 0
