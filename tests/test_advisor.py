"""Stats-driven join planning (plans/advisor.py): the decision rules
are unit-tested without Spark; the collect/apply halves are verified
against real frames and physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from group5_spark.catalog import load_table
from group5_spark.plans import inspect as I
from group5_spark.plans.advisor import (
    JoinAdvice,
    TableStats,
    advise_join,
    collect_stats,
    planned_join,
    stat_join,
)

MB = 1 << 20


def st(rows, bytes_est, ndv=1000, top_rows=0, top_key="k"):
    return TableStats(
        rows=rows,
        bytes_est=bytes_est,
        key_ndv=ndv,
        top_key=top_key,
        top_key_rows=top_rows,
    )


# ------------------------- decision rules (pure) --------------------


def test_advise_broadcasts_smaller_qualifying_side():
    a = advise_join(st(10**9, 4000 * MB), st(10**4, 2 * MB))
    assert a.strategy == "broadcast_right"
    a = advise_join(st(10**4, 2 * MB), st(10**9, 4000 * MB))
    assert a.strategy == "broadcast_left"
    # both fit -> the smaller one ships
    a = advise_join(st(10**4, 2 * MB), st(10**3, 1 * MB))
    assert a.strategy == "broadcast_right"


def test_advise_salts_on_hot_key_when_broadcast_impossible():
    big = st(10**9, 4000 * MB, ndv=10**6, top_rows=2 * 10**8)  # 20% hot
    other = st(10**8, 400 * MB)
    a = advise_join(big, other)
    assert a.strategy == "salted"
    assert 2 <= a.n_salts <= 64
    assert any("hot key" in r for r in a.reasons)


def test_advise_plain_shuffle_when_uniform():
    big = st(10**9, 4000 * MB, ndv=10**6, top_rows=10**4)
    other = st(10**8, 400 * MB, ndv=10**6, top_rows=10**3)
    a = advise_join(big, other)
    assert a.strategy == "shuffle"


def test_salt_count_scales_with_skew_and_clamps():
    # share * ndv huge -> clamp at 64
    a = advise_join(
        st(10**9, 4000 * MB, ndv=10**6, top_rows=5 * 10**8),
        st(10**8, 400 * MB),
    )
    assert a.n_salts == 64
    # tiny ndv -> lower bound 2
    a = advise_join(
        st(10**9, 4000 * MB, ndv=4, top_rows=2 * 10**8),
        st(10**8, 400 * MB),
    )
    assert a.n_salts >= 2


# ------------------------- collect + apply (Spark) ------------------


def test_collect_stats_counts_ndv_and_top_key(spark):
    df = spark.createDataFrame(
        [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1, "user_id: long"
    )
    s = collect_stats(df, "user_id")
    assert s.rows == 10
    assert s.key_ndv == 3
    assert s.top_key == 1 and s.top_key_rows == 6
    assert abs(s.top_key_share - 0.6) < 1e-9
    assert s.bytes_est == 10 * 8  # one bigint column


def test_planned_join_broadcast_appears_in_plan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = planned_join(
        orders, cust, "o_custkey", JoinAdvice(strategy="broadcast_right")
    )
    assert I.num_broadcast_joins(joined) == 1
    I.assert_max_shuffles(joined, 0)


def test_salted_join_matches_plain_join(spark):
    # 60%-hot key: salted result must equal the plain join exactly
    rows = [(1, i) for i in range(60)] + [(k, 0) for k in range(2, 42)]
    skewed = spark.createDataFrame(rows, "user_id: long, v: long")
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 42)], "user_id: long, tier: long"
    )
    advice = JoinAdvice(strategy="salted", n_salts=8)
    got = (
        planned_join(skewed, dim, "user_id", advice)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tier").alias("t"))
    )
    want = (
        skewed.join(dim, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tier").alias("t"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_advise_never_salts_non_inner_joins():
    """Salting replicates the non-salted side — only inner-safe. A
    skewed LEFT join must degrade to plain shuffle (AQE skew split is
    outer-safe), with the reason recorded."""
    big = st(10**9, 4000 * MB, ndv=10**6, top_rows=2 * 10**8)  # 20% hot
    other = st(10**8, 400 * MB)
    assert advise_join(big, other, how="inner").strategy == "salted"
    for how in ("left", "right", "full", "left_outer"):
        a = advise_join(big, other, how=how)
        assert a.strategy == "shuffle", how
        assert any("inner-only" in r for r in a.reasons)


def test_planned_join_degrades_salted_outer_to_plain_join(spark):
    """Stale advice (produced without `how`) saying 'salted' must not
    crash a LEFT join at runtime — planned_join falls back to a plain
    shuffle join with identical results."""
    left = spark.createDataFrame(
        [(1, "a")] * 5 + [(2, "b"), (9, "z")], "k: long, v: string"
    )
    right = spark.createDataFrame([(1, 10), (2, 20)], "k: long, t: long")
    got = planned_join(left, right, "k", JoinAdvice("salted", 4), how="left")
    want = left.join(right, "k", "left")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stat_join_end_to_end_broadcasts_the_dim(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, sf_dir, "customer")
    joined, advice = stat_join(orders, cust, "c_custkey")
    assert advice.strategy in ("broadcast_left", "broadcast_right")
    assert I.num_broadcast_joins(joined) == 1
    assert joined.count() == orders.count()  # every order has a customer
    assert advice.reasons  # the WHY travels with the decision


# ------------------- manifest-backed stats (write-time) -------------


def test_stats_from_snapshot_rows_and_ndv(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import stats_from_snapshot

    tbl = str(tmp_path / "stats_tbl")
    df = spark.range(500).select(
        (F.col("id") % 100).alias("user_id"), F.col("id").alias("v")
    )
    snapshot_commit(df, tbl, ndv_cols=["user_id"])
    s = stats_from_snapshot(tbl, key="user_id")
    assert s.rows == 500  # exact, from footer counts
    assert s.bytes_est > 0
    assert s.key_ndv == 100  # 100 < k=256 -> sketch holds all, exact
    # appends merge sketches: 50 overlapping + 50 new keys -> 150
    more = spark.range(1000, 1500).select(
        ((F.col("id") % 100) + 50).alias("user_id"), F.col("id").alias("v")
    )
    snapshot_commit(more, tbl, mode="append", ndv_cols=["user_id"])
    s2 = stats_from_snapshot(tbl, key="user_id")
    assert s2.rows == 1000
    assert s2.key_ndv == 150
    # version time-travel sees the old stats
    assert stats_from_snapshot(tbl, key="user_id", version=1).rows == 500


def test_stats_from_snapshot_kmv_accuracy_when_full(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import stats_from_snapshot

    tbl = str(tmp_path / "stats_big")
    df = spark.range(20000).select(F.col("id").alias("k"))
    snapshot_commit(df, tbl, ndv_cols=["k"])
    s = stats_from_snapshot(tbl, key="k")
    # k=256 sketch: standard error ~1/sqrt(k-2) ~ 6%; allow 3 sigma
    assert abs(s.key_ndv - 20000) / 20000 < 0.20


def test_manifest_stats_drive_broadcast_decision(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_join, stats_from_snapshot

    dim = str(tmp_path / "dim")
    snapshot_commit(
        spark.range(100).select(F.col("id").alias("k")), dim, ndv_cols=["k"]
    )
    dim_stats = stats_from_snapshot(dim, key="k")
    fact_stats = TableStats(
        rows=10**9, bytes_est=4000 * MB, key_ndv=10**6,
        top_key=None, top_key_rows=0,
    )
    a = advise_join(fact_stats, dim_stats)
    assert a.strategy == "broadcast_right"


def test_advise_salts_the_skewed_side_not_always_left():
    # skew on the RIGHT: the advice must name the right side, and
    # planned_join must salt it (replicating the uniform left side),
    # never the reverse — salting the uniform side would replicate the
    # hot rows to every salt partition
    uniform = st(10**9, 4000 * MB, ndv=10**6, top_rows=10**4)
    skewed = st(10**9, 4000 * MB, ndv=10**6, top_rows=3 * 10**8)
    a = advise_join(uniform, skewed)
    assert a.strategy == "salted" and a.skew_side == "right"
    a2 = advise_join(skewed, uniform)
    assert a2.strategy == "salted" and a2.skew_side == "left"


def test_planned_join_salts_right_side_correctly(spark):
    rows = [(1, i) for i in range(60)] + [(k, 0) for k in range(2, 42)]
    skewed = spark.createDataFrame(rows, "user_id: long, v: long")
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 42)], "user_id: long, tier: long"
    )
    advice = JoinAdvice(strategy="salted", n_salts=8, skew_side="right")
    got = (
        planned_join(dim, skewed, "user_id", advice)  # skewed on the RIGHT
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tier").alias("t"))
    )
    want = (
        dim.join(skewed, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tier").alias("t"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_append_without_ndv_cols_drops_stale_sketch(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import stats_from_snapshot

    tbl = str(tmp_path / "stale")
    snapshot_commit(
        spark.range(100).select(F.col("id").alias("k")), tbl, ndv_cols=["k"]
    )
    # an append that doesn't sketch: the parent's NDV no longer
    # describes the table, so it must NOT be carried forward
    snapshot_commit(
        spark.range(100, 5100).select(F.col("id").alias("k")),
        tbl,
        mode="append",
    )
    s = stats_from_snapshot(tbl, key="k")
    assert s.rows == 5100  # row counts stay exact (per-file footers)
    assert s.key_ndv == 0  # stale sketch dropped, not reported as 100


# --------------- advisor flag in registry queries (plan gates) ------


def test_advisor_flag_routes_nation_trade_volume(spark, sf_dir):
    """With spark.group5.advisor.enabled=true, nation_trade_volume
    plans its joins from collected stats — and the advice MATERIALIZES
    as physical broadcast joins (at test SF every advised side fits
    the budget). Results must be identical to the hand-hinted plan."""
    from group5_spark.queries import ADVISOR_CONF, QUERIES

    want = sorted(
        map(tuple, QUERIES["nation_trade_volume"](spark, sf_dir).collect())
    )
    spark.conf.set(ADVISOR_CONF, "true")
    try:
        df = QUERIES["nation_trade_volume"](spark, sf_dir)
        # all five joins land on broadcast at this SF (3 advised + 2 dims)
        assert I.num_broadcast_joins(df) >= 4
        assert sorted(map(tuple, df.collect())) == want
    finally:
        spark.conf.set(ADVISOR_CONF, "false")


def test_advisor_flag_routes_min_cost_supplier(spark, sf_dir):
    """Q2's bridge⋈dim joins planned post-filter by the advisor: the
    broadcast decision reflects the FILTERED dim sizes, materializes
    in the plan, and preserves the exact top-100 result."""
    from group5_spark.queries import ADVISOR_CONF, QUERIES

    want = [
        tuple(r) for r in QUERIES["min_cost_supplier"](spark, sf_dir).collect()
    ]
    spark.conf.set(ADVISOR_CONF, "true")
    try:
        df = QUERIES["min_cost_supplier"](spark, sf_dir)
        assert I.num_broadcast_joins(df) >= 2  # both advised joins broadcast
        assert [tuple(r) for r in df.collect()] == want  # ordered compare
    finally:
        spark.conf.set(ADVISOR_CONF, "false")


def test_stat_join_salt_column_materializes_in_plan(spark):
    """When stats force the salted strategy, the physical plan must
    actually contain the salt machinery (the _salt join key and the
    explode-replication), not merely return 'salted' advice."""
    from group5_spark.operators.skew import SALT_COL

    rows = [(1, i) for i in range(400)] + [
        (k, 0) for k in range(2, 30)
    ]  # ~93% hot key, too wide to broadcast under a 1-byte budget
    skewed = spark.createDataFrame(rows, "user_id: long, v: long")
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 30)], "user_id: long, tier: long"
    )
    joined, advice = stat_join(skewed, dim, "user_id", broadcast_bytes=1)
    assert advice.strategy == "salted"
    plan = I.formatted_plan(joined)
    assert SALT_COL in plan


# ----------------- sketch-based join cardinality ---------------------


def test_kmv_set_estimates_exact_when_not_full():
    """Non-full sketches hold their whole hash sets — union,
    intersection, and Jaccard are exact."""
    from group5_spark.extensions.sketches import kmv_set_estimates

    a = list(range(1, 101))          # 100 "hashes"
    b = list(range(61, 161))         # overlap = 40
    est = kmv_set_estimates(a, b, k=256)
    assert est["union"] == 160.0
    assert est["intersection"] == 40.0
    assert abs(est["jaccard"] - 40 / 160) < 1e-12
    # disjoint and identical edges
    assert kmv_set_estimates(a, [1000, 1001], k=256)["intersection"] == 0.0
    same = kmv_set_estimates(a, a, k=256)
    assert same["intersection"] == 100.0 and same["jaccard"] == 1.0


def test_estimate_join_rows_from_snapshot_sketches(spark, tmp_path):
    """Two snapshot tables' manifest sketches predict the join output
    within sketch error — no data read at planning time."""
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import (
        estimate_join_rows,
        stats_from_snapshot,
    )

    left = str(tmp_path / "je_left")
    right = str(tmp_path / "je_right")
    # left: keys 0..199, 3 rows per key; right: keys 100..299, 2 rows/key
    ldf = spark.range(600).select((F.col("id") % 200).alias("k"))
    rdf = spark.range(400).select(((F.col("id") % 200) + 100).alias("k"))
    snapshot_commit(ldf, left, ndv_cols=["k"])
    snapshot_commit(rdf, right, ndv_cols=["k"])
    ls = stats_from_snapshot(left, key="k")
    rs = stats_from_snapshot(right, key="k")
    assert ls.key_hashes and rs.key_hashes
    card = estimate_join_rows(ls, rs)
    actual = ldf.join(rdf, "k").count()  # 100 shared keys * 3 * 2 = 600
    assert actual == 600
    # k=256 sketches over 200/300 keys are full -> estimates, not exact;
    # allow generous sketch error (3 sigma ~ 20%) plus multiplicity
    assert abs(card["rows_est"] - actual) / actual < 0.35
    assert abs(card["key_overlap"] - 100) / 100 < 0.35
    # the estimate reaches advise_join's reasons
    a = advise_join(ls, rs)
    assert any("sketch cardinality" in r for r in a.reasons)


def test_estimate_join_rows_none_without_sketches():
    from group5_spark.plans.advisor import estimate_join_rows

    assert estimate_join_rows(st(10, 10), st(10, 10)) is None


# --------------------- dynamic filtering (prefilter) -----------------


def _sketch_of(vals):
    """Fake 'hash list' for tests: non-full sketches are exact, so any
    distinct ints work as KMV hashes."""
    return tuple(sorted(vals))


def test_advise_prefilters_low_overlap_shuffle_join():
    """Neither side broadcasts, the small side's key set does, and
    sketches show <50% of the big side's keys survive -> dynamic
    filter on the big side; full-overlap pairs must NOT prefilter."""
    # non-full sketches (<256 hashes) make every KMV figure exact:
    # small holds keys {0..99}, big {0,2,...,398} -> overlap 50 keys,
    # i.e. 25% of big's 200 keys survive the join
    small = TableStats(
        rows=10**8, bytes_est=400 * MB, key_ndv=100,
        top_key=None, top_key_rows=0,
        key_hashes=_sketch_of(range(100)),
    )
    big = TableStats(
        rows=10**9, bytes_est=4000 * MB, key_ndv=200,
        top_key=None, top_key_rows=0,
        key_hashes=_sketch_of(range(0, 400, 2)),
    )
    a = advise_join(small, big)
    assert a.strategy == "shuffle" and a.prefilter_side == "right"
    assert any("dynamic filter" in r for r in a.reasons)
    # symmetric: big on the left -> filter the left
    assert advise_join(big, small).prefilter_side == "left"
    # full overlap -> nothing to prune -> no prefilter
    twin = TableStats(
        rows=10**9, bytes_est=4000 * MB, key_ndv=100,
        top_key=None, top_key_rows=0,
        key_hashes=_sketch_of(range(100)),
    )
    assert advise_join(small, twin).prefilter_side is None
    # outer joins never prefilter (would drop preserved-side rows)
    assert advise_join(small, big, how="left").prefilter_side is None


def test_planned_join_prefilter_matches_plain_join(spark):
    """The dynamic filter is a pure plan optimization: results equal
    the plain inner join, and the plan contains the broadcast
    semi-join ahead of the main join."""
    left = spark.createDataFrame(
        [(k, k * 10) for k in range(5)], "k: long, v: long"
    )
    right = spark.createDataFrame(
        [(k, k * 100) for k in range(3, 1000)], "k: long, w: long"
    )
    advice = JoinAdvice(strategy="shuffle", prefilter_side="right")
    got = planned_join(left, right, "k", advice)
    want = left.join(right, "k")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    plan = I.formatted_plan(got)
    assert "LeftSemi" in plan


def test_collect_stats_with_sketch_enables_cardinality(spark):
    """with_sketch=True lets live frames (no manifest) use the same
    join-cardinality machinery as snapshot tables."""
    from group5_spark.plans.advisor import estimate_join_rows

    a = spark.range(300).select((F.col("id") % 100).alias("k"))
    b = spark.range(200).select(((F.col("id") % 100) + 50).alias("k"))
    sa = collect_stats(a, "k", with_sketch=True)
    sb = collect_stats(b, "k", with_sketch=True)
    assert len(sa.key_hashes) == 100 and len(sb.key_hashes) == 100
    card = estimate_join_rows(sa, sb)
    # 50 shared keys x 3 rows/key x 2 rows/key = 300, exact (sketches
    # not full)
    assert card["key_overlap"] == 50.0
    assert card["rows_est"] == 300.0
    assert a.join(b, "k").count() == 300


def test_registry_dynfilter_query_materializes_the_semi_filter(spark, sf_dir):
    """The registry query `dynfilter_urgent_order_revenue` must let
    the advisor CHOOSE dynamic filtering from real sketches (not a
    hard-coded hint) and the choice must MATERIALIZE: a LeftSemi join
    prunes lineitem ahead of the main join, and results equal the
    plain hinted join."""
    from group5_spark.queries import QUERIES

    q = QUERIES["dynfilter_urgent_order_revenue"]
    out = q(spark, sf_dir)
    plan = I.formatted_plan(out)
    assert "LeftSemi" in plan, plan

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = (
        li.join(
            F.broadcast(urgent),
            li["l_orderkey"] == urgent["o_orderkey"],
        )
        .groupBy(F.trunc("o_orderdate", "mm").alias("order_month"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )
    got = {
        (str(r.order_month), round(r.revenue, 4), r.line_count)
        for r in out.collect()
    }
    want = {
        (str(r.order_month), round(r.revenue, 4), r.line_count)
        for r in plain.collect()
    }
    assert got == want and got


# ------------- manifest-backed planning in flag-routed queries ------


@pytest.fixture(scope="module")
def stats_root(spark, sf_dir, tmp_path_factory):
    """Snapshot-managed copies of the advisor queries' input tables,
    KMV sketches on every join key — the `advisor.stats_dir` layout."""
    from group5_spark.medallion.snapshots import snapshot_commit

    root = tmp_path_factory.mktemp("advisor_stats")
    for tbl, keys in {
        "lineitem": ["l_orderkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "supplier": ["s_suppkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
    }.items():
        snapshot_commit(
            load_table(spark, sf_dir, tbl), str(root / tbl), ndv_cols=keys
        )
    return str(root)


def test_manifest_planned_trade_volume_runs_zero_stats_jobs(
    spark, sf_dir, stats_root, monkeypatch
):
    """With advisor.stats_dir set, nation_trade_volume's three advised
    joins are planned ENTIRELY from manifest metadata: building the
    plan launches no MORE Spark jobs than the hand-hinted plan build
    (only parquet schema reads — job-group count assertion) and never
    calls collect_stats (monkeypatched to explode) — vs the runtime
    path, which pays a stats scan per join side. Advice still
    materializes as broadcasts, and results match the hand-hinted
    plan exactly."""
    from group5_spark.plans import advisor as A
    from group5_spark.queries import (
        ADVISOR_CONF,
        ADVISOR_STATS_DIR_CONF,
        QUERIES,
    )

    sc = spark.sparkContext
    # baseline: jobs a hand-hinted PLAN BUILD costs (schema reads only)
    sc.setJobGroup("plan-baseline", "hand-hinted plan build")
    baseline_df = QUERIES["nation_trade_volume"](spark, sf_dir)
    baseline_jobs = len(
        sc.statusTracker().getJobIdsForGroup("plan-baseline")
    )
    sc.setJobGroup("", "")
    want = sorted(map(tuple, baseline_df.collect()))

    monkeypatch.setattr(
        A, "collect_stats",
        lambda *a, **kw: pytest.fail("manifest path ran a stats scan"),
    )
    spark.conf.set(ADVISOR_CONF, "true")
    spark.conf.set(ADVISOR_STATS_DIR_CONF, stats_root)
    try:
        sc.setJobGroup("advisor-planning", "manifest-backed join planning")
        df = QUERIES["nation_trade_volume"](spark, sf_dir)
        planning_jobs = len(
            sc.statusTracker().getJobIdsForGroup("advisor-planning")
        )
        sc.setJobGroup("advisor-exec", "")
        # decisions from kilobytes: zero jobs beyond the schema reads
        assert planning_jobs <= baseline_jobs
        assert I.num_broadcast_joins(df) >= 4  # advice still lands
        monkeypatch.setattr(A, "collect_stats", collect_stats)
        assert sorted(map(tuple, df.collect())) == want
    finally:
        spark.conf.set(ADVISOR_CONF, "false")
        spark.conf.unset(ADVISOR_STATS_DIR_CONF)
        sc.setJobGroup("", "")


def test_manifest_and_runtime_stats_agree_on_strategy(
    spark, sf_dir, stats_root
):
    """The same join advised from manifest sketches and from a runtime
    collect_stats scan lands on the SAME strategy — availability of
    write-time statistics changes the planning cost, never the plan
    class (both paths see sizes on the same side of the broadcast
    budget)."""
    from group5_spark.plans.advisor import advise_join, snapshot_side_stats

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for pair_key, l_tbl, l_df, l_key, r_tbl, r_df, r_key in [
        ("ok", "lineitem", li, "l_orderkey", "orders", orders, "o_orderkey"),
    ]:
        lm = snapshot_side_stats(stats_root, l_tbl, l_key)
        rm = snapshot_side_stats(stats_root, r_tbl, r_key)
        lr = collect_stats(l_df, l_key)
        rr = collect_stats(r_df, r_key)
        assert lm.rows == lr.rows and rm.rows == rr.rows  # exact counts
        a_m = advise_join(lm, rm)
        a_r = advise_join(lr, rr)
        assert a_m.strategy == a_r.strategy
        # and under a budget that fits neither side, both degrade the
        # same way (shuffle) — the agreement isn't broadcast-trivial
        tight = advise_join(lm, rm, broadcast_bytes=1)
        tight_r = advise_join(lr, rr, broadcast_bytes=1)
        assert tight.strategy == tight_r.strategy == "shuffle"


def test_manifest_stats_fall_back_per_side_when_absent(
    spark, sf_dir, stats_root
):
    """min_cost_supplier with stats_dir set: the part/supplier dim
    sides plan from manifests (filtered frames -> upper-bound stats,
    safe direction), the synthesized partsupp bridge has no manifest
    and pays the runtime scan — and the mixed-path result is
    byte-identical to the hand-hinted plan."""
    from group5_spark.queries import (
        ADVISOR_CONF,
        ADVISOR_STATS_DIR_CONF,
        QUERIES,
    )

    want = [
        tuple(r) for r in QUERIES["min_cost_supplier"](spark, sf_dir).collect()
    ]
    spark.conf.set(ADVISOR_CONF, "true")
    spark.conf.set(ADVISOR_STATS_DIR_CONF, stats_root)
    try:
        df = QUERIES["min_cost_supplier"](spark, sf_dir)
        assert I.num_broadcast_joins(df) >= 2
        assert [tuple(r) for r in df.collect()] == want
    finally:
        spark.conf.set(ADVISOR_CONF, "false")
        spark.conf.unset(ADVISOR_STATS_DIR_CONF)


def test_snapshot_side_stats_none_without_manifest(tmp_path):
    from group5_spark.plans.advisor import snapshot_side_stats

    assert snapshot_side_stats(str(tmp_path), "nope", "k") is None


# ------------- auto-discovered manifest stats (round 6) -------------


@pytest.fixture(scope="module")
def snapshot_catalog(spark, sf_dir, tmp_path_factory):
    """A catalog dir whose tables ARE snapshot tables ({dir}/{name}
    with a manifest, KMV sketches on the join keys) — the layout
    load_table reads through the manifest and _manifest_stats
    auto-discovers without any conf."""
    from group5_spark.medallion.snapshots import snapshot_commit

    root = tmp_path_factory.mktemp("snap_catalog")
    for tbl, keys in {
        "lineitem": ["l_orderkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "supplier": ["s_suppkey"],
        "customer": ["c_custkey"],
        "nation": [],
    }.items():
        snapshot_commit(
            load_table(spark, sf_dir, tbl),
            str(root / tbl),
            ndv_cols=keys or None,
        )
    return str(root)


def test_autodiscovered_manifest_stats_zero_jobs_no_conf(
    spark, sf_dir, snapshot_catalog, monkeypatch
):
    """VERDICT #7 done-criterion: when the query's own input dir IS a
    snapshot catalog, manifest planning engages with NO
    advisor.stats_dir conf — collect_stats is never called (patched to
    fail), plan building launches no more jobs than the hand-hinted
    build, and results match the plain-parquet run exactly."""
    from group5_spark.plans import advisor as A
    from group5_spark.plans.advisor import collect_stats
    from group5_spark.queries import ADVISOR_CONF, QUERIES

    sc = spark.sparkContext
    want = sorted(
        map(tuple, QUERIES["nation_trade_volume"](spark, sf_dir).collect())
    )
    sc.setJobGroup("auto-baseline", "hand-hinted plan build")
    QUERIES["nation_trade_volume"](spark, snapshot_catalog)
    baseline_jobs = len(sc.statusTracker().getJobIdsForGroup("auto-baseline"))
    sc.setJobGroup("", "")

    monkeypatch.setattr(
        A, "collect_stats",
        lambda *a, **kw: pytest.fail(
            "auto-discovery missed: a stats scan ran with no conf set"
        ),
    )
    spark.conf.set(ADVISOR_CONF, "true")
    assert spark.conf.get("spark.group5.advisor.stats_dir", None) is None
    try:
        sc.setJobGroup("auto-planning", "auto-discovered manifest planning")
        df = QUERIES["advisor_planned_trade_volume"](spark, snapshot_catalog)
        planning_jobs = len(
            sc.statusTracker().getJobIdsForGroup("auto-planning")
        )
        sc.setJobGroup("", "")
        assert planning_jobs <= baseline_jobs
        assert I.num_broadcast_joins(df) >= 4
        monkeypatch.setattr(A, "collect_stats", collect_stats)
        assert sorted(map(tuple, df.collect())) == want
    finally:
        spark.conf.set(ADVISOR_CONF, "false")
        sc.setJobGroup("", "")


def test_conf_overrides_autodiscovery(spark, sf_dir, snapshot_catalog):
    """An explicit stats_dir conf wins over the input-dir fallback."""
    from group5_spark.queries import ADVISOR_STATS_DIR_CONF, _manifest_stats

    spark.conf.set(ADVISOR_STATS_DIR_CONF, str(snapshot_catalog))
    try:
        # conf root hit: manifest stats resolve even though sf_dir has
        # no snapshot tables
        st = _manifest_stats(spark, "lineitem", "l_orderkey", sf_dir)
        assert st is not None and st.rows > 0 and st.key_ndv > 0
    finally:
        spark.conf.unset(ADVISOR_STATS_DIR_CONF)
    # no conf + plain-parquet sf_dir: no manifest stats (runtime path)
    assert _manifest_stats(spark, "lineitem", "l_orderkey", sf_dir) is None


def test_masked_table_stats_match_folded_equivalent(spark, tmp_path):
    """Round-6 VERDICT #7: a heavily-masked table (DV + stacked eq
    sidecars) must plan like its folded equivalent — masked rows and
    the masked byte fraction subtract from the manifest estimate, so
    a 50%-masked dim is not wrongly demoted from broadcast."""
    from group5_spark.medallion.maintenance import (
        compact_snapshot_masks,
        snapshot_delete,
        snapshot_eq_delete,
    )
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_join, stats_from_snapshot

    dim = str(tmp_path / "dim")
    snapshot_commit(
        spark.range(10_000).select(
            F.col("id").alias("k"), F.rand(7).alias("w")
        ),
        dim,
        stats_cols=["k"],
        ndv_cols=["k"],
    )
    # mask half: 30% by DV positions, 20% by an eq key-set delete
    snapshot_delete(spark, dim, [("k", "<", 3000)], dv_threshold=0.9)
    snapshot_eq_delete(
        spark, dim,
        spark.range(3000, 5000).select(F.col("id").alias("k")),
    )
    masked = stats_from_snapshot(dim, key="k")
    fact = TableStats(
        rows=10**9, bytes_est=4000 * MB, key_ndv=10**6,
        top_key=None, top_key_rows=0,
    )
    before_fold = advise_join(fact, masked)
    # fold and re-plan: same row estimate, same strategy
    compact_snapshot_masks(spark, dim)
    folded = stats_from_snapshot(dim, key="k")
    assert masked.rows == folded.rows == 5000
    # byte estimate within ~2× of the folded table's (row-fraction
    # scaling vs a real rewrite), and the DECISION identical
    assert masked.bytes_est <= 2 * folded.bytes_est
    after_fold = advise_join(fact, folded)
    assert before_fold.strategy == after_fold.strategy == "broadcast_right"


def test_masked_stats_duplicate_keyed_table_plans_like_folded(
    spark, tmp_path
):
    """Round-7 VERDICT #5: one eq key can mask MANY rows (a fact
    table keyed by customer). The masked-row estimate scales each
    sidecar key by the table's rows-per-key (from the stored KMV NDV)
    so a duplicate-keyed table plans like its folded equivalent —
    the 'keys ~unique per row' assumption undercounted masking 10×
    here."""
    from group5_spark.medallion.maintenance import (
        compact_snapshot_masks,
        snapshot_eq_delete,
    )
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_join, stats_from_snapshot

    fact = str(tmp_path / "fact")
    # 10,000 rows over 1,000 distinct keys: multiplicity 10
    snapshot_commit(
        spark.range(10_000).select(
            (F.col("id") % 1000).alias("k"), F.rand(11).alias("w")
        ),
        fact,
        stats_cols=["k"],
        ndv_cols=["k"],
    )
    # eq-delete 500 of the 1,000 keys -> ~5,000 rows actually masked
    snapshot_eq_delete(
        spark, fact,
        spark.range(500).select(F.col("id").alias("k")),
    )
    masked = stats_from_snapshot(fact, key="k")
    compact_snapshot_masks(spark, fact)
    folded = stats_from_snapshot(fact, key="k")
    assert folded.rows == 5000
    # KMV-estimated NDV carries ~±7% error at k=256; the estimate must
    # land near the folded truth, not near the 9,500 the unique-key
    # assumption produced
    assert abs(masked.rows - folded.rows) <= 0.15 * folded.rows
    big = TableStats(
        rows=10**9, bytes_est=4000 * MB, key_ndv=10**6,
        top_key=None, top_key_rows=0,
    )
    assert (
        advise_join(big, masked).strategy
        == advise_join(big, folded).strategy
    )


def test_insert_heavy_eq_sidecars_never_promote_to_broadcast():
    """Round-8 ADVICE: insert-heavy eq-CDC stacks sidecars whose keys
    mostly match nothing; the masked-row ESTIMATE can collapse the
    row/byte numbers of a huge table. Broadcast eligibility must
    consult the DV-exact bytes floor, so the guess can shrink join
    cardinality estimates but never talk the planner into
    broadcasting a table whose known bytes don't fit (executor OOM)."""
    from group5_spark.plans.advisor import advise_join

    # a 4 GB fact whose eq estimate (wrongly) claims 99.9% masked
    eq_collapsed = TableStats(
        rows=10**6,          # estimate after eq subtraction
        bytes_est=4 * MB,    # scaled by the estimated live fraction
        key_ndv=10**6,
        top_key=None,
        top_key_rows=0,
        bytes_floor=4000 * MB,  # DV-exact: nothing provably masked
    )
    other = TableStats(
        rows=10**8, bytes_est=400 * MB, key_ndv=10**6,
        top_key=None, top_key_rows=0,
    )
    a = advise_join(other, eq_collapsed)
    assert not a.strategy.startswith("broadcast"), a


def test_stacked_sidecars_never_mask_more_than_covered_rows(
    spark, tmp_path
):
    """Round-8 review: N stacked eq sidecars over the SAME files must
    not sum their per-sidecar estimates past the rows any of them
    covers — without the global clamp, five hot-key re-upsert batches
    zeroed out a mostly-live table's row estimate even though the
    post-sidecar entries alone prove thousands of live rows."""
    from group5_spark.medallion.maintenance import snapshot_eq_upsert
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import stats_from_snapshot

    t = str(tmp_path / "t")
    snapshot_commit(
        spark.range(5000).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        t,
        stats_cols=["k"],
        ndv_cols=["k"],
    )
    # five CDC batches re-upserting the SAME hot 1000 keys: each
    # stacks a 1000-key sidecar over (almost) the same covered rows
    for _ in range(5):
        snapshot_eq_upsert(
            spark, t,
            spark.range(1000).select(
                F.col("id").alias("k"), F.lit(2).alias("v")
            ),
            keys=["k"],
        )
    st = stats_from_snapshot(t, key="k")
    # truth: 5000 live (old masked rows replaced by same-key rows).
    # The estimate may overshoot the masking, but never below the
    # final batch's own 1000 rows — and nowhere near zero.
    assert st.rows >= 1000, st


# ---------------------------------------------------------------------------
# partition-health advisor (advise_partitions) — round 9
# ---------------------------------------------------------------------------


def test_advise_partitions_flags_skew_frag_and_rent(spark, tmp_path):
    """One manifest, three unhealthy layouts: a 10x-median skewed
    partition, a 20-small-file fragmented partition, and a partition
    carrying >20% DV rent — each flagged with measured reasons; the
    healthy partitions stay silent."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.maintenance import snapshot_delete
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_partitions

    t = str(tmp_path / "tbl")
    # p=hot: 4000 rows; p=frag: 400 rows in 20 files; p=a/b/c: 400 each
    hot = spark.range(4000).select(
        F.lit("hot").alias("p"), F.col("id"), F.lit(0).alias("grp")
    )
    frag = (
        spark.range(4000, 4400)
        .select(F.lit("frag").alias("p"), F.col("id"), F.lit(0).alias("grp"))
        .repartition(20)
    )
    rest = spark.range(4400, 5600).select(
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("p"),
        F.col("id"),
        F.lit(0).alias("grp"),
    )
    snapshot_commit(
        hot.repartition(1, "p"), t, partition_by="p", stats_cols=["id"]
    )
    snapshot_commit(frag, t, mode="append", partition_by="p")
    snapshot_commit(
        rest.repartition(1, "p"), t, mode="append", partition_by="p"
    )
    # 30% of partition a's rows DV-masked (ids ≡ 1 mod 3 < cutoff)
    snapshot_delete(
        spark, t, [("id", "<", 4760), ("id", ">=", 4400)], dv_threshold=1.0
    )

    advice = advise_partitions(t, frag_files=16, frag_avg_bytes=1 << 20)
    by_action = {}
    for a in advice:
        by_action.setdefault(a.action, []).append(a)
    assert [a.partition for a in by_action["split_or_salt"]] == ["hot"]
    assert "4000" in by_action["split_or_salt"][0].reasons[0]
    assert [a.partition for a in by_action["compact"]] == ["frag"]
    assert "files=20" in by_action["compact"][0].reasons[0]
    fold = {a.partition for a in by_action["fold_masks"]}
    assert fold and fold <= {"a", "b", "c"}
    for a in by_action["fold_masks"]:
        assert "> 0.2" in a.reasons[0]
    # silence elsewhere: no finding names a healthy partition/action pair
    assert all(
        a.partition != "hot" for a in by_action.get("compact", [])
    )


def test_advise_partitions_healthy_table_is_silent(spark, tmp_path):
    from pyspark.sql import functions as F

    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_partitions

    t = str(tmp_path / "tbl")
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("p"), F.col("id")
    )
    snapshot_commit(df.repartition(1, "p"), t, partition_by="p")
    assert advise_partitions(t) == []


def test_advise_partitions_unpartitioned_single_bucket(spark, tmp_path):
    """An unpartitioned table is one NULL-partition rollup: never
    'skewed' against itself; fragmentation still detectable."""
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_partitions

    t = str(tmp_path / "tbl")
    snapshot_commit(spark.range(500).repartition(20), t)
    advice = advise_partitions(t, frag_files=16, frag_avg_bytes=1 << 20)
    assert [a.action for a in advice] == ["compact"]
    assert advice[0].partition is None


def test_advise_partitions_zero_median_still_flags_skew(spark, tmp_path):
    """ADVICE r9: the skew check used to be skipped entirely when the
    median partition had 0 rows — so a layout where most partitions
    are row-empty and ONE holds everything (the worst skew) was never
    flagged. The median is floored at 1 so it still fires."""
    import json

    from group5_spark.medallion.snapshots import _manifest_path, snapshot_commit
    from group5_spark.plans.advisor import advise_partitions
    from pathlib import Path
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(4000).select(
        (F.col("id") % 5).cast("string").alias("p"), F.col("id")
    )
    snapshot_commit(df.repartition(1, "p"), t, partition_by="p")
    # empty out every partition but one in the manifest (rows=0 files —
    # e.g. a retention sweep that left tombstone-only partitions)
    mp = _manifest_path(Path(t), 1)
    m = json.loads(mp.read_text())
    for e in m["files"]:
        if e.get("partition") != "0":
            e["rows"] = 0
    mp.write_text(json.dumps(m))

    advice = advise_partitions(t)
    skew = [a for a in advice if a.action == "split_or_salt"]
    assert [a.partition for a in skew] == ["0"]
    assert "median=1" in skew[0].reasons[0]


def test_advise_partitions_numbers_match_partitions_df(spark, tmp_path):
    """The sessionless advisor and the distributed `.partitions` table
    roll up the same manifest — their per-partition (rows, files, dv)
    numbers must be identical, so thresholds applied to either path
    select the same partitions."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.maintenance import snapshot_delete
    from group5_spark.medallion.meta import snapshot_partitions_df
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.plans.advisor import advise_partitions

    t = str(tmp_path / "tbl")
    df = spark.range(2400).select(
        (F.col("id") % 4).cast("string").alias("p"), F.col("id")
    )
    snapshot_commit(df.repartition(1, "p"), t, partition_by="p",
                    stats_cols=["id"])
    snapshot_delete(spark, t, [("id", "<", 1200)], dv_threshold=1.0)
    rollup = {
        r["partition"]: (r["rows"], r["n_files"], r["dv_deleted"])
        for r in snapshot_partitions_df(spark, t).collect()
    }
    # drive the advisor into flagging EVERY partition for fold (50%
    # masked) and parse its reasons back into numbers
    advice = advise_partitions(t, mask_share=0.2)
    assert {a.action for a in advice} == {"fold_masks"}
    for a in advice:
        rows, files, dv = rollup[a.partition]
        assert f"dv_deleted={dv} / rows={rows}" in a.reasons[0]
    assert {a.partition for a in advice} == set(rollup)
