"""Unit tests for the relational operator layer (SURVEY §5.2 plan #1):
tiny in-memory DataFrames with exact expected outputs, covering edge
cases the oracle-differential tests can't isolate (empty arrays,
missing sparse columns, tie-breaks, unpersist behavior)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from group5_spark.operators import columns as C
from group5_spark.operators import flatten, joins, setops, windows


def test_dim_join_broadcasts(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 5.0)], ["k", "v"])
    dim = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "name"])
    out = joins.dim_join(fact, dim, "k")
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_anti_and_semi_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2, "x"), (2, "y")], ["k", "extra"])
    anti = joins.anti_join(left, right, "k")
    semi = joins.semi_join(left, right, "k")
    assert sorted(r.k for r in anti.collect()) == [1, 3]
    assert [r.k for r in semi.collect()] == [2]  # no dup from right multiplicity
    assert semi.columns == ["k"]


def test_rank_methods(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("a", 5), ("b", 1)], ["g", "v"]
    )
    ranked = windows.with_rank(df, "g", [F.col("v").desc()], method="dense_rank")
    rows = {(r.g, r.v, r.rank) for r in ranked.collect()}
    assert ("a", 10, 1) in rows and ("a", 5, 2) in rows and ("b", 1, 1) in rows


def test_top_n_tie_break(spark):
    df = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, 10), ("g", 3, 9)], ["g", "id", "v"]
    )
    top = windows.top_n(df, "g", [F.col("v").desc(), "id"], n=2)
    assert sorted(r.id for r in top.collect()) == [1, 2]


def test_running_total_and_moving_avg(spark):
    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 30.0)], ["k", "t", "v"]
    )
    rt = windows.running_total(df, "k", "t", "v")
    assert [r.running_total for r in rt.orderBy("t").collect()] == [10.0, 30.0, 60.0]
    ma = windows.moving_average(df, "k", "t", "v", window_rows=2)
    assert [r.moving_avg for r in ma.orderBy("t").collect()] == [10.0, 15.0, 25.0]


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:10:00"),
            ("u", "2024-01-01 01:10:00"),  # 60-min gap → new session
        ],
        ["user", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.sessionize(df, "user", "ts", gap_minutes=30)
    assert [r.session_seq for r in out.orderBy("ts").collect()] == [1, 1, 2]


def test_union_by_name_sparse_schemas(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "only_a"])
    b = spark.createDataFrame([(2, "y")], ["id", "only_b"])
    out = setops.union_by_name(a, b)
    assert set(out.columns) == {"id", "only_a", "only_b"}
    rows = {(r.id, r.only_a, r.only_b) for r in out.collect()}
    assert rows == {(1, "x", None), (2, None, "y")}


def test_except_all_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], ["v"])
    b = spark.createDataFrame([(1,)], ["v"])
    assert sorted(r.v for r in setops.except_all(a, b).collect()) == [1, 2]
    assert sorted(r.v for r in setops.except_distinct(a, b).collect()) == [2]


def test_flatten_struct_nested(spark):
    df = spark.createDataFrame(
        [Row(id=1, addr=Row(city="X", geo=Row(lat=1.0)))]
    )
    flat = flatten.flatten_struct(df)
    assert set(flat.columns) == {"id", "addr_city", "addr_geo_lat"}
    assert flat.collect()[0].addr_geo_lat == 1.0


def test_explode_array_empty_and_outer(spark):
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("items", ArrayType(StringType())),
        ]
    )
    df = spark.createDataFrame([(1, ["a", "b"]), (2, []), (3, None)], schema)
    inner = flatten.explode_array(df, "items")
    assert sorted(r.id for r in inner.collect()) == [1, 1]  # empty/null drop
    outer = flatten.explode_array(df, "items", keep_empty=True)
    assert sorted(r.id for r in outer.collect()) == [1, 1, 2, 3]


def test_parse_json_column_permissive(spark):
    df = spark.createDataFrame([('{"k": 5}',), ("not json",)], ["props"])
    out = flatten.parse_json_column(df, "props", "k INT", out="parsed")
    vals = [r.parsed.k if r.parsed else None for r in out.collect()]
    assert 5 in vals  # malformed row nulls out, no failure


def test_column_ops(spark):
    df = spark.createDataFrame([(1, "a", "1.5")], ["id", "name", "amount"])
    out = C.add_column(df, "doubled", F.col("id") * 2)
    out = C.cast_columns(out, {"amount": "double"})
    out = C.rename_columns(out, {"name": "label"})
    out = C.drop_columns(out, "id")
    row = out.collect()[0]
    assert row.doubled == 2 and row.amount == 1.5 and row.label == "a"
    assert "id" not in out.columns


def test_cached_context_manager(spark):
    df = spark.createDataFrame([(1,)], ["v"])
    with C.cached(df) as cdf:
        assert cdf.count() == 1
        assert cdf.storageLevel.useMemory
    assert not df.storageLevel.useMemory


def test_asof_join_backward_with_ties_and_no_match(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(5)), (1, t(10)), (2, t(3)), (3, t(7))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, t(4), "a"), (1, t(10), "b"), (2, t(9), "c")],
        ["k", "rts", "val"],
    )
    out = joins.asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    rows = {(r.k, r.ts.second): (r.val, r.rts.second if r.rts else None)
            for r in out.collect()}
    assert out.count() == 4                      # every left row survives
    assert rows[(1, 5)] == ("a", 4)              # strictly-before match
    assert rows[(1, 10)] == ("b", 10)            # equal-ts tie matches
    assert rows[(2, 3)] == (None, None)          # right row is later: no match
    assert rows[(3, 7)] == (None, None)          # key absent from right


def test_salted_join_matches_plain_join(spark):
    from group5_spark.operators import skew

    # hot key 1 (90 rows), cold keys 2..5
    left = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 0) for k in range(2, 6)], ["k", "v"]
    )
    right = spark.createDataFrame([(k, f"d{k}") for k in range(1, 5)], ["k", "name"])
    plain = left.join(right, "k").groupBy("k").count()
    salted = skew.salted_join(left, right, "k", n_salts=4).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # replication really happened: pre-join right side carries 4 salts
    assert skew.salted_join(left, right, "k", n_salts=4).count() == plain.agg(
        F.sum("count")
    ).collect()[0][0]


def test_salted_sum_count_matches_groupby(spark):
    from group5_spark.operators import skew

    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(100)], ["k", "v"]
    )
    expected = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (r.k): (r.sum_v, r.n_rows)
        for r in skew.salted_sum_count(df, "k", ["v"], n_salts=8).collect()
    }
    assert got == expected


def test_asof_join_property_matches_reference(spark):
    """Property test: asof_join equals the per-row 'latest right ts
    <= left ts per key' reference computed driver-side."""
    import datetime as dt
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    for trial in range(3):
        lrows = [
            (rng.randint(1, 4), base + dt.timedelta(seconds=rng.randint(0, 300)))
            for _ in range(40)
        ]
        rrows = [
            (rng.randint(1, 4), base + dt.timedelta(seconds=rng.randint(0, 300)), i)
            for i in range(30)
        ]
        left = spark.createDataFrame(lrows, ["k", "ts"])
        right = spark.createDataFrame(rrows, ["k", "rts", "rid"])
        out = joins.asof_join(left, right, on="k", left_ts="ts", right_ts="rts")

        def expected_rts(k, ts):
            cands = [r for kk, r, _ in rrows if kk == k and r <= ts]
            return max(cands) if cands else None

        got = [(r.k, r.ts, r.rts) for r in out.collect()]
        assert len(got) == len(lrows)
        for k, ts, rts in got:
            assert rts == expected_rts(k, ts), (trial, k, ts)


def test_asof_join_rejects_column_collisions(spark):
    import datetime as dt

    import pytest

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t)], ["k", "ts"])
    right = spark.createDataFrame([(1, t, "x")], ["k", "ts", "val"])
    with pytest.raises(ValueError, match="collide"):
        joins.asof_join(left, right, on="k", left_ts="ts", right_ts="ts")


def _ts_df(spark, name_key, name_ts, rows):
    return spark.createDataFrame(
        [(k, t) for k, t in rows], [name_key, "s"]
    ).select(name_key, F.col("s").cast("timestamp").alias(name_ts))


def test_band_join_matches_nested_loop(spark):
    left = _ts_df(
        spark, "lid", "lts",
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 05:00:00"),
         (3, "2024-01-02 00:00:00"), (4, "2024-01-05 12:00:00")],
    )
    right = _ts_df(
        spark, "rid", "rts",
        [(10, "2024-01-01 01:00:00"), (11, "2024-01-01 23:59:59"),
         (12, "2024-01-06 00:00:00")],
    )
    band = 6 * 3600
    got = {
        (r["lid"], r["rid"])
        for r in joins.band_join(left, right, "lts", "rts", band).collect()
    }
    # reference: plain nested-loop condition join
    expect = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            F.abs(
                F.unix_timestamp("lts") - F.unix_timestamp("rts")
            ) <= band,
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_band_join_with_keys(spark):
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:00:00"), (2, 200, "2024-01-01 00:00:00")],
        ["u", "lid", "s"],
    ).select("u", "lid", F.col("s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, 900, "2024-01-01 00:30:00"), (2, 901, "2024-01-03 00:00:00")],
        ["u", "rid", "s"],
    ).select("u", "rid", F.col("s").cast("timestamp").alias("rts"))
    out = joins.band_join(left, right, "lts", "rts", 3600, keys=["u"]).collect()
    # only user 1's pair is inside the band; user 2's is 2 days away
    assert [(r["u"], r["lid"], r["rid"]) for r in out] == [(1, 100, 900)]


def test_band_join_rejects_collisions(spark):
    df = _ts_df(spark, "k", "ts", [(1, "2024-01-01 00:00:00")])
    try:
        joins.band_join(df, df, "ts", "ts", 60)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "both sides" in str(e)


def test_interval_join_half_open(spark):
    points = _ts_df(
        spark, "pid", "pts",
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-03 00:00:00"), (4, "2024-01-04 00:00:00")],
    )
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
         (101, "2024-01-02 12:00:00", "2024-01-05 00:00:00")],
        ["iid", "s1", "s2"],
    ).select(
        "iid",
        F.col("s1").cast("timestamp").alias("start"),
        F.col("s2").cast("timestamp").alias("end"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in joins.interval_join(
            points, intervals, "pts", "start", "end", bucket_seconds=86400
        ).collect()
    }
    # p1,p2 ∈ i100; p3 at i100's end is excluded (half-open) but ∈ i101;
    # p4 ∈ i101
    assert got == {(1, 100), (2, 100), (3, 101), (4, 101)}


def test_interval_join_long_interval_no_dup(spark):
    # an interval spanning many buckets must still match each point once
    points = _ts_df(spark, "pid", "pts", [(1, "2024-01-05 00:00:00")])
    intervals = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-02-01 00:00:00")], ["iid", "s1", "s2"]
    ).select(
        "iid",
        F.col("s1").cast("timestamp").alias("start"),
        F.col("s2").cast("timestamp").alias("end"),
    )
    out = joins.interval_join(
        points, intervals, "pts", "start", "end", bucket_seconds=3600
    ).collect()
    assert len(out) == 1


def test_band_join_property_matches_reference(spark):
    """Property test: band_join equals the driver-side O(n·m) pair
    enumeration, across random timestamps straddling bin edges."""
    import datetime as dt
    import random

    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)
    band = 90  # seconds — not a divisor-friendly bin size
    for trial in range(3):
        lrows = [
            (i, base + dt.timedelta(seconds=rng.randint(0, 600)))
            for i in range(30)
        ]
        rrows = [
            (100 + i, base + dt.timedelta(seconds=rng.randint(0, 600)))
            for i in range(25)
        ]
        left = spark.createDataFrame(lrows, ["lid", "lts"])
        right = spark.createDataFrame(rrows, ["rid", "rts"])
        got = {
            (r["lid"], r["rid"])
            for r in joins.band_join(left, right, "lts", "rts", band).collect()
        }
        expect = {
            (li, ri)
            for li, lt in lrows
            for ri, rt in rrows
            if abs((lt - rt).total_seconds()) <= band
        }
        assert got == expect, trial
