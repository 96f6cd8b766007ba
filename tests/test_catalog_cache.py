"""catalog.load_table's session-scoped handle cache (round 13):
re-loading a table must not re-list/re-read footers, but the cache
must never go stale — an overwritten file, a different path, or a
snapshot-managed table must all bypass or invalidate it."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from group5_spark.catalog import _TABLE_CACHE, load_table

SF = "/root/testdata/sf0.001"


def test_same_handle_returned_within_session(spark):
    a = load_table(spark, SF, "nation")
    b = load_table(spark, SF, "nation")
    assert a is b
    assert a.count() == 25


def test_overwrite_invalidates_cache(spark, tmp_path):
    d = str(tmp_path / "cachedir")
    (tmp_path / "cachedir").mkdir()
    shutil.copy(f"{SF}/nation.parquet", f"{d}/nation.parquet")
    first = load_table(spark, d, "nation")
    n1 = first.count()
    assert n1 == 25
    # overwrite the file with different content (the supplier table)
    shutil.copy(f"{SF}/supplier.parquet", f"{d}/nation.parquet")
    second = load_table(spark, d, "nation")
    assert second is not first
    assert "s_suppkey" in second.columns
    # the stale generation is evicted, not accumulated
    path = f"{d}/nation.parquet"
    entries = [k for k in _TABLE_CACHE[spark] if k[0] == path]
    assert len(entries) == 1


def test_events_rebuild_survives_cache(spark):
    ev1 = load_table(spark, SF, "events")
    ev2 = load_table(spark, SF, "events")
    assert ev1 is ev2
    assert dict(ev1.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    # the nanosAsLong conf is re-asserted on hits
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_snapshot_tables_never_cached(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit

    d = str(tmp_path / "snapdir")
    snapshot_commit(
        spark.range(3).select(F.col("id").alias("r_regionkey")),
        f"{d}/region",
    )
    before = dict(_TABLE_CACHE.get(spark) or {})
    df = load_table(spark, d, "region")
    assert df.count() == 3
    after = dict(_TABLE_CACHE.get(spark) or {})
    assert set(after) == set(before), "snapshot read must not enter the cache"
