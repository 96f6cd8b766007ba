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


def test_rename_overwrite_invalidates_cache(spark, tmp_path):
    """mv-over-the-path keeps no mtime/size guarantee but always
    changes the inode — the (st_ino, ...) token must catch it even
    when mtime and size are replicated exactly (round-14 hardening:
    the old (mtime_ns, size) token returned a stale handle here)."""
    import os

    d = str(tmp_path / "renamedir")
    (tmp_path / "renamedir").mkdir()
    shutil.copy(f"{SF}/nation.parquet", f"{d}/nation.parquet")
    first = load_table(spark, d, "nation")
    st = os.stat(f"{d}/nation.parquet")
    # stage a replacement with IDENTICAL size and mtime, different inode
    shutil.copy(f"{SF}/nation.parquet", f"{d}/staged")
    os.utime(f"{d}/staged", ns=(st.st_atime_ns, st.st_mtime_ns))
    os.replace(f"{d}/staged", f"{d}/nation.parquet")
    st2 = os.stat(f"{d}/nation.parquet")
    assert (st2.st_mtime_ns, st2.st_size) == (st.st_mtime_ns, st.st_size)
    second = load_table(spark, d, "nation")
    assert second is not first


def test_directory_dataset_child_rewrite_invalidates(spark, tmp_path):
    """A directory-shaped parquet dataset whose part-file is rewritten
    in place must not serve a stale handle: the token folds in the
    direct children's stats."""
    d = str(tmp_path / "dirds")
    (tmp_path / "dirds").mkdir()
    (tmp_path / "dirds" / "nation.parquet").mkdir()
    shutil.copy(f"{SF}/nation.parquet", f"{d}/nation.parquet/part-0.parquet")
    first = load_table(spark, d, "nation")
    assert first.count() == 25
    shutil.copy(f"{SF}/supplier.parquet", f"{d}/nation.parquet/part-0.parquet")
    second = load_table(spark, d, "nation")
    assert second is not first
    assert "s_suppkey" in second.columns


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
