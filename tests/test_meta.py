"""Metadata introspection tables (medallion/meta.py): the table's own
manifests as DataFrames — file inventory and version history must
reflect exactly what the commit protocol recorded, at manifest cost
(no data scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from group5_spark.medallion.maintenance import snapshot_delete
from group5_spark.medallion.meta import (
    snapshot_files_df,
    snapshot_history_df,
)
from group5_spark.medallion.snapshots import snapshot_commit


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )


def test_files_df_reflects_layout_and_dv_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_commit(
        spark.range(0, 100)
        .select("id", (F.col("id") % 4).alias("p"))
        .repartitionByRange(4, "id"),
        t,
        stats_cols=["id"],
        bloom_cols=["id"],
    )
    snapshot_delete(spark, t, [("id", "<", 5)], dv_threshold=1.0)
    files = snapshot_files_df(spark, t)
    rows = files.collect()
    assert sum(r["rows"] for r in rows) == 100
    assert all("id" in r["stats_cols"] for r in rows)
    assert all("id" in r["bloom_cols"] for r in rows)
    masked = [r for r in rows if r["has_dv"]]
    assert masked and sum(r["dv_deleted"] for r in masked) == 5
    # time travel: the pre-delete version shows no DV
    v1 = snapshot_files_df(spark, t, version=1)
    assert v1.where("has_dv").count() == 0


def test_history_df_orders_versions_and_carries_ops(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 50), t)
    snapshot_commit(_df(spark, 50, 60), t, mode="append")
    snapshot_delete(spark, t, [("id", "<", 5)])
    hist = snapshot_history_df(spark, t).collect()
    assert [r["version"] for r in hist] == [3, 2, 1]
    assert hist[0]["op"] == "delete"
    # the append's footprint includes the carried parent files
    assert hist[1]["rows"] == 60 and hist[1]["n_files"] >= 2
    assert hist[0]["eq_sidecars"] == 0


def test_files_df_spark_manifest_path_matches_driver_path(spark, tmp_path):
    """VERDICT r9 #4: above the size threshold the manifest is parsed
    BY SPARK (subset schema + explode — no per-file driver tuples);
    the two paths must return identical rows, including DV state and
    stats/bloom key lists, on a partitioned table."""
    t = str(tmp_path / "tbl")
    snapshot_commit(
        spark.range(0, 120)
        .select("id", (F.col("id") % 3).cast("string").alias("p"))
        .repartition(2),
        t,
        partition_by="p",
        stats_cols=["id"],
        bloom_cols=["id"],
    )
    snapshot_delete(spark, t, [("id", "<", 7)], dv_threshold=1.0)

    def norm(df):
        return sorted(
            (
                r["path"], r["bytes"], r["rows"], r["seq"], r["partition"],
                r["partition_col"], r["has_dv"], r["dv_deleted"],
                tuple(r["stats_cols"]), tuple(r["bloom_cols"]),
            )
            for r in df.collect()
        )

    driver = snapshot_files_df(spark, t, spark_manifest_bytes=1 << 40)
    via_spark = snapshot_files_df(spark, t, spark_manifest_bytes=0)
    # same column names and types (nullability flags may differ — the
    # computed has_dv/coalesce columns are provably non-null)
    assert [(f.name, f.dataType) for f in driver.schema] == [
        (f.name, f.dataType) for f in via_spark.schema
    ]
    got_d, got_s = norm(driver), norm(via_spark)
    assert got_d == got_s and got_d
    assert any(r[6] for r in got_d)  # the DV actually shows on both


def test_files_df_empty_dv_object_same_on_both_paths(spark, tmp_path):
    """ADVICE r9: the driver path keyed has_dv on truthiness
    (bool({}) is False) while the Spark path keys on presence
    (isNotNull), so a manifest entry carrying an EMPTY dv object broke
    the 'identical rows' contract. Both paths must key on presence."""
    import json
    from pathlib import Path

    from group5_spark.medallion.snapshots import _manifest_path

    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 40).coalesce(1), t)
    mp = _manifest_path(Path(t), 1)
    m = json.loads(mp.read_text())
    m["files"][0]["dv"] = {}
    mp.write_text(json.dumps(m))

    driver = snapshot_files_df(spark, t, spark_manifest_bytes=1 << 40)
    via_spark = snapshot_files_df(spark, t, spark_manifest_bytes=0)
    d = [(r["path"], r["has_dv"], r["dv_deleted"]) for r in driver.collect()]
    s = [
        (r["path"], r["has_dv"], r["dv_deleted"])
        for r in via_spark.collect()
    ]
    assert sorted(d) == sorted(s)
    assert all(r[1] for r in d) and all(r[2] == 0 for r in d)


def test_partitions_df_rollup_and_rent(spark, tmp_path):
    from group5_spark.medallion.meta import snapshot_partitions_df

    t = str(tmp_path / "tbl")
    base = spark.range(0, 90).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    )
    snapshot_commit(
        base.repartition(1, "p"), t, partition_by="p", stats_cols=["id"]
    )
    # an append adds a second file to every partition it touches
    snapshot_commit(
        spark.range(90, 120)
        .select("id", F.lit("0").alias("p"))
        .repartition(1, "p"),
        t,
        mode="append",
        partition_by="p",
    )
    snapshot_delete(spark, t, [("id", "<", 6)], dv_threshold=1.0)
    parts = {
        r["partition"]: r
        for r in snapshot_partitions_df(spark, t).collect()
    }
    assert set(parts) == {"0", "1", "2"}
    assert parts["0"]["n_files"] == 2 and parts["1"]["n_files"] == 1
    assert parts["0"]["rows"] == 60  # 30 base + 30 appended
    # ids 0..5 mask across p=0 (0,3), p=1 (1,4), p=2 (2,5)
    assert all(parts[p]["dv_deleted"] == 2 for p in "012")
    assert parts["0"]["live_rows"] == 58
    assert parts["0"]["dv_files"] == 1  # only the base file is masked
    assert parts["0"]["last_seq"] >= parts["1"]["last_seq"]
    # the rollup equals the files table it aggregates (spark path too)
    via_spark = {
        r["partition"]: r
        for r in snapshot_partitions_df(
            spark, t, spark_manifest_bytes=0
        ).collect()
    }
    assert {p: tuple(r) for p, r in parts.items()} == {
        p: tuple(r) for p, r in via_spark.items()
    }


def test_partitions_df_unpartitioned_single_row(spark, tmp_path):
    from group5_spark.medallion.meta import snapshot_partitions_df

    t = str(tmp_path / "tbl")
    snapshot_commit(_df(spark, 0, 40).repartition(3), t)
    rows = snapshot_partitions_df(spark, t).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["partition"] is None and r["partition_col"] is None
    assert r["rows"] == 40 and r["n_files"] == 3 and r["dv_deleted"] == 0
