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
