"""SCD Type 2 semantics (medallion.scd): history accumulation,
current-partition swap, append-only history."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from group5_spark.medallion.scd import read_scd2, scd2_apply, scd2_init


def _init(spark, path, rows, ts):
    df = spark.createDataFrame(rows, ["id", "segment", "balance"])
    scd2_init(df, ts).write.mode("overwrite").partitionBy("is_current").parquet(path)


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["id", "segment", "balance"])


def _rows(spark, path):
    return {
        (r["id"], bool(r["is_current"])): (
            r["segment"],
            r["balance"],
            str(r["valid_from"]),
            str(r["valid_to"]),
        )
        for r in read_scd2(spark, path).collect()
    }


def test_first_apply_tracks_change_new_unchanged(spark, tmp_path):
    path = str(tmp_path / "dim")
    _init(spark, path, [(1, "GOLD", 10), (2, "SILVER", 5)], "2024-01-01 00:00:00")
    counts = scd2_apply(
        spark,
        path,
        _snap(spark, [(1, "PLATINUM", 10), (2, "SILVER", 5), (3, "BRONZE", 1)]),
        "id",
        "2024-02-01 00:00:00",
    )
    assert counts == {"new": 1, "changed": 1, "unchanged": 1, "closed": 0}
    got = _rows(spark, path)
    # closed historical row for id=1 with the old value
    assert got[(1, False)] == (
        "GOLD", 10, "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    )
    # new current row for id=1
    assert got[(1, True)] == ("PLATINUM", 10, "2024-02-01 00:00:00", "None")
    # unchanged keeps original valid_from
    assert got[(2, True)] == ("SILVER", 5, "2024-01-01 00:00:00", "None")
    assert got[(3, True)] == ("BRONZE", 1, "2024-02-01 00:00:00", "None")


def test_missing_key_kept_or_closed(spark, tmp_path):
    path = str(tmp_path / "dim")
    _init(spark, path, [(1, "GOLD", 10), (2, "SILVER", 5)], "2024-01-01 00:00:00")
    # incremental snapshot: absent id=2 stays current
    scd2_apply(spark, path, _snap(spark, [(1, "GOLD", 10)]), "id", "2024-02-01 00:00:00")
    got = _rows(spark, path)
    assert got[(2, True)][0] == "SILVER"
    # full snapshot with close_missing: id=2 is closed
    counts = scd2_apply(
        spark, path, _snap(spark, [(1, "GOLD", 10)]), "id",
        "2024-03-01 00:00:00", close_missing=True,
    )
    assert counts["closed"] == 1
    got = _rows(spark, path)
    assert (2, True) not in got
    assert got[(2, False)] == (
        "SILVER", 5, "2024-01-01 00:00:00", "2024-03-01 00:00:00"
    )


def test_history_files_append_only(spark, tmp_path):
    path = str(tmp_path / "dim")
    _init(spark, path, [(1, "GOLD", 10)], "2024-01-01 00:00:00")
    scd2_apply(spark, path, _snap(spark, [(1, "A", 1)]), "id", "2024-02-01 00:00:00")
    hist_dir = os.path.join(path, "is_current=false")
    before = set(os.listdir(hist_dir))
    scd2_apply(spark, path, _snap(spark, [(1, "B", 2)]), "id", "2024-03-01 00:00:00")
    after = set(os.listdir(hist_dir))
    # old history files are still there untouched; new ones appended
    assert before - {"_SUCCESS"} <= after
    assert len(after) > len(before - {"_SUCCESS"})


def test_idempotent_same_snapshot(spark, tmp_path):
    path = str(tmp_path / "dim")
    _init(spark, path, [(1, "GOLD", 10), (2, "SILVER", 5)], "2024-01-01 00:00:00")
    snap = _snap(spark, [(1, "GOLD", 10), (2, "SILVER", 5)])
    counts = scd2_apply(spark, path, snap, "id", "2024-02-01 00:00:00")
    assert counts == {"new": 0, "changed": 0, "unchanged": 2, "closed": 0}
    counts = scd2_apply(spark, path, snap, "id", "2024-03-01 00:00:00")
    assert counts == {"new": 0, "changed": 0, "unchanged": 2, "closed": 0}
    assert len(_rows(spark, path)) == 2  # no history rows ever created


def test_three_versions_history_chain(spark, tmp_path):
    path = str(tmp_path / "dim")
    _init(spark, path, [(1, "A", 1)], "2024-01-01 00:00:00")
    scd2_apply(spark, path, _snap(spark, [(1, "B", 1)]), "id", "2024-02-01 00:00:00")
    scd2_apply(spark, path, _snap(spark, [(1, "C", 1)]), "id", "2024-03-01 00:00:00")
    df = read_scd2(spark, path).filter(F.col("id") == 1).orderBy("valid_from")
    rows = [
        (r["segment"], str(r["valid_from"]), str(r["valid_to"]), bool(r["is_current"]))
        for r in df.collect()
    ]
    assert rows == [
        ("A", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
        ("B", "2024-02-01 00:00:00", "2024-03-01 00:00:00", False),
        ("C", "2024-03-01 00:00:00", "None", True),
    ]
    # point-in-time lookup: who was current on Feb 15?
    asof = df.filter(
        (F.col("valid_from") <= "2024-02-15")
        & (F.col("valid_to").isNull() | (F.col("valid_to") > "2024-02-15"))
    )
    assert [r["segment"] for r in asof.collect()] == ["B"]
