"""MERGE-into-Parquet semantics (medallion.merge): Delta-style
upsert/delete with partition-pruned rewrite."""

from __future__ import annotations

import os

import pytest

from group5_spark.medallion.merge import merge_into


def _write_target(spark, path, rows, partition_col=None):
    df = spark.createDataFrame(rows, ["id", "d", "v", "seq"])
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)


BASE = [
    (1, "2024-01-01", "a", 1),
    (2, "2024-01-01", "b", 1),
    (3, "2024-01-02", "c", 1),
    (4, "2024-01-03", "d", 1),
]


def _read(spark, path):
    # partition-type inference reads "2024-01-01" dirs back as DATE;
    # normalize to string for comparison
    return {
        r["id"]: (str(r["d"]), r["v"], r["seq"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame(
        [(2, "2024-01-01", "B2", 2), (5, "2024-01-02", "e", 1)],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(spark, path, src, ["id"], partition_col="d")
    assert counts == {"inserted": 1, "updated": 1, "deleted": 0, "kept": 2}
    got = _read(spark, path)
    assert got[2] == ("2024-01-01", "B2", 2)
    assert got[5] == ("2024-01-02", "e", 1)
    assert got[1] == ("2024-01-01", "a", 1)
    assert len(got) == 5


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    before = sorted(os.listdir(os.path.join(path, "d=2024-01-03")))
    src = spark.createDataFrame([(2, "2024-01-01", "B2", 2)], ["id", "d", "v", "seq"])
    merge_into(spark, path, src, ["id"], partition_col="d")
    after = sorted(os.listdir(os.path.join(path, "d=2024-01-03")))
    assert before == after  # same physical files: partition pruned


def test_delete_mode(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame(
        [(3, "2024-01-02", "c", 1)], ["id", "d", "v", "seq"]
    )
    counts = merge_into(
        spark, path, src, ["id"], partition_col="d",
        when_matched="delete", when_not_matched="ignore",
    )
    assert counts["deleted"] == 1
    got = _read(spark, path)
    assert 3 not in got and len(got) == 3
    # the 01-02 partition became empty and was removed entirely
    assert not os.path.isdir(os.path.join(path, "d=2024-01-02"))


def test_sequence_gating(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, [(1, "2024-01-01", "a", 5)], partition_col="d")
    stale = spark.createDataFrame([(1, "2024-01-01", "OLD", 3)], ["id", "d", "v", "seq"])
    counts = merge_into(
        spark, path, stale, ["id"], partition_col="d", sequence_col="seq"
    )
    assert counts == {"inserted": 0, "updated": 0, "deleted": 0, "kept": 1}
    assert _read(spark, path)[1] == ("2024-01-01", "a", 5)
    fresh = spark.createDataFrame([(1, "2024-01-01", "NEW", 9)], ["id", "d", "v", "seq"])
    counts = merge_into(
        spark, path, fresh, ["id"], partition_col="d", sequence_col="seq"
    )
    assert counts["updated"] == 1
    assert _read(spark, path)[1] == ("2024-01-01", "NEW", 9)


def test_duplicate_source_keys_raise(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame(
        [(1, "2024-01-01", "x", 1), (1, "2024-01-01", "y", 2)],
        ["id", "d", "v", "seq"],
    )
    with pytest.raises(ValueError, match="duplicate key"):
        merge_into(spark, path, src, ["id"], partition_col="d")


def test_unpartitioned_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE)
    src = spark.createDataFrame(
        [(4, "2024-01-03", "D2", 2), (6, "2024-01-04", "f", 1)],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(spark, path, src, ["id"])
    assert counts == {"inserted": 1, "updated": 1, "deleted": 0, "kept": 3}
    got = _read(spark, path)
    assert got[4] == ("2024-01-03", "D2", 2) and got[6] == ("2024-01-04", "f", 1)


def test_idempotent_rerun(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame(
        [(2, "2024-01-01", "B2", 2), (5, "2024-01-02", "e", 1)],
        ["id", "d", "v", "seq"],
    )
    merge_into(spark, path, src, ["id"], partition_col="d", sequence_col="seq")
    counts = merge_into(
        spark, path, src, ["id"], partition_col="d", sequence_col="seq"
    )
    # second apply of the same batch changes nothing beyond re-update
    assert counts["inserted"] == 0
    got = _read(spark, path)
    assert len(got) == 5 and got[2] == ("2024-01-01", "B2", 2)


def test_schema_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame([(1, "x")], ["id", "v"])
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_into(spark, path, src, ["id"], partition_col="d")


def test_merge_property_matches_dict_semantics(spark, tmp_path):
    """Property test: repeated random merges equal a driver-side dict
    replaying the same upserts (last-writer-wins by sequence)."""
    import random

    rng = random.Random(99)
    path = str(tmp_path / "t")
    state = {i: ("2024-01-0" + str(1 + i % 3), f"v{i}", 0) for i in range(8)}
    _write_target(
        spark, path, [(k, *v) for k, v in state.items()], partition_col="d"
    )
    for step in range(1, 4):
        batch = {}
        for _ in range(5):
            k = rng.randint(0, 11)
            # partition stays stable per key (merge contract)
            d = "2024-01-0" + str(1 + k % 3)
            seq = rng.choice([step - 1, step])  # sometimes stale
            batch[k] = (d, f"s{step}k{k}", seq)
        src = spark.createDataFrame(
            [(k, *v) for k, v in batch.items()], ["id", "d", "v", "seq"]
        )
        merge_into(
            spark, path, src, ["id"], partition_col="d", sequence_col="seq"
        )
        for k, (d, v, seq) in batch.items():
            if k not in state or seq >= state[k][2]:
                state[k] = (d, v, seq)
        assert _read(spark, path) == state, step


def test_delete_empties_partition_without_pruning(spark, tmp_path):
    """Full-table merge (prune_partitions=False) whose deletes empty a
    partition: the emptied directory must be removed, not left holding
    stale pre-merge files that would resurrect deleted rows on the
    next read (round-1 advisory regression)."""
    path = str(tmp_path / "t")
    _write_target(spark, path, BASE, partition_col="d")
    src = spark.createDataFrame(
        [(3, "2024-01-02", "c", 1)], ["id", "d", "v", "seq"]
    )
    counts = merge_into(
        spark, path, src, ["id"], partition_col="d",
        when_matched="delete", when_not_matched="ignore",
        prune_partitions=False,
    )
    assert counts["deleted"] == 1
    got = _read(spark, path)
    assert 3 not in got and len(got) == 3
    assert not os.path.isdir(os.path.join(path, "d=2024-01-02"))
    # untouched partitions survive the full-table rewrite with rows intact
    assert got[4] == ("2024-01-03", "d", 1)
