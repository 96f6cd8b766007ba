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


# ---------------------------------------------------------------------------
# snapshot_merge: MERGE INTO on snapshot-versioned tables
# ---------------------------------------------------------------------------


def _snap_df(spark, rows):
    return spark.createDataFrame(rows, ["id", "d", "v", "seq"])


def _snap_read(spark, path, version=None):
    from group5_spark.medallion.snapshots import snapshot_read

    return {
        r["id"]: (str(r["d"]), r["v"], r["seq"])
        for r in snapshot_read(spark, path, version=version).collect()
    }


def test_snapshot_merge_equals_hive_merge(spark, tmp_path):
    """The snapshot MERGE must produce byte-for-byte the same table
    content and action counts as the proven Hive-layout merge_into on
    identical target + source."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    hive = str(tmp_path / "hive")
    snapt = str(tmp_path / "snap")
    _write_target(spark, hive, BASE)
    snapshot_commit(_snap_df(spark, BASE), snapt, stats_cols=["id"])
    src = spark.createDataFrame(
        [(2, "2024-01-01", "B2", 2), (5, "2024-01-02", "e", 1)],
        ["id", "d", "v", "seq"],
    )
    hive_counts = merge_into(spark, hive, src, ["id"])
    out = snapshot_merge(spark, snapt, src, ["id"])
    assert {k: out[k] for k in ("inserted", "updated", "deleted")} == {
        k: hive_counts[k] for k in ("inserted", "updated", "deleted")
    }
    assert _read(spark, hive) == _snap_read(spark, snapt)
    # time travel: the pre-merge version is intact
    assert _snap_read(spark, snapt, version=1) == {
        r[0]: (r[1], r[2], r[3]) for r in BASE
    }


def test_snapshot_merge_file_pruned_by_key_range(spark, tmp_path):
    """Only files whose manifest key range intersects the source
    batch's keys are rewritten; the rest carry by reference (same
    entries, byte-identical paths)."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import (
        snapshot_commit,
        snapshot_manifest,
    )

    t = str(tmp_path / "t")
    # three files with disjoint id ranges
    snapshot_commit(
        _snap_df(spark, [(i, "d", f"v{i}", 1) for i in range(0, 10)]).coalesce(1),
        t, stats_cols=["id"],
    )
    for lo in (100, 200):
        snapshot_commit(
            _snap_df(
                spark, [(i, "d", f"v{i}", 1) for i in range(lo, lo + 10)]
            ).coalesce(1),
            t, mode="append", stats_cols=["id"],
        )
    before = snapshot_manifest(t)
    src = _snap_df(spark, [(105, "d", "UP", 2), (106, "d", "NEW", 2)])
    out = snapshot_merge(spark, t, src, ["id"])
    assert out["files_rewritten"] == 1 and out["files_carried"] == 2
    assert out["updated"] == 2 and out["inserted"] == 0
    after = snapshot_manifest(t)
    carried_paths = {e["path"] for e in before["files"]} & {
        e["path"] for e in after["files"]
    }
    assert len(carried_paths) == 2  # two files carried verbatim
    got = _snap_read(spark, t)
    assert got[105] == ("d", "UP", 2) and got[106] == ("d", "NEW", 2)
    assert len(got) == 30


def test_snapshot_merge_bloom_sharpened_pruning(spark, tmp_path):
    """Interleaved key ranges: min/max overlap every file, but the
    per-file bloom proves the source keys absent from one — only the
    other is rewritten."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    t = str(tmp_path / "t")
    evens = _snap_df(
        spark, [(i, "d", "e", 1) for i in range(0, 100, 2)]
    ).coalesce(1)
    odds = _snap_df(
        spark, [(i, "d", "o", 1) for i in range(1, 100, 2)]
    ).coalesce(1)
    snapshot_commit(evens, t, stats_cols=["id"], bloom_cols=["id"])
    snapshot_commit(
        odds, t, mode="append", stats_cols=["id"], bloom_cols=["id"]
    )
    src = _snap_df(spark, [(31, "d", "O2", 2)])  # odd key only
    out = snapshot_merge(spark, t, src, ["id"])
    assert out["files_rewritten"] == 1 and out["files_carried"] == 1
    assert out["updated"] == 1
    got = _snap_read(spark, t)
    assert got[31] == ("d", "O2", 2) and len(got) == 100


def test_snapshot_merge_insert_only_fast_path(spark, tmp_path):
    """A source whose keys provably match nothing degrades to an
    append-shaped commit: zero files rewritten, zero reads of the
    table, every row inserted."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    t = str(tmp_path / "t")
    snapshot_commit(
        _snap_df(spark, [(i, "d", f"v{i}", 1) for i in range(10)]),
        t, stats_cols=["id"],
    )
    src = _snap_df(spark, [(i, "d", "new", 1) for i in range(500, 505)])
    out = snapshot_merge(spark, t, src, ["id"])
    assert out["files_rewritten"] == 0
    assert out["inserted"] == 5 and out["updated"] == 0
    assert len(_snap_read(spark, t)) == 15


def test_snapshot_merge_sequence_gating_and_delete(spark, tmp_path):
    """CDC sequence gating: a replayed older change never regresses a
    row; when_matched='delete' removes matched keys."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    t = str(tmp_path / "t")
    snapshot_commit(_snap_df(spark, BASE), t, stats_cols=["id"])
    snapshot_merge(
        spark, t,
        _snap_df(spark, [(2, "2024-01-01", "B5", 5)]),
        ["id"], sequence_col="seq",
    )
    # older replay (seq 3 < 5): must not regress
    out = snapshot_merge(
        spark, t,
        _snap_df(spark, [(2, "2024-01-01", "B3", 3)]),
        ["id"], sequence_col="seq",
    )
    assert out["updated"] == 0 and out["kept"] >= 1
    assert _snap_read(spark, t)[2] == ("2024-01-01", "B5", 5)
    # delete clause
    out = snapshot_merge(
        spark, t,
        _snap_df(spark, [(1, "2024-01-01", "x", 9)]),
        ["id"], when_matched="delete", when_not_matched="ignore",
    )
    assert out["deleted"] == 1
    assert 1 not in _snap_read(spark, t)


def test_snapshot_merge_constraint_enforced_and_crash_invisible(
    spark, tmp_path
):
    """A merged commit violating the table's CHECK constraint never
    becomes visible: no new version, staged files reclaimed, head rows
    untouched."""
    import pytest as _pytest

    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import (
        ConstraintViolation,
        snapshot_commit,
        snapshot_manifest,
    )
    from pathlib import Path

    t = str(tmp_path / "t")
    snapshot_commit(
        _snap_df(spark, BASE), t, stats_cols=["id"],
        constraints={"pos_seq": "seq > 0"},
    )
    n_dirs = len(list(Path(t).glob("data-*")))
    with _pytest.raises(ConstraintViolation):
        snapshot_merge(
            spark, t,
            _snap_df(spark, [(2, "2024-01-01", "bad", -1)]),
            ["id"],
        )
    assert snapshot_manifest(t)["version"] == 1
    assert _snap_read(spark, t)[2] == ("2024-01-01", "b", 1)
    assert len(list(Path(t).glob("data-*"))) == n_dirs


def test_snapshot_merge_creates_absent_table(spark, tmp_path):
    from group5_spark.medallion.maintenance import snapshot_merge

    t = str(tmp_path / "t")
    out = snapshot_merge(spark, t, _snap_df(spark, BASE), ["id"])
    assert out["version"] == 1 and out["inserted"] == 4
    assert len(_snap_read(spark, t)) == 4


def test_snapshot_merge_retries_past_racing_append(
    spark, tmp_path, monkeypatch
):
    """OCC: an append landing between the merge's head read and its
    commit raises SnapshotConflict internally; the merge re-prunes
    against the new head and retries — the racing rows survive."""
    from group5_spark.medallion import snapshots as snap
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    t = str(tmp_path / "t")
    snapshot_commit(_snap_df(spark, BASE), t, stats_cols=["id"])
    racing_rows = _snap_df(spark, [(42, "2024-01-09", "race", 1)])
    real_commit = snap.snapshot_commit
    state = {"raced": False}

    def racing(df, path_, **kw):
        if not state["raced"] and kw.get("expected_parent") is not None:
            state["raced"] = True
            real_commit(racing_rows, path_, mode="append")
        return real_commit(df, path_, **kw)

    monkeypatch.setattr(snap, "snapshot_commit", racing)
    out = snapshot_merge(
        spark, t,
        _snap_df(spark, [(2, "2024-01-01", "B2", 2)]),
        ["id"],
    )
    assert out["updated"] == 1
    got = _snap_read(spark, t)
    assert got[42] == ("2024-01-09", "race", 1)  # racing append intact
    assert got[2] == ("2024-01-01", "B2", 2)


def test_snapshot_merge_partitioned_table(spark, tmp_path):
    """MERGE on a Hive-partitioned snapshot table: layout preserved,
    a matched row may move partitions, manifest partition pruning
    still works afterwards."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import (
        prune_files,
        snapshot_commit,
        snapshot_manifest,
    )

    t = str(tmp_path / "t")
    snapshot_commit(
        _snap_df(spark, BASE), t, partition_by="d", stats_cols=["id"]
    )
    src = spark.createDataFrame(
        # id 3 moves from d=2024-01-02 to d=2024-01-05
        [(3, "2024-01-05", "moved", 2), (9, "2024-01-05", "new", 1)],
        ["id", "d", "v", "seq"],
    )
    out = snapshot_merge(spark, t, src, ["id"])
    assert out["updated"] == 1 and out["inserted"] == 1
    assert snapshot_manifest(t)["partition_by"] == "d"
    got = _snap_read(spark, t)
    assert got[3] == ("2024-01-05", "moved", 2)
    assert got[9] == ("2024-01-05", "new", 1)
    # partition pruning on the new head: the moved-to day resolves
    kept, total = prune_files(t, [("d", "=", "2024-01-05")])
    assert 0 < len(kept) < total


def test_matched_condition_gates_updates(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN UPDATE: matched rows failing the
    src/tgt condition (or evaluating it to NULL) keep the target row;
    unmatched source rows still insert unconditionally."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [
            (1, "2024-01-05", "z9", 9),  # cond true  -> updates
            (2, "2024-01-05", "B", 0),   # cond false -> keeps target
            (3, "2024-01-05", None, 9),  # cond NULL  -> keeps target
            (9, "2024-01-05", "z", 9),   # unmatched  -> inserts
        ],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(
        spark, p, src, keys=["id"],
        matched_condition="src.v > tgt.v AND src.seq > tgt.seq",
    )
    assert counts == {"inserted": 1, "updated": 1, "deleted": 0, "kept": 3}
    got = _read(spark, p)
    assert got[1] == ("2024-01-05", "z9", 9)
    assert got[2] == ("2024-01-01", "b", 1)  # condition false
    assert got[3] == ("2024-01-02", "c", 1)  # condition NULL
    assert got[9] == ("2024-01-05", "z", 9)


def test_update_set_partial_columns(spark, tmp_path):
    """UPDATE SET col = expr: listed columns evaluate their src/tgt
    expression, unlisted columns keep the target value on updated
    rows; inserted rows take the full source row. SETting a key or an
    unknown column is rejected."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(1, "2024-09-09", "NEW", 7), (9, "2024-09-09", "ins", 7)],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(
        spark, p, src, keys=["id"],
        update_set={"v": "concat(tgt.v, '+', src.v)", "seq": "src.seq"},
    )
    assert counts == {"inserted": 1, "updated": 1, "deleted": 0, "kept": 3}
    got = _read(spark, p)
    assert got[1] == ("2024-01-01", "a+NEW", 7)  # d kept, v/seq SET
    assert got[9] == ("2024-09-09", "ins", 7)    # insert = full source row

    with pytest.raises(ValueError, match="key columns"):
        merge_into(spark, p, src, keys=["id"], update_set={"id": "src.id"})
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(spark, p, src, keys=["id"], update_set={"nope": "1"})


def test_snapshot_merge_clauses_end_to_end(spark, tmp_path):
    """The same clause surface through the snapshot DML: a CDC batch
    whose condition gates on a src/tgt comparison, with partial-column
    SET — atomic commit, prune economics unchanged."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_read

    p = str(tmp_path / "snap")
    base = spark.range(100).select(
        F.col("id"),
        F.lit("x").alias("v"),
        (F.col("id") % 10).alias("score"),
    )
    snapshot_merge(spark, p, base, keys=["id"], validate_source_keys=False)
    batch = spark.range(20).select(
        F.col("id"),
        F.lit("upd").alias("v"),
        F.lit(5).alias("score"),
    )
    res = snapshot_merge(
        spark, p, batch, keys=["id"],
        matched_condition="src.score > tgt.score",  # ids with score<5
        update_set={"v": "src.v"},
        validate_source_keys=False,
    )
    # ids 0..19: score = id%10 -> id%10 < 5 on 10 of the 20
    assert res["updated"] == 10 and res["inserted"] == 0
    out = snapshot_read(spark, p)
    assert out.filter("v = 'upd'").count() == 10
    # partial SET: score column kept the target value on updated rows
    assert out.filter("v = 'upd' and score >= 5").count() == 0
    assert out.count() == 100


# ---------------------------------------------------------------------------
# round 6: full MERGE grammar — ordered WHEN MATCHED clauses, WHEN NOT
# MATCHED BY SOURCE, insert-column-subset — plus the NULL-key batch fix,
# sequence-carry on partial SET, and composite-key bloom pruning
# ---------------------------------------------------------------------------


def test_matched_clauses_ordered_first_wins(spark, tmp_path):
    """Multiple WHEN MATCHED clauses evaluate in order; the first
    whose condition passes decides the row (Delta's ordered rule)."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [
            (1, "2024-01-01", "KILL", 2),   # first clause: delete
            (2, "2024-01-01", "keep2", 2),  # second clause: partial SET
            (9, "2024-01-09", "new", 1),    # unmatched: insert
        ],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(
        spark, p, src, ["id"],
        matched_clauses=[
            {"condition": "src.v = 'KILL'", "action": "delete"},
            {"condition": None, "action": "update",
             "set": {"v": "concat(tgt.v, '+', src.v)"}},
        ],
    )
    assert counts == {"inserted": 1, "updated": 1, "deleted": 1, "kept": 2}
    got = _read(spark, p)
    assert 1 not in got
    assert got[2] == ("2024-01-01", "b+keep2", 1)
    assert got[9] == ("2024-01-09", "new", 1)


def test_matched_clauses_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(1, "2024-01-01", "x", 2)], ["id", "d", "v", "seq"]
    )
    with pytest.raises(ValueError, match="not both"):
        merge_into(
            spark, p, src, ["id"],
            matched_condition="src.v = 'x'",
            matched_clauses=[{"action": "update"}],
        )
    with pytest.raises(ValueError, match="update|delete"):
        merge_into(spark, p, src, ["id"],
                   matched_clauses=[{"action": "upsert"}])
    with pytest.raises(ValueError, match="no set"):
        merge_into(
            spark, p, src, ["id"],
            matched_clauses=[{"action": "delete", "set": {"v": "src.v"}}],
        )
    with pytest.raises(ValueError, match="must not be empty"):
        merge_into(spark, p, src, ["id"], matched_clauses=[])
    with pytest.raises(ValueError, match="key columns"):
        merge_into(
            spark, p, src, ["id"],
            matched_clauses=[{"action": "update", "set": {"id": "src.id"}}],
        )


def test_by_source_delete_full_sync(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE DELETE: target rows absent from the
    source batch are removed — the full-sync CDC pattern."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(1, "2024-01-01", "a2", 2), (9, "2024-01-09", "new", 1)],
        ["id", "d", "v", "seq"],
    )
    counts = merge_into(
        spark, p, src, ["id"], when_not_matched_by_source="delete"
    )
    assert counts["deleted"] == 3  # ids 2, 3, 4 absent from source
    assert counts["inserted"] == 1 and counts["updated"] == 1
    got = _read(spark, p)
    assert set(got) == {1, 9}


def test_by_source_update_with_condition(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE AND <cond> UPDATE SET: only target
    rows passing the tgt-side condition are touched."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(1, "2024-01-01", "a2", 2)], ["id", "d", "v", "seq"]
    )
    counts = merge_into(
        spark, p, src, ["id"],
        when_not_matched_by_source="update",
        not_matched_by_source_condition="tgt.d = '2024-01-01'",
        not_matched_by_source_set={"v": "'stale'"},
    )
    got = _read(spark, p)
    assert got[2] == ("2024-01-01", "stale", 1)      # condition passed
    assert got[3] == ("2024-01-02", "c", 1)           # condition failed
    assert got[4] == ("2024-01-03", "d", 1)
    assert counts["updated"] == 2  # id=1 (matched) + id=2 (by-source)


def test_by_source_requires_set_and_rejects_keys(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(1, "2024-01-01", "x", 2)], ["id", "d", "v", "seq"]
    )
    with pytest.raises(ValueError, match="requires"):
        merge_into(spark, p, src, ["id"], when_not_matched_by_source="update")
    with pytest.raises(ValueError, match="key columns"):
        merge_into(
            spark, p, src, ["id"],
            when_not_matched_by_source="update",
            not_matched_by_source_set={"id": "0"},
        )


def test_by_source_delete_lands_in_carried_file(spark, tmp_path):
    """The VERDICT caution case: a by-source delete must hit rows in a
    file the source keys never touch — snapshot_merge therefore
    disables pruning when the clause is present (every non-empty file
    is rewritten), and the far-range rows really are deleted."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    t = str(tmp_path / "t")
    # two files with disjoint id ranges: without the by-source clause
    # a src touching only 0..9 would carry the 100..109 file verbatim
    snapshot_commit(
        _snap_df(spark, [(i, "d", f"v{i}", 1) for i in range(10)]).coalesce(1),
        t, stats_cols=["id"],
    )
    snapshot_commit(
        _snap_df(
            spark, [(i, "d", f"v{i}", 1) for i in range(100, 110)]
        ).coalesce(1),
        t, mode="append", stats_cols=["id"],
    )
    src = _snap_df(spark, [(5, "d", "KEPT", 2)])
    # sanity: the same batch WITHOUT by-source carries the far file
    probe = snapshot_merge(spark, t, src, ["id"])
    assert probe["files_carried"] >= 1
    out = snapshot_merge(
        spark, t, src, ["id"], when_not_matched_by_source="delete"
    )
    assert out["files_carried"] == 0  # pruning disabled: all files in scope
    assert out["deleted"] == 19      # everything but id=5
    got = _snap_read(spark, t)
    assert set(got) == {5} and got[5] == ("d", "KEPT", 2)


def test_insert_column_subset(spark, tmp_path):
    """INSERT (cols) VALUES (exprs): listed columns evaluate over src,
    unlisted columns become typed NULLs; merge keys must be listed."""
    p = str(tmp_path / "t")
    _write_target(spark, p, BASE)
    src = spark.createDataFrame(
        [(9, "2024-01-09", "secret", 7)], ["id", "d", "v", "seq"]
    )
    merge_into(
        spark, p, src, ["id"],
        insert_values={"id": "src.id", "seq": "src.seq * 10"},
    )
    got = {
        r["id"]: (r["d"], r["v"], r["seq"])
        for r in __import__("pyspark").sql.SparkSession.active()
        .read.parquet(p).collect()
    }
    assert got[9] == (None, None, 70)
    with pytest.raises(ValueError, match="merge keys"):
        merge_into(spark, p, src, ["id"], insert_values={"v": "src.v"})


def test_all_null_key_batch_inserts_not_dropped(spark, tmp_path):
    """ADVICE (medium): a non-empty batch whose key columns are ALL
    NULL must insert its rows under when_not_matched='insert' —
    previously it early-returned as 'empty batch' and the rows
    silently vanished."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit, snapshot_read

    t = str(tmp_path / "t")
    snapshot_commit(_snap_df(spark, BASE), t, stats_cols=["id"])
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("d", StringType()),
            StructField("v", StringType()),
            StructField("seq", LongType()),
        ]
    )
    batch = spark.createDataFrame([(None, "dd", "nullkey", 1)], schema)
    out = snapshot_merge(spark, t, batch, ["id"])
    assert out["inserted"] == 1 and out["files_rewritten"] == 0
    rows = snapshot_read(spark, t).filter("v = 'nullkey'").collect()
    assert len(rows) == 1 and rows[0]["id"] is None
    # and under 'ignore' the batch is a no-op, not an error
    out2 = snapshot_merge(
        spark, t, batch, ["id"], when_not_matched="ignore"
    )
    assert out2["inserted"] == 0 and out2["files_rewritten"] == 0


def test_sequence_carried_on_partial_update_set(spark, tmp_path):
    """ADVICE (low): update_set omitting sequence_col must still carry
    the source's sequence on winning rows — otherwise a later replay
    between the stale and applied sequences regresses the SET columns."""
    p = str(tmp_path / "t")
    _write_target(spark, p, [(1, "2024-01-01", "a", 1)])
    merge_into(
        spark, p,
        spark.createDataFrame(
            [(1, "2024-01-01", "v5", 5)], ["id", "d", "v", "seq"]
        ),
        ["id"], sequence_col="seq", update_set={"v": "src.v"},
    )
    got = _read(spark, p)
    assert got[1] == ("2024-01-01", "v5", 5)  # sequence carried, not stale 1
    # the out-of-order replay (seq 3, between stale 1 and applied 5)
    # must now lose the >= gate
    counts = merge_into(
        spark, p,
        spark.createDataFrame(
            [(1, "2024-01-01", "v3", 3)], ["id", "d", "v", "seq"]
        ),
        ["id"], sequence_col="seq", update_set={"v": "src.v"},
    )
    assert counts["updated"] == 0
    assert _read(spark, p)[1] == ("2024-01-01", "v5", 5)


def test_src_tgt_column_collision_rejected(spark, tmp_path):
    """ADVICE (low): clause expressions reserve the struct names
    src/tgt; a table with a real column by either name must be
    rejected loudly instead of silently shadowing it."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "x", 1)], ["id", "src", "seq"])
    df.write.mode("overwrite").parquet(p)
    batch = spark.createDataFrame([(1, "y", 2)], ["id", "src", "seq"])
    with pytest.raises(ValueError, match="src"):
        merge_into(
            spark, p, batch, ["id"],
            matched_condition="src.seq > tgt.seq",
        )
    # without clause expressions the names are never reserved
    counts = merge_into(spark, p, batch, ["id"])
    assert counts["updated"] == 1


def test_composite_key_bloom_pruning(spark, tmp_path):
    """VERDICT #3: a 2-key merge where per-key ranges overlap every
    file but the composite (k1,k2) bloom proves the tuple absent from
    one — range-only pruning touches both files, tuple-bloom pruning
    touches exactly one."""
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import snapshot_commit

    def df2(rows):
        return spark.createDataFrame(rows, ["k1", "k2", "v"])

    # file A holds (i, i); file B holds (i, i+1) — k1 and k2 ranges
    # both span [0, 50] on each file, so per-key min/max cannot
    # separate them; only the tuple identity can
    a = df2([(i, i, "a") for i in range(50)]).coalesce(1)
    b = df2([(i, i + 1, "b") for i in range(50)]).coalesce(1)

    # WITHOUT the composite bloom: both files touched
    t0 = str(tmp_path / "plain")
    snapshot_commit(a, t0, stats_cols=["k1", "k2"])
    snapshot_commit(b, t0, mode="append", stats_cols=["k1", "k2"])
    src = df2([(5, 5, "UP")])  # lives in file A only
    out0 = snapshot_merge(spark, t0, src, ["k1", "k2"])
    assert out0["files_rewritten"] == 2  # range-blind

    # WITH the composite bloom ("k2,k1" spelling canonicalizes too):
    # the tuple (5,5) is provably absent from file B
    t1 = str(tmp_path / "bloomed")
    snapshot_commit(a, t1, stats_cols=["k1", "k2"], bloom_cols=["k2,k1"])
    snapshot_commit(
        b, t1, mode="append", stats_cols=["k1", "k2"], bloom_cols=["k1,k2"]
    )
    out1 = snapshot_merge(spark, t1, src, ["k1", "k2"])
    assert out1["files_rewritten"] == 1 and out1["files_carried"] == 1
    assert out1["updated"] == 1
    got = {
        (r["k1"], r["k2"]): r["v"]
        for r in __import__("group5_spark.medallion.snapshots", fromlist=["snapshot_read"])
        .snapshot_read(spark, t1).collect()
    }
    assert got[(5, 5)] == "UP" and got[(5, 6)] == "b"
    assert len(got) == 100
