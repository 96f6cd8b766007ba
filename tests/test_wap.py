"""Write-Audit-Publish (medallion/wap.py): stage writes on an
isolated audit clone, validate there, publish to the main table as one
atomic zero-copy metadata commit. The contract under test: production
readers see the pre-audit version until the instant of publish and the
fully-audited version after; a failed audit or lost race leaves the
main table byte-identical; publish moves directories, never data
bytes; and every mask written during the audit (DV, equality) keeps
masking after publish."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from group5_spark.medallion.maintenance import (
    snapshot_delete,
    snapshot_eq_upsert,
)
from group5_spark.medallion.snapshots import (
    ConstraintViolation,
    SnapshotConflict,
    snapshot_commit,
    snapshot_expire,
    snapshot_read,
    snapshot_tags,
)
from group5_spark.medallion.wap import wap_abort, wap_begin, wap_publish


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )


def _ids(spark, t, **kw):
    return {r["id"] for r in snapshot_read(spark, t, **kw).collect()}


def test_publish_appends_atomically_and_consumes_audit(spark, tmp_path):
    src = str(tmp_path / "main")
    audit = str(tmp_path / "audit")
    snapshot_commit(_df(spark, 0, 50), src, stats_cols=["id"])
    wap_begin(src, audit)
    # the pin tag freezes the begin version against expire
    assert snapshot_tags(src) == {"wap-audit": 1}
    snapshot_commit(_df(spark, 50, 80), audit, mode="append")
    # isolation: main still serves the pre-audit state
    assert _ids(spark, src) == set(range(50))
    v = wap_publish(src, audit)
    assert v == 2
    assert _ids(spark, src) == set(range(80))
    # time travel to the pre-publish version still works
    assert _ids(spark, src, version=1) == set(range(50))
    # audit table is consumed, pin released
    assert not Path(audit).exists()
    assert snapshot_tags(src) == {}


def test_publish_is_zero_copy(spark, tmp_path):
    """The audited batch's parquet files MOVE (same names, no
    rewrite); inherited files are referenced root-relative again."""
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 50), src)
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 50, 60), audit, mode="append")
    staged = {
        p.name for p in Path(audit).rglob("*.parquet")
    } - {p.name for p in Path(src).rglob("*.parquet")}
    assert staged  # the audit really staged new files
    wap_publish(src, audit)
    m = json.loads(
        sorted((Path(src) / "_manifests").glob("v00002.json"))[0].read_text()
    )
    # every reference is root-relative (no DV was involved)
    assert all(not Path(e["path"]).is_absolute() for e in m["files"])
    # the staged file names now live under src, byte-moved not rewritten
    src_names = {p.name for p in Path(src).rglob("*.parquet")}
    assert staged <= src_names


def test_constraints_travel_to_audit_and_bad_batch_never_lands(
    spark, tmp_path
):
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(
        _df(spark, 0, 50),
        src,
        constraints={"small_id": "id < 1000"},
    )
    wap_begin(src, audit)
    with pytest.raises(ConstraintViolation):
        snapshot_commit(
            spark.range(5000, 5003).select(
                "id", (F.col("id") % 5).alias("k")
            ),
            audit,
            mode="append",
        )
    wap_abort(src, audit)
    assert _ids(spark, src) == set(range(50))
    assert snapshot_tags(src) == {}
    assert not Path(audit).exists()


def test_publish_conflicts_when_main_moved(spark, tmp_path):
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 50), src)
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 50, 60), audit, mode="append")
    # a racing writer lands on main after begin
    snapshot_commit(_df(spark, 900, 910), src, mode="append")
    with pytest.raises(SnapshotConflict):
        wap_publish(src, audit)
    # main untouched by the failed publish; audit intact for replay
    assert _ids(spark, src) == set(range(50)) | set(range(900, 910))
    assert _ids(spark, audit) == set(range(60))
    wap_abort(src, audit)


def test_audit_dv_delete_on_inherited_file_keeps_masking(spark, tmp_path):
    """The dangerous rebase case: a DV written IN the audit against an
    inherited (absolute-path) file keys its sidecar rows on the
    absolute path. Publish must not orphan that mask — the deleted
    rows stay deleted on the main table."""
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 50), src, stats_cols=["id"])
    wap_begin(src, audit)
    snapshot_delete(spark, audit, [("id", "<", 10)], dv_threshold=1.0)
    assert _ids(spark, audit) == set(range(10, 50))
    v = wap_publish(src, audit)
    assert _ids(spark, src) == set(range(10, 50))
    # and the mask survives the next append on main
    snapshot_commit(_df(spark, 50, 55), src, mode="append")
    assert _ids(spark, src) == set(range(10, 55))
    # expire keeps every referenced dir (incl. the DV-coupled
    # absolute-path entry's dir and the moved sidecar dir)
    snapshot_expire(src, keep_last=0, orphan_grace_s=0.0)
    assert _ids(spark, src) == set(range(10, 55)), (
        "expire reclaimed a dir the published manifest references "
        f"(published v{v})"
    )


def test_expire_right_after_dv_publish_deletes_nothing_live(
    spark, tmp_path
):
    """Regression (round 8): the published manifest and the dropped
    pre-publish manifest must never reference the same bytes under
    DIFFERENT path forms — a raw string-compared live set aliased them
    apart and an aggressive expire unlinked files the head still
    referenced. Publish now rebases everything to relative AND expire
    compares resolved paths."""
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 50), src, stats_cols=["id"])
    wap_begin(src, audit)
    snapshot_delete(spark, audit, [("id", "<", 10)], dv_threshold=1.0)
    wap_publish(src, audit)
    # no alias can exist at all: every published ref is root-relative
    m = json.loads(
        sorted((Path(src) / "_manifests").glob("v00002.json"))[0].read_text()
    )
    assert all(not Path(e["path"]).is_absolute() for e in m["files"])
    assert all(
        not Path(e["dv"]["sidecar"]).is_absolute()
        for e in m["files"]
        if e.get("dv")
    )
    # the sharpest shape: expire IMMEDIATELY, keeping only the head
    snapshot_expire(src, keep_last=0, orphan_grace_s=0.0)
    assert _ids(spark, src) == set(range(10, 50))


def test_audit_eq_upsert_publishes_with_its_mask(spark, tmp_path):
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 20), src)
    wap_begin(src, audit)
    batch = spark.createDataFrame(
        [(5, 99), (100, 1)], ["id", "k"]
    ).select(F.col("id").cast("long"), F.col("k").cast("long"))
    snapshot_eq_upsert(spark, audit, batch, keys=["id"])
    wap_publish(src, audit)
    rows = {
        r["id"]: r["k"] for r in snapshot_read(spark, src).collect()
    }
    assert rows[5] == 99 and rows[100] == 1 and len(rows) == 21
    # the eq mask keeps applying through a later main-side append
    snapshot_commit(
        spark.createDataFrame([(200, 0)], "id long, k long"),
        src,
        mode="append",
    )
    rows = {
        r["id"]: r["k"] for r in snapshot_read(spark, src).collect()
    }
    assert rows[5] == 99 and len(rows) == 22


def test_abort_releases_pin_and_leaves_main_untouched(spark, tmp_path):
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 30), src)
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 30, 40), audit, mode="append")
    wap_abort(src, audit)
    assert _ids(spark, src) == set(range(30))
    assert snapshot_tags(src) == {}
    # a new session under the same audit name can begin again
    wap_begin(src, audit)
    wap_abort(src, audit)


def test_begin_pin_survives_main_expire(spark, tmp_path):
    """The wap tag anchors retention: an aggressive expire on main
    during the audit cannot reclaim files the audit references."""
    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 30), src)
    wap_begin(src, audit)
    # main moves on (overwrite drops v1 from the live set)...
    snapshot_commit(_df(spark, 500, 510), src)
    # ...and expires aggressively; the tag keeps v1's closure
    snapshot_expire(src, keep_last=0, orphan_grace_s=0.0)
    assert _ids(spark, audit) == set(range(30))
    wap_abort(src, audit)


def test_concurrent_expire_mid_publish_cannot_reclaim_moved_dirs(
    spark, tmp_path, monkeypatch
):
    """Round-8 review: rename preserves the audit-era mtime, so a WAP
    session older than the orphan grace window would move dirs into
    the main root that LOOK like expired-grace crash orphans during
    the rename→commit window. Publish refreshes their clocks; an
    expire racing exactly in that window must leave them alone."""
    import os
    import time

    from group5_spark.medallion import wap as wap_mod
    from group5_spark.medallion.snapshots import _metadata_commit

    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(_df(spark, 0, 30), src)
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 30, 40), audit, mode="append")
    # age the audit's staging dirs past any realistic grace window
    old = time.time() - 3600
    for d in Path(audit).glob("data-*"):
        os.utime(d, (old, old))

    def racing_commit(root, build):
        # the worst instant: dirs moved, manifest not yet committed —
        # a concurrent nightly expire fires with a 60 s grace window
        snapshot_expire(src, keep_last=5, orphan_grace_s=60.0)
        return _metadata_commit(root, build)

    monkeypatch.setattr(wap_mod, "_metadata_commit", racing_commit)
    wap_publish(src, audit)
    assert _ids(spark, src) == set(range(40))


def test_randomized_wap_sessions_match_model(spark, tmp_path):
    """Seeded randomized WAP lifecycle against a set model: a sequence
    of sessions, each staging appends and/or DV deletes on the audit,
    randomly interleaved with MAIN-side appends. A session whose main
    moved must conflict at publish (and abort cleanly); a session
    whose main held still must publish its audited state atomically.
    The model applies exactly the published sessions' effects plus the
    main-side appends — checked after every session end. One
    deterministic sequence, so a failure replays exactly; the point is
    the begin/write/race/publish interleavings no targeted test
    covers."""
    import random

    rng = random.Random(41)
    src = str(tmp_path / "main")
    snapshot_commit(_df(spark, 0, 100), src, stats_cols=["id"])
    model = set(range(100))
    next_id = 1000

    for session in range(6):
        audit = str(tmp_path / f"a{session}")
        wap_begin(src, audit)
        staged_adds: set[int] = set()
        staged_dels: set[int] = set()
        raced = False
        for _ in range(rng.randrange(1, 4)):
            op = rng.choice(["audit_add", "audit_del", "main_add"])
            if op == "audit_add":
                lo = next_id
                next_id += rng.randrange(5, 20)
                snapshot_commit(
                    _df(spark, lo, next_id), audit, mode="append"
                )
                staged_adds |= set(range(lo, next_id))
            elif op == "audit_del" and model:
                cut = rng.choice(sorted(model))
                snapshot_delete(
                    spark, audit, [("id", "<", cut)], dv_threshold=1.0
                )
                staged_dels |= {
                    i for i in (model | staged_adds) if i < cut
                }
                staged_adds -= staged_dels
            elif op == "main_add":
                lo = next_id
                next_id += rng.randrange(5, 20)
                snapshot_commit(
                    _df(spark, lo, next_id), src, mode="append"
                )
                model |= set(range(lo, next_id))
                raced = True
        if raced:
            import pytest as _pytest

            with _pytest.raises(SnapshotConflict):
                wap_publish(src, audit)
            wap_abort(src, audit)  # audited work discarded
        else:
            wap_publish(src, audit)
            model = (model - staged_dels) | staged_adds
        assert _ids(spark, src) == model, f"diverged after session {session}"
        from group5_spark.medallion.snapshots import snapshot_tags

        assert snapshot_tags(src) == {}, "pin leaked"


def test_wap_audit_runs_declarative_quality_gate_before_publish(
    spark, tmp_path
):
    """The full WAP story with the quality module as the AUDIT step:
    the auditor runs declarative checks against the audit table —
    production never sees a row — and publishes only a passing state.
    A failing batch is visible to the audit reader, caught by the
    report, and discarded with the session."""
    from group5_spark import quality as Q

    src, audit = str(tmp_path / "m"), str(tmp_path / "a")
    snapshot_commit(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(20)], "id long, user string"
        ),
        src,
    )

    def audit_report(path):
        return {
            r["check_name"]: r["passed"]
            for r in Q.run_checks(
                snapshot_read(spark, path),
                [Q.not_null("user"), Q.unique("id")],
            ).collect()
        }

    # attempt 1: a bad batch (NULL user + duplicate id) — the audit
    # reader sees it, the gate fails, the session aborts
    wap_begin(src, audit)
    snapshot_commit(
        spark.createDataFrame(
            [(5, None), (30, "u30")], "id long, user string"
        ),
        audit,
        mode="append",
    )
    report = audit_report(audit)
    assert not all(report.values())
    wap_abort(src, audit)
    assert snapshot_read(spark, src).count() == 20  # nothing leaked

    # attempt 2: the corrected batch passes the same gate and ships
    wap_begin(src, audit)
    snapshot_commit(
        spark.createDataFrame(
            [(30, "u30"), (31, "u31")], "id long, user string"
        ),
        audit,
        mode="append",
    )
    assert all(audit_report(audit).values())
    wap_publish(src, audit)
    assert snapshot_read(spark, src).count() == 22


def test_publish_exdev_fails_fast_with_clean_rollback(
    spark, tmp_path, monkeypatch
):
    """VERDICT r8 #6: a cross-device audit/main layout must fail with
    an actionable same-filesystem message, every already-moved staging
    dir must rename BACK, and the main table must be byte-untouched —
    not surface a raw OSError mid-publish with dirs half-moved."""
    import errno
    import os

    src = str(tmp_path / "main")
    audit = str(tmp_path / "audit")
    snapshot_commit(_df(spark, 0, 40), src, stats_cols=["id"])
    wap_begin(src, audit)
    # two appends → two audit-local staging dirs, so the EXDEV on the
    # SECOND rename exercises the rollback of the first
    snapshot_commit(_df(spark, 40, 60), audit, mode="append")
    snapshot_commit(_df(spark, 60, 70), audit, mode="append")
    audit_dirs_before = sorted(
        p.name for p in Path(audit).iterdir() if p.is_dir()
    )
    main_entries_before = sorted(p.name for p in Path(src).iterdir())

    real_rename = os.rename
    calls = {"n": 0}

    def exdev_on_second(a, b):
        calls["n"] += 1
        if calls["n"] == 2 and str(a).startswith(audit):
            raise OSError(errno.EXDEV, "Invalid cross-device link")
        return real_rename(a, b)

    monkeypatch.setattr(os, "rename", exdev_on_second)
    with pytest.raises(OSError) as ei:
        wap_publish(src, audit)
    assert ei.value.errno == errno.EXDEV
    assert "SAME filesystem" in str(ei.value)
    monkeypatch.undo()

    # clean rollback: audit intact (both staging dirs back), main
    # untouched, pin still held — a re-begin-after-relayout can replay
    assert sorted(
        p.name for p in Path(audit).iterdir() if p.is_dir()
    ) == audit_dirs_before
    assert sorted(p.name for p in Path(src).iterdir()) == main_entries_before
    assert _ids(spark, src) == set(range(40))
    assert snapshot_tags(src) == {"wap-audit": 1}
    wap_abort(src, audit)


def test_publish_cleanup_failure_reports_published_version(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: a drop-tag failure AFTER the metadata commit used to
    leave the pin + audit lingering behind an opaque error; now it
    raises WapCleanupError carrying the durable published version and
    wap_abort finishes the cleanup."""
    from group5_spark.medallion import wap as wap_mod
    from group5_spark.medallion.wap import WapCleanupError

    src = str(tmp_path / "main")
    audit = str(tmp_path / "audit")
    snapshot_commit(_df(spark, 0, 30), src, stats_cols=["id"])
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 30, 45), audit, mode="append")

    def boom(path, tag):
        raise PermissionError(f"cannot drop {tag}")

    monkeypatch.setattr(wap_mod, "snapshot_drop_tag", boom)
    with pytest.raises(WapCleanupError) as ei:
        wap_publish(src, audit)
    monkeypatch.undo()
    # the publish IS durable: version advanced, audited rows serve
    assert ei.value.published_version == 2
    assert "wap_abort" in str(ei.value)
    assert _ids(spark, src) == set(range(45))
    # the documented recovery path clears the leftovers
    wap_abort(src, audit)
    assert snapshot_tags(src) == {}
    assert not Path(audit).exists()


def test_publish_cleanup_interrupt_propagates_unwrapped(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9: cleanup used to catch BaseException and rewrap as
    WapCleanupError (a RuntimeError), so a Ctrl-C during cleanup could
    be swallowed by upstream `except Exception` handlers. A
    KeyboardInterrupt must propagate as ITSELF; the publish is still
    durable underneath it."""
    from group5_spark.medallion import wap as wap_mod

    src = str(tmp_path / "main")
    audit = str(tmp_path / "audit")
    snapshot_commit(_df(spark, 0, 30), src, stats_cols=["id"])
    wap_begin(src, audit)
    snapshot_commit(_df(spark, 30, 45), audit, mode="append")

    def interrupted(path, tag):
        raise KeyboardInterrupt

    monkeypatch.setattr(wap_mod, "snapshot_drop_tag", interrupted)
    with pytest.raises(KeyboardInterrupt):
        wap_publish(src, audit)
    monkeypatch.undo()
    # the commit preceded the interrupt: the publish is durable
    assert _ids(spark, src) == set(range(45))
    wap_abort(src, audit)
    assert snapshot_tags(src) == {}
