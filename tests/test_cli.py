"""CLI contract tests (SURVEY §2 A13, A22-A23): the spark-submit
parameterization surface, end-to-end through __main__."""

from __future__ import annotations

import subprocess
import sys

import pytest

from group5_spark.pipeline import parse_conf


def test_parse_conf_splits_on_first_equals():
    conf = parse_conf(["spark.x=a=b", "k=v"])
    assert conf == {"spark.x": "a=b", "k": "v"}
    with pytest.raises(ValueError):
        parse_conf(["noequals"])


def test_cli_generate_then_run(tmp_path):
    landing = tmp_path / "landing"
    wh = tmp_path / "wh"
    env_cmd = [sys.executable, "-m", "group5_spark.pipeline"]
    gen = subprocess.run(
        env_cmd + [
            "generate", "--output_path", str(landing),
            "--n_customers", "30", "--n_products", "30",
            "--n_user_events", "120", "--n_transactions", "40",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert gen.returncode == 0, gen.stderr
    assert "landed 120 user events, 40 transactions" in gen.stdout

    run = subprocess.run(
        env_cmd + [
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "run", "--input_path", str(landing), "--output_path", str(wh),
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    for marker in ("etl:", "bronze:", "silver:", "gold:", "validate:"):
        assert marker in run.stdout
    assert (wh / "gold" / "agg_daily_revenue").exists()


def test_cli_maintain_compacts(spark, tmp_path):
    from group5_spark.medallion.maintenance import table_file_stats

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], ["id", "v"]
    ).repartition(8).write.parquet(path)
    n_before, _ = table_file_stats(path)[""]
    assert n_before > 1
    # subprocess, NOT in-process main(): main() stops its session on
    # exit, which would tear down the shared session-scoped fixture
    # (getOrCreate returns the same JVM session)
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "maintain", "--table_path", path, "--target_file_mb", "1024"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    n_after, _ = table_file_stats(path)[""]
    assert n_after == 1


def test_cli_query_over_tables(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "query", "--sf_dir", "/root/testdata/sf0.001",
         "--sql",
         "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name",
         "--output_path", str(tmp_path / "out")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "wrote 5 rows" in out.stdout


def test_cli_snapshot_log_and_expire(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit

    path = str(tmp_path / "t")
    snapshot_commit(spark.range(10).toDF("id"), path)
    snapshot_commit(spark.range(5).toDF("id"), path)
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "log", "--table_path", path],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "v00001" in out.stdout and "v00002" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "expire", "--table_path", path, "--keep_last", "1"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dropped 1 versions" in out.stdout


def test_cli_snapshot_tag_roundtrip(spark, tmp_path):
    from group5_spark.medallion.snapshots import snapshot_commit

    path = str(tmp_path / "t2")
    snapshot_commit(spark.range(3).toDF("id"), path)
    snapshot_commit(spark.range(7).toDF("id"), path)

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "group5_spark.pipeline", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    # metadata-only: must not boot a JVM (fast path, no spark logs)
    stdout = run("snapshot", "tag", "--table_path", path,
                 "--name", "rel", "--version", "1")
    assert "tag 'rel' -> v00001" in stdout
    assert "v00001" in run("snapshot", "log", "--table_path", path)
    assert "tags: rel" in run("snapshot", "log", "--table_path", path)
    shown = run("--master", "local[2]", "snapshot", "show",
                "--table_path", path, "--ref", "rel")
    assert "rows: 3" in shown
    run("snapshot", "drop-tag", "--table_path", path, "--name", "rel")
    assert "tags:" not in run("snapshot", "log", "--table_path", path)


def test_cli_snapshot_health_is_metadata_only(spark, tmp_path, capsys):
    """`snapshot health` prints the census + recommendations without
    booting a JVM (it goes through the metadata-only fast path)."""
    from group5_spark.medallion.snapshots import snapshot_commit
    from group5_spark.pipeline import main as cli_main

    path = str(tmp_path / "health_tbl")
    for i in range(6):
        snapshot_commit(
            spark.range(i * 10, (i + 1) * 10).toDF("id").coalesce(1),
            path,
            mode="append" if i else "overwrite",
        )
    rc = cli_main(["snapshot", "health", "--table_path", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "files" in out and "stats coverage" in out
    assert "compact" in out or "expire" in out or "stats" in out


def test_cli_snapshot_delete_where(spark, tmp_path):
    from pyspark.sql import functions as F

    from group5_spark.medallion.snapshots import snapshot_commit, snapshot_read

    path = str(tmp_path / "cli_del")
    snapshot_commit(
        spark.range(100).select(F.col("id")), path, stats_cols=["id"]
    )
    # subprocess, NOT in-process main(): the delete path boots a Spark
    # session and stops it on exit (shared-JVM caveat, see
    # test_cli_maintain_compacts)
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "delete", "--table_path", path,
         "--where", "id>=90"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "deleted 10 rows" in out.stdout
    assert snapshot_read(spark, path).count() == 90
    # predicate parser: typed values and op variants
    from group5_spark.pipeline import _parse_predicate

    assert _parse_predicate("id>=90") == ("id", ">=", 90)
    assert _parse_predicate("price<1.5") == ("price", "<", 1.5)
    assert _parse_predicate("name='alice'") == ("name", "=", "alice")


def test_cli_snapshot_clone_is_metadata_only(spark, tmp_path, capsys):
    """`snapshot clone` runs on the JVM-free fast path (one manifest
    write, no data copy) and the clone reads identically."""
    from group5_spark.medallion.snapshots import snapshot_commit, snapshot_read
    from group5_spark.pipeline import main as cli_main

    src = str(tmp_path / "cli_clone_src")
    dst = str(tmp_path / "cli_clone_dst")
    snapshot_commit(spark.range(25).toDF("id"), src)
    rc = cli_main(["snapshot", "clone", "--table_path", src, "--to", dst])
    assert rc == 0
    assert "zero-copy" in capsys.readouterr().out
    assert not list((tmp_path / "cli_clone_dst").rglob("*.parquet"))
    assert snapshot_read(spark, dst).count() == 25


def test_cli_snapshot_rollback_is_metadata_only(spark, tmp_path, capsys):
    """`snapshot rollback` restores an old version as the new head on
    the JVM-free fast path — one manifest write, no data copied or
    deleted."""
    from group5_spark.medallion.snapshots import snapshot_commit, snapshot_read
    from group5_spark.pipeline import main as cli_main

    t = str(tmp_path / "cli_rb_tbl")
    snapshot_commit(spark.range(40).toDF("id"), t)
    snapshot_commit(spark.range(3).toDF("id"), t)
    n_files = len(list((tmp_path / "cli_rb_tbl").rglob("*.parquet")))

    rc = cli_main(["snapshot", "rollback", "--table_path", t, "--version", "1"])
    assert rc == 0
    assert "new head v00003" in capsys.readouterr().out
    # no data files created or destroyed — pure manifest work
    assert len(list((tmp_path / "cli_rb_tbl").rglob("*.parquet"))) == n_files
    assert snapshot_read(spark, t).count() == 40

    import pytest

    with pytest.raises(SystemExit, match="--version or --ref"):
        cli_main(["snapshot", "rollback", "--table_path", t])


def test_cli_snapshot_compact_clustering(spark, tmp_path):
    """`snapshot compact --sort_col` runs the clustering compaction
    through the CLI (subprocess — the compact path boots a Spark
    session, shared-JVM caveat) and the rewritten layout prunes."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.snapshots import (
        prune_files,
        snapshot_commit,
        snapshot_read,
    )

    path = str(tmp_path / "cli_compact")
    snapshot_commit(
        spark.range(4000).repartition(8), path, stats_cols=["id"]
    )
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "compact", "--table_path", path,
         "--sort_col", "id", "--target_file_mb", "1"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clustered by ['id']" in out.stdout
    assert snapshot_read(spark, path).count() == 4000
    # the whole point: the clustered layout now skips files... unless
    # 1 MiB targets collapsed it to a single file, in which case the
    # only file IS the match — either way fewer than the original 8
    kept, total = prune_files(path, [("id", ">=", 3900)])
    assert len(kept) < 8


def test_cli_snapshot_heal(spark, tmp_path):
    """`snapshot heal` runs the health-recommendation loop through
    the CLI (subprocess — boots Spark); expiry stays gated behind
    --expire; a skewed partition prints as a report-only advisory
    (round-10: advise_partitions wired into the ops loop) while the
    fragmented partition is actually compacted."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.snapshots import snapshot_commit

    path = str(tmp_path / "cli_heal")
    hot = spark.range(4000).select(F.lit("hot").alias("p"), F.col("id"))
    frag = spark.range(4000, 4400).select(
        F.lit("frag").alias("p"), F.col("id")
    ).repartitionByRange(20, "id")
    cold = spark.range(4400, 4800).select(
        F.lit("cold").alias("p"), F.col("id")
    )
    snapshot_commit(
        hot.repartition(1, "p"), path, partition_by="p", stats_cols=["id"]
    )
    snapshot_commit(frag, path, mode="append", partition_by="p")
    snapshot_commit(
        cold.repartition(1, "p"), path, mode="append", partition_by="p"
    )
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "heal", "--table_path", path, "--target_file_mb", "1"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "did cluster_compact" in out.stdout or "did compact" in out.stdout
    assert "advise split_or_salt on partition 'hot'" in out.stdout
    assert "rows=4000" in out.stdout


def test_cli_snapshot_constrain(spark, tmp_path):
    """`snapshot constrain --add` validates + commits (Spark path,
    subprocess); `--drop` runs JVM-free in-process."""
    from group5_spark.medallion.snapshots import (
        snapshot_commit,
        snapshot_manifest,
    )
    from group5_spark.pipeline import main as cli_main

    path = str(tmp_path / "cli_constrain")
    snapshot_commit(spark.range(1, 30).toDF("id"), path)
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]",
         "snapshot", "constrain", "--table_path", path,
         "--add", "pos_id=id > 0"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "added constraint 'pos_id'" in out.stdout
    assert snapshot_manifest(path)["constraints"] == {"pos_id": "id > 0"}

    rc = cli_main(
        ["snapshot", "constrain", "--table_path", path, "--drop", "pos_id"]
    )
    assert rc == 0
    assert "constraints" not in snapshot_manifest(path)


def test_cli_snapshot_fold(spark, tmp_path):
    """`snapshot fold` runs the mask-scoped compaction: DV and eq
    masks fold away, clean files carry, and a second run is a no-op.
    Subprocess, NOT in-process main(): the fold path boots a Spark
    session and stops it on exit (shared-JVM caveat, see
    test_cli_snapshot_delete_where)."""
    from pyspark.sql import functions as F

    from group5_spark.medallion.maintenance import (
        snapshot_delete,
        snapshot_eq_delete,
    )
    from group5_spark.medallion.snapshots import (
        snapshot_commit,
        snapshot_manifest,
        snapshot_read,
    )

    path = str(tmp_path / "cli_fold")
    snapshot_commit(
        spark.range(2000)
        .select(F.col("id"), (F.col("id") % 7).alias("g"))
        .repartitionByRange(4, "id"),
        path,
        stats_cols=["id"],
    )
    snapshot_delete(spark, path, [("id", "<", 200)], dv_threshold=0.95)
    snapshot_eq_delete(
        spark, path, spark.range(300, 320).select(F.col("id"))
    )
    assert snapshot_manifest(path).get("eq_deletes")

    def fold():
        return subprocess.run(
            [sys.executable, "-m", "group5_spark.pipeline",
             "--master", "local[4]",
             "snapshot", "fold", "--table_path", path],
            capture_output=True, text=True, cwd="/root/repo",
        )

    out = fold()
    assert out.returncode == 0, out.stderr[-2000:]
    assert "folded" in out.stdout and "carried" in out.stdout
    m = snapshot_manifest(path)
    assert not m.get("eq_deletes")
    assert not any(e.get("dv") for e in m["files"])
    assert snapshot_read(spark, path).count() == 2000 - 200 - 20
    out = fold()
    assert out.returncode == 0, out.stderr[-2000:]
    assert "nothing to fold" in out.stdout


def test_cli_snapshot_compact_containment(spark, tmp_path):
    """The cron-facing surface of the scheduled containment
    compaction (round-11 VERDICT #2): one CLI line per run, zero
    caller-side bookkeeping — the since_version seed rides a corpus
    tag. First run bootstraps (full-corpus election, retires the
    pre-existing engulfed page, plants the tag); second run scans
    only the empty window and advances the tag."""
    from pyspark.sql import functions as F  # noqa: F401

    from group5_spark.extensions.dedup import (
        DEFAULT_COMPACTION_SEED_TAG,
        containment_index_build,
    )
    from group5_spark.medallion.snapshots import (
        snapshot_commit,
        snapshot_read,
        snapshot_tags,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # engulfed by 2
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally unrelated page words"),
        ],
        ["doc_id", "text"],
    )
    snapshot_commit(docs, corpus, stats_cols=["doc_id"])
    snapshot_commit(
        containment_index_build(docs, threshold=0.9),
        index,
        stats_cols=["id"],
    )

    cmd = [sys.executable, "-m", "group5_spark.pipeline",
           "--master", "local[4]",
           "snapshot", "compact-containment",
           "--table_path", corpus, "--index-path", index]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bootstrap (full corpus)" in out.stdout
    assert "retired 1 engulfed doc" in out.stdout
    assert {
        r["doc_id"] for r in snapshot_read(spark, corpus).collect()
    } == {2, 3}
    assert snapshot_read(spark, index).where("id = 1").count() == 0
    seed1 = snapshot_tags(corpus)[DEFAULT_COMPACTION_SEED_TAG]

    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "retired 0 engulfed doc" in out.stdout
    assert f"window v{seed1:05d}" in out.stdout
    assert snapshot_tags(corpus)[DEFAULT_COMPACTION_SEED_TAG] >= seed1

    # missing --index-path fails with a usage error, not a traceback
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "snapshot", "compact-containment", "--table_path", corpus],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "requires --index-path" in out.stderr


def test_cli_purge_erasure(spark, tmp_path):
    """The takedown-facing surface of the right-to-erasure purge
    (round 12): one CLI line deletes the requested ids from the
    corpus and its derived index, audited and verified."""
    from group5_spark.extensions.dedup import containment_index_build
    from group5_spark.medallion.snapshots import (
        latest_note,
        snapshot_commit,
        snapshot_read,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    snapshot_commit(docs, corpus, stats_cols=["doc_id"])
    snapshot_commit(
        containment_index_build(docs, threshold=0.9),
        index,
        stats_cols=["id"],
    )
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline",
         "--master", "local[4]", "purge",
         "--id", "3", "--id", "11",
         "--table", f"{corpus}=doc_id", "--table", f"{index}=id",
         "--note", "ticket=DMCA-9"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "erasure verified" in out.stdout
    assert snapshot_read(spark, corpus).where(
        "doc_id in (3, 11)"
    ).count() == 0
    assert snapshot_read(spark, index).where("id in (3, 11)").count() == 0
    assert snapshot_read(spark, corpus).count() == 18
    n = latest_note(corpus)
    assert n["op"] == "purge_ids" and n["ticket"] == "DMCA-9"

    # malformed --table is a usage error, not a traceback
    out = subprocess.run(
        [sys.executable, "-m", "group5_spark.pipeline", "purge",
         "--id", "3", "--table", corpus],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "PATH=ID_COL" in out.stderr or "id_col" in out.stderr
