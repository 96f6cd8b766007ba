"""Pipeline driver + CLI (SURVEY §2 A13, A21-A23, A31; §3.1 mapping).

One driver program replaces the reference's Airflow DAG chain:
``generate → land → etl → bronze → silver → gold → validate`` as
ordered, idempotent stages. The CLI keeps the reference's
spark-submit parameterization contract (``etl_job.py:138-159``):
``--app_name --master --conf KEY=VALUE (repeatable) --input_path
--output_path``, plus stage selection and backfill date filters (B18).

Usage::

    python -m group5_spark.pipeline run --input_path landing/ \
        --output_path warehouse/ [--date 2026-01-02] [--single-file]
    python -m group5_spark.pipeline generate --output_path landing/ \
        --n_user_events 5000 --n_transactions 1000
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from group5_spark.session import create_spark_session


def parse_conf(pairs: list[str]) -> dict[str, str]:
    """``KEY=VALUE`` (split on first '=') — parity with etl_job.py:149-153."""
    conf = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise ValueError(f"--conf expects KEY=VALUE, got {pair!r}")
        key, value = pair.split("=", 1)
        conf[key] = value
    return conf


def cmd_generate(args: argparse.Namespace) -> None:
    from group5_spark.generator import events as gen
    from group5_spark.sources.landing import write_ndjson_batch

    customers = gen.make_customers(args.n_customers, seed=args.seed)
    products = gen.make_products(args.n_products, seed=args.seed + 1)
    ue = gen.make_user_events(args.n_user_events, customers, products, seed=args.seed + 2)
    txn = gen.make_transactions(args.n_transactions, customers, products, seed=args.seed + 3)
    write_ndjson_batch(ue, "user_events", args.output_path, batch_ts=args.seed)
    write_ndjson_batch(txn, "transaction_events", args.output_path, batch_ts=args.seed)
    print(f"landed {len(ue)} user events, {len(txn)} transactions → {args.output_path}")


def cmd_run(args: argparse.Namespace, spark: SparkSession) -> None:
    from group5_spark.etl import run_etl, validate_outputs
    from group5_spark.medallion.gold import refresh_gold
    from group5_spark.medallion.silver import refresh_silver
    from group5_spark.sources.bronze import build_bronze

    stages = args.stages.split(",") if args.stages else [
        "etl", "bronze", "silver", "gold", "validate",
    ]
    if "etl" in stages:
        counts = run_etl(
            spark, args.input_path, f"{args.output_path}/goldzone",
            fmt=args.format, single_file=args.single_file, date=args.date,
        )
        print(f"etl: {counts}")
    if "bronze" in stages:
        print(f"bronze: {build_bronze(spark, args.input_path, args.output_path)}")
    if "silver" in stages:
        print(f"silver: {refresh_silver(spark, args.output_path)}")
    if "gold" in stages:
        print(f"gold: {refresh_gold(spark, args.output_path)}")
    if "validate" in stages:
        files = validate_outputs(f"{args.output_path}/goldzone", fmt=args.format)
        print(f"validate: {len(files)} output files")


def cmd_query(args: argparse.Namespace, spark: SparkSession) -> None:
    """Ad-hoc SQL over the engine's tables: registers every parquet
    table under --sf_dir as a temp view (via catalog.load_table, so
    nanos-timestamp rebuilds etc. apply) and runs the statement —
    the 'switch your warehouse queries over' entry point."""
    import os as _os

    from group5_spark.catalog import TABLES, load_table

    for t in TABLES:
        if _os.path.exists(_os.path.join(args.sf_dir, f"{t}.parquet")):
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
    result = spark.sql(args.sql)
    if args.output_path:
        result.write.mode("overwrite").parquet(args.output_path)
        print(f"wrote {spark.read.parquet(args.output_path).count()} rows "
              f"→ {args.output_path}")
    else:
        result.show(args.limit, truncate=False)


def cmd_explain(args: argparse.Namespace, spark: SparkSession) -> None:
    """Physical-plan inspection for any registered query (or ad-hoc
    SQL with --sql): the formatted plan plus the plan-quality counters
    the test gate asserts (shuffles, broadcast joins, codegen)."""
    from group5_spark.plans import inspect as I
    from group5_spark.queries import QUERIES

    if args.sql:
        from group5_spark.catalog import TABLES, load_table

        import os as _os

        for t in TABLES:
            if _os.path.exists(_os.path.join(args.sf_dir, f"{t}.parquet")):
                load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        df = spark.sql(args.sql)
        title = "ad-hoc SQL"
    else:
        if args.query not in QUERIES:
            raise SystemExit(
                f"unknown query {args.query!r}; see queries() registry "
                f"({len(QUERIES)} entries)"
            )
        df = QUERIES[args.query](spark, args.sf_dir)
        title = args.query
    print(f"== {title}")
    print(I.formatted_plan(df))
    print(
        f"shuffles={I.num_shuffles(df)} "
        f"broadcast_joins={I.num_broadcast_joins(df)} "
        f"sort_merge_joins={I.num_sort_merge_joins(df)} "
        f"codegen={I.has_codegen(df)}"
    )


def cmd_maintain(args: argparse.Namespace, spark: SparkSession) -> None:
    from group5_spark.medallion.maintenance import compact, table_file_stats

    if args.stats_only:
        for part, (n, nbytes) in sorted(table_file_stats(args.table_path).items()):
            print(f"{part or '<unpartitioned>'}: {n} files, {nbytes} bytes")
        return
    done = compact(
        spark,
        args.table_path,
        target_file_bytes=args.target_file_mb * 1024 * 1024,
    )
    if done:
        for part, n in sorted(done.items()):
            print(f"compacted {part or '<unpartitioned>'}: {n} files → target")
    else:
        print("nothing to compact")


def _parse_predicate(spec: str) -> tuple:
    """``col<=value`` → (col, op, typed value). Ops: = < <= > >=.
    Values parse as int, then float, else stay strings — matching the
    manifest stats' native types so pruning compares like with like."""
    import re

    m = re.match(r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*(.+?)\s*$", spec)
    if not m:
        raise SystemExit(f"cannot parse --where {spec!r} (want col<op>value)")
    col, op, raw = m.groups()
    for cast in (int, float):
        try:
            return (col, op, cast(raw))
        except ValueError:
            continue
    return (col, op, raw.strip("'\""))


def cmd_snapshot(args: argparse.Namespace, spark: SparkSession) -> None:
    from group5_spark.medallion.snapshots import (
        snapshot_expire,
        snapshot_read,
        snapshot_versions,
    )

    from group5_spark.medallion.snapshots import (
        snapshot_drop_tag,
        snapshot_tag,
        snapshot_tags,
    )

    if args.action == "log":
        tags = snapshot_tags(args.table_path)
        by_version: dict[int, list[str]] = {}
        for name, v in tags.items():
            by_version.setdefault(v, []).append(name)
        for v in snapshot_versions(args.table_path):
            names = by_version.get(v["version"], [])
            suffix = f"  tags: {', '.join(sorted(names))}" if names else ""
            opfx = f" op={v['op']}" if v.get("op") else ""
            print(
                f"v{v['version']:05d} parent=v{v['parent']:05d} "
                f"files={v['n_files']} ts={v['ts']:.0f}{opfx}{suffix}"
            )
    elif args.action == "expire":
        out = snapshot_expire(args.table_path, keep_last=args.keep_last)
        print(
            f"dropped {out['versions_dropped']} versions, "
            f"deleted {out['files_deleted']} files"
        )
    elif args.action == "show":
        df = snapshot_read(
            spark, args.table_path, version=args.version, ref=args.ref
        )
        df.show(args.limit, truncate=False)
        print(f"rows: {df.count()}")
    elif args.action == "tag":
        v = snapshot_tag(
            args.table_path, args.name, version=args.version,
            overwrite=args.overwrite,
        )
        print(f"tag {args.name!r} -> v{v:05d}")
    elif args.action == "drop-tag":
        snapshot_drop_tag(args.table_path, args.name)
        print(f"dropped tag {args.name!r}")
    elif args.action == "clone":
        from group5_spark.medallion.snapshots import snapshot_clone

        if not args.to:
            raise SystemExit("snapshot clone requires --to <dst_path>")
        snapshot_clone(
            args.table_path, args.to, version=args.version, ref=args.ref
        )
        print(f"cloned {args.table_path} -> {args.to} (zero-copy, v1)")
    elif args.action == "delete":
        from group5_spark.medallion.maintenance import snapshot_delete

        preds = [_parse_predicate(w) for w in args.where]
        if not preds:
            raise SystemExit("snapshot delete requires at least one --where")
        out = snapshot_delete(spark, args.table_path, preds)
        print(
            f"v{out['version']:05d}: deleted {out['rows_deleted']} rows, "
            f"rewrote {out['files_rewritten']} file(s), carried "
            f"{out['files_carried']} untouched"
        )
    elif args.action == "compact-containment":
        from group5_spark.extensions.dedup import (
            containment_compact_scheduled,
        )

        if not args.index_path:
            raise SystemExit(
                "snapshot compact-containment requires --index-path "
                "<containment index table>"
            )
        out = containment_compact_scheduled(
            spark,
            args.table_path,
            args.index_path,
            seed_tag=args.seed_tag,
            threshold=args.threshold,
            bootstrap=args.bootstrap,
        )
        if out["head_version"] is None:
            print("corpus table does not exist yet — nothing to compact")
        elif out["bootstrap"] == "skip":
            print(
                f"bootstrap: seed tag planted at "
                f"v{out['head_version']:05d}, nothing compacted"
            )
        else:
            pfx = "bootstrap (full corpus): " if out["bootstrap"] else ""
            window = (
                f"window v{out['seed']:05d}..v{out['head_version']:05d}"
                if out["seed"] is not None
                else f"head v{out['head_version']:05d}"
            )
            print(
                f"{pfx}{window}: retired {out['doomed']} engulfed "
                f"doc(s) from corpus and index; seed tag -> "
                f"v{out['head_version']:05d}"
            )
    elif args.action == "compact":
        from group5_spark.medallion.maintenance import (
            compact_snapshot,
            compact_snapshot_partitions,
        )

        target = args.target_file_mb * 1024 * 1024
        if args.sort_col or args.zorder_col:
            out = compact_snapshot(
                spark,
                args.table_path,
                target_file_bytes=target,
                sort_cols=args.sort_col or None,
                zorder_cols=args.zorder_col or None,
            )
        else:
            out = compact_snapshot_partitions(
                spark, args.table_path, target_file_bytes=target
            )
        if out:
            extra = (
                f", clustered by {args.sort_col or args.zorder_col}"
                if (args.sort_col or args.zorder_col)
                else ""
            )
            print(
                f"v{out['version']:05d}: {out['files_before']} → "
                f"{out['files_after']} file(s){extra}"
            )
        else:
            print("nothing to compact")
    elif args.action == "constrain":
        from group5_spark.medallion.snapshots import (
            snapshot_add_constraint,
            snapshot_drop_constraint,
        )

        if args.add:
            if "=" not in args.add:
                raise SystemExit("--add wants name=expression")
            cname, cexpr = args.add.split("=", 1)
            v = snapshot_add_constraint(
                spark, args.table_path, cname.strip(), cexpr.strip()
            )
            print(f"v{v:05d}: added constraint {cname.strip()!r}")
        elif args.drop:
            v = snapshot_drop_constraint(args.table_path, args.drop)
            print(f"v{v:05d}: dropped constraint {args.drop!r}")
        else:
            raise SystemExit("snapshot constrain requires --add or --drop")
    elif args.action == "fold":
        from group5_spark.medallion.maintenance import (
            compact_snapshot_masks,
        )

        out = compact_snapshot_masks(
            spark,
            args.table_path,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
        )
        if out:
            print(
                f"v{out['version']:05d}: folded {out['files_folded']} "
                f"masked file(s) ({out['dv_files']} DV, "
                f"{out['eq_sidecars']} eq sidecar(s)); carried "
                f"{out['files_carried']} by reference, re-stamped "
                f"{out['files_restamped']} proven-disjoint"
            )
        else:
            print("no merge-on-read masks: nothing to fold")
    elif args.action == "heal":
        from group5_spark.medallion.maintenance import apply_health

        done = apply_health(
            spark,
            args.table_path,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
            expire=args.expire,
            keep_last=args.keep_last,
            dry_run=args.dry_run,
        )
        if not done:
            print("healthy: nothing to do")
        for a in done:
            if a["action"] == "split_or_salt":
                # report-only: no safe automatic rewrite exists
                print(
                    f"advise split_or_salt on partition "
                    f"{a['partition']!r}: {a['reason']}"
                )
                continue
            verb = "did" if a["executed"] else (
                "would" if args.dry_run else "skipped (pass --expire)"
            )
            print(f"{verb} {a['action']}: {a['reason']}")
    elif args.action == "rollback":
        from group5_spark.medallion.snapshots import snapshot_rollback

        if args.version is None and args.ref is None:
            raise SystemExit(
                "snapshot rollback requires --version or --ref"
            )
        v = snapshot_rollback(
            args.table_path, version=args.version, ref=args.ref
        )
        print(
            f"restored "
            f"{'v%05d' % args.version if args.version is not None else args.ref}"
            f" as new head v{v:05d} (metadata-only)"
        )
    elif args.action == "health":
        from group5_spark.medallion.maintenance import table_health

        h = table_health(args.table_path)
        print(
            f"v{h['version']:05d}: {h['files']} files / "
            f"{h['bytes'] >> 20} MiB (avg {h['avg_file_bytes'] >> 10} KiB), "
            f"{h['versions_retained']} versions, "
            f"{h['orphan_manifests']} orphan manifests, "
            f"stats coverage {h['stats_coverage']:.0%}"
        )
        for rec in h["recommendations"] or ["healthy: nothing to do"]:
            print(f"  - {rec}")


def cmd_purge(args: argparse.Namespace, spark: SparkSession) -> None:
    from group5_spark.medallion.maintenance import snapshot_purge_ids

    tables = []
    for t in args.table:
        if "=" not in t:
            raise SystemExit(
                f"--table must be <table_path>=<id_col>, got {t!r}"
            )
        path, col = t.rsplit("=", 1)
        tables.append((path, col))
    ids: list = []
    for v in args.id:
        try:
            ids.append(int(v))
        except ValueError:
            ids.append(v)
    out = snapshot_purge_ids(
        spark,
        ids,
        tables,
        dv_threshold=args.dv_threshold,
        note=parse_conf(args.note) if args.note else None,
        missing_ok=args.missing_ok,
        denylist_path=args.denylist,
    )
    for path, res in out["tables"].items():
        if res == "absent":
            print(f"{path}: absent (skipped)")
        else:
            print(
                f"{path}: v{res['version']:05d} deleted "
                f"{res['deleted']} row(s), rewrote "
                f"{res['files_rewritten']} file(s), carried "
                f"{res['files_carried']}"
            )
    if out["denylisted"] is not None:
        print(
            f"{args.denylist}: {out['denylisted']} id(s) added to the "
            f"suppression list (re-crawls stay erased)"
        )
    print(
        f"purged {len(ids)} id(s): {out['rows_deleted']} row(s) "
        f"total across {len(tables)} table(s), erasure verified"
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="group5_spark.pipeline")
    parser.add_argument("--app_name", default="group5_pipeline")
    parser.add_argument("--master", default=None)
    parser.add_argument("--conf", action="append", default=[])
    sub = parser.add_subparsers(dest="command", required=True)

    p_gen = sub.add_parser("generate", help="seeded synthetic landing data")
    p_gen.add_argument("--output_path", required=True)
    p_gen.add_argument("--n_customers", type=int, default=1000)
    p_gen.add_argument("--n_products", type=int, default=2000)
    p_gen.add_argument("--n_user_events", type=int, default=5000)
    p_gen.add_argument("--n_transactions", type=int, default=1000)
    p_gen.add_argument("--seed", type=int, default=42)

    p_run = sub.add_parser("run", help="landing → medallion pipeline")
    p_run.add_argument("--input_path", required=True, help="landing dir")
    p_run.add_argument("--output_path", required=True, help="warehouse dir")
    p_run.add_argument("--stages", default=None,
                       help="comma list: etl,bronze,silver,gold,validate")
    p_run.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    p_run.add_argument("--single-file", action="store_true",
                       help="coalesce(1) parity outputs (reference A9)")
    p_run.add_argument("--date", default=None,
                       help="backfill date filter YYYY-MM-DD (B18)")

    p_maint = sub.add_parser(
        "maintain", help="table maintenance: small-file compaction"
    )
    p_maint.add_argument("--table_path", required=True)
    p_maint.add_argument("--target_file_mb", type=int, default=128)
    p_maint.add_argument("--stats-only", action="store_true",
                         help="print the file census without rewriting")

    p_snap = sub.add_parser(
        "snapshot",
        help=(
            "snapshot tables: log / show / expire / tag / drop-tag / "
            "health / delete / clone / rollback / compact / fold / "
            "heal / constrain / compact-containment"
        ),
    )
    p_snap.add_argument(
        "action",
        choices=[
            "log", "show", "expire", "tag", "drop-tag", "health", "delete",
            "clone", "rollback", "compact", "fold", "heal", "constrain",
            "compact-containment",
        ],
    )
    p_snap.add_argument("--index-path", default=None,
                        help="compact-containment: the containment "
                        "index snapshot table (table_path = corpus)")
    p_snap.add_argument("--seed-tag", default="containment-compaction-seed",
                        help="compact-containment: corpus tag holding "
                        "the since_version seed")
    p_snap.add_argument("--threshold", type=float, default=None,
                        help="compact-containment: containment tau "
                        "(default: the index's recorded build_tau)")
    p_snap.add_argument("--bootstrap", default="full",
                        choices=["full", "skip"],
                        help="compact-containment first run: 'full' "
                        "elects over the whole corpus, 'skip' plants "
                        "the seed at head without compacting")
    p_snap.add_argument("--to", default=None,
                        help="clone destination table path")
    p_snap.add_argument("--sort_col", action="append", default=[],
                        help="compact: range-sort clustering column "
                        "(repeatable)")
    p_snap.add_argument("--zorder_col", action="append", default=[],
                        help="compact: Z-order clustering column "
                        "(repeatable, >= 2)")
    p_snap.add_argument("--target_file_mb", type=int, default=128,
                        help="compact/heal: target file size")
    p_snap.add_argument("--expire", action="store_true",
                        help="heal: allow the destructive expiry step")
    p_snap.add_argument("--add", default=None, metavar="NAME=EXPR",
                        help="constrain: add a CHECK rule (validates "
                        "existing rows first)")
    p_snap.add_argument("--drop", default=None, metavar="NAME",
                        help="constrain: drop a CHECK rule "
                        "(metadata-only)")
    p_snap.add_argument("--dry-run", action="store_true",
                        help="heal: report actions without running them")
    p_snap.add_argument(
        "--where",
        action="append",
        default=[],
        help="delete predicate col<op>value (repeatable, ANDed); "
        "ops: = < <= > >=",
    )
    p_snap.add_argument("--table_path", required=True)
    p_snap.add_argument("--version", type=int, default=None,
                        help="time-travel version for show/tag/rollback")
    p_snap.add_argument("--ref", default=None,
                        help="named tag for show")
    p_snap.add_argument("--name", default=None,
                        help="tag name for tag/drop-tag")
    p_snap.add_argument("--overwrite", action="store_true",
                        help="allow moving an existing tag")
    p_snap.add_argument("--keep_last", type=int, default=3,
                        help="versions retained by expire")
    p_snap.add_argument("--limit", type=int, default=20)

    p_purge = sub.add_parser(
        "purge",
        help="right-to-erasure: delete explicit ids from the corpus "
        "and every derived index table, file-pruned and verified",
    )
    p_purge.add_argument("--id", action="append", required=True,
                         help="id value to purge (repeatable)")
    p_purge.add_argument("--table", action="append", required=True,
                         metavar="PATH=ID_COL",
                         help="snapshot table and its id column "
                         "(repeatable; corpus first)")
    p_purge.add_argument("--dv-threshold", type=float, default=None,
                         help="route deletes through DV sidecars "
                         "below this matched-row fraction")
    p_purge.add_argument("--missing-ok", action="store_true",
                         help="skip tables that were never built")
    p_purge.add_argument("--denylist", default=None,
                         help="suppression table to append the purged "
                         "ids to (the ingest stream anti-joins it, so "
                         "a re-crawl of the taken-down page stays "
                         "erased)")
    p_purge.add_argument("--note", action="append", default=[],
                         metavar="K=V",
                         help="audit note recorded in every commit "
                         "(repeatable)")

    p_explain = sub.add_parser(
        "explain", help="physical plan + quality counters for a query"
    )
    p_explain.add_argument("query", nargs="?", default=None,
                           help="registered query name")
    p_explain.add_argument("--sql", default=None,
                           help="explain ad-hoc SQL instead")
    p_explain.add_argument("--sf_dir", default="/root/testdata/sf0.01")

    p_query = sub.add_parser("query", help="ad-hoc SQL over engine tables")
    p_query.add_argument("--sf_dir", default="/root/testdata/sf0.01")
    p_query.add_argument("--sql", required=True)
    p_query.add_argument("--output_path", default=None,
                        help="write result parquet instead of showing")
    p_query.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)
    if args.command == "generate":
        cmd_generate(args)
        return 0

    snapshot_needs_spark = args.command == "snapshot" and (
        args.action in (
            "show", "delete", "compact", "fold", "heal",
            "compact-containment",
        )
        # adding a constraint validates existing rows (a scan); a
        # drop is pure manifest surgery and stays on the fast path
        or (args.action == "constrain" and args.add is not None)
    )
    if args.command == "snapshot" and not snapshot_needs_spark:
        # metadata-only actions (log / expire / tag / drop-tag / health
        # / clone / rollback)
        # read and write manifests, never data — no reason to boot a
        # JVM; show reads data and delete rewrites files, so they fall
        # through to the Spark path
        cmd_snapshot(args, spark=None)
        return 0

    spark = create_spark_session(args.app_name, args.master, parse_conf(args.conf))
    try:
        if args.command == "maintain":
            cmd_maintain(args, spark)
        elif args.command == "snapshot":
            cmd_snapshot(args, spark)
        elif args.command == "explain":
            cmd_explain(args, spark)
        elif args.command == "query":
            cmd_query(args, spark)
        elif args.command == "purge":
            cmd_purge(args, spark)
        else:
            cmd_run(args, spark)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
