"""Delta-style MERGE (upsert) over plain partitioned Parquet.

The reference's silver layer is maintained by a Snowflake ``MERGE``
inside a Task chain (``dag_streamflow_warehouse.py:118-126``; the SQL
file itself is absent from the snapshot). ``silver._dedup_latest``
re-expresses that as full-rebuild window-dedup; this module adds the
*incremental* form — apply a source batch of changes to an existing
target table with MERGE semantics, rewriting only the partitions the
batch touches.

Scale design (the part that matters at 100 TB):

- **Partition-pruned read.** With ``partition_col`` set, only target
  partitions present in the source batch are read (a pushed-down
  ``isin`` filter → Spark prunes partition directories). A daily
  batch touching 3 of 3,000 date partitions reads 0.1% of the table.
- **Partition-swap write.** The merged result is written to a staging
  directory, then swapped in per-partition with filesystem renames —
  the read and the overwrite never race on the same files (Spark
  cannot safely ``mode("overwrite")`` a path it is reading), and
  untouched partitions are never rewritten. On a real cluster the
  same pattern runs against the Hadoop FileSystem API; a
  transactional table format (Delta/Iceberg) would make the swap
  atomic — this module provides the semantics on vanilla Parquet.
- **One shuffle.** The merge itself is a single full-outer join on
  the key columns; a small change batch broadcasts.

Semantics follow Delta's ``MERGE INTO``:

- duplicate keys in the source are an error (ambiguous merge);
- matched rows are updated (source row wins) or deleted;
- optionally, ``sequence_col`` gates updates CDC-style: a matched
  source row only wins when its sequence is >= the target's (late
  out-of-order changes don't regress the row);
- unmatched source rows are inserted (or ignored).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["merge_into", "resolve_merge_actions"]


def _validate_unique_keys(source: DataFrame, keys: list[str]) -> None:
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        kv = {k: dup[0][k] for k in keys}
        raise ValueError(f"MERGE source has duplicate key rows, e.g. {kv}")


def resolve_merge_actions(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    sequence_col: str | None = None,
    matched_condition: str | None = None,
    update_set: dict[str, str] | None = None,
) -> DataFrame:
    """The MERGE core, shared by the Hive-layout :func:`merge_into`
    and the snapshot-table ``maintenance.snapshot_merge``: one
    full-outer key join of ``target`` × ``source``, resolved per row
    into the target's columns plus an ``_action`` marker ∈
    insert|update|delete|keep|drop (drop = unmatched source row under
    ``when_not_matched='ignore'``). ``sequence_col`` gates matched
    updates CDC-style: a source row only wins when its sequence is >=
    the target's, so late out-of-order replays never regress a row.

    Delta/Snowflake clause parity:

    - ``matched_condition`` — ``WHEN MATCHED AND <cond> THEN …``: a
      SQL boolean over the ``src``/``tgt`` structs (e.g.
      ``"src.o_totalprice > tgt.o_totalprice"``); a matched row
      failing the condition (or evaluating it to NULL) keeps the
      target row, exactly like a MERGE with no further clauses.
      Composes with ``sequence_col`` (both must pass).
    - ``update_set`` — ``UPDATE SET col = <expr>, …``: partial-column
      updates; listed columns evaluate their ``src``/``tgt``
      expression, unlisted columns KEEP the target value (Delta's SET
      semantics — full-row replace is the ``None`` default). Inserted
      rows always take the full source row. Key columns cannot be
      SET: rewriting the match key mid-merge would silently break
      key-based file pruning and can mint duplicate keys.

    One shuffle on the key columns (a small source side broadcasts
    under AQE); the caller filters/counts the actions and owns the
    write protocol.
    """
    cols = target.columns  # canonical order
    if update_set:
        bad = sorted(set(update_set) - set(cols))
        if bad:
            raise ValueError(f"update_set names unknown columns: {bad}")
        keyed = sorted(set(update_set) & set(keys))
        if keyed:
            raise ValueError(f"update_set cannot SET key columns: {keyed}")
    src = source.select(
        [F.col(c).alias(f"_src_{c}") for c in cols]
        + [F.lit(True).alias("_has_src")]
    )
    join_cond = None
    for k in keys:
        c = target[k] == src[f"_src_{k}"]
        join_cond = c if join_cond is None else (join_cond & c)
    joined = target.join(src, join_cond, "full_outer")
    if matched_condition is not None or update_set:
        # src/tgt structs give the clause expressions a stable SQL
        # namespace regardless of the internal column mangling
        joined = joined.withColumn(
            "src", F.struct(*[F.col(f"_src_{c}").alias(c) for c in cols])
        ).withColumn("tgt", F.struct(*[target[c].alias(c) for c in cols]))

    matched = F.col("_has_src").isNotNull() & target[keys[0]].isNotNull()
    src_only = F.col("_has_src").isNotNull() & target[keys[0]].isNull()
    src_wins = matched
    if sequence_col is not None:
        src_wins = src_wins & (
            F.col(f"_src_{sequence_col}") >= target[sequence_col]
        )
    if matched_condition is not None:
        # NULL condition keeps the target row, like SQL WHERE
        src_wins = src_wins & F.coalesce(
            F.expr(matched_condition), F.lit(False)
        )

    if update_set:
        upd = {
            c: F.expr(update_set[c]) if c in update_set else target[c]
            for c in cols
        }
    else:
        upd = {c: F.col(f"_src_{c}") for c in cols}

    action = (
        F.when(
            src_only,
            F.lit("insert" if when_not_matched == "insert" else "drop"),
        )
        .when(src_wins, F.lit("update" if when_matched == "update" else "delete"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        *[
            F.when(src_only, F.col(f"_src_{c}"))
            .when(src_wins, upd[c])
            .otherwise(target[c])
            .alias(c)
            for c in cols
        ],
        action.alias("_action"),
    )


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    *,
    partition_col: str | None = None,
    when_matched: str = "update",  # "update" | "delete"
    when_not_matched: str = "insert",  # "insert" | "ignore"
    sequence_col: str | None = None,
    matched_condition: str | None = None,
    update_set: dict[str, str] | None = None,
    prune_partitions: bool = True,
    validate_source_keys: bool = True,
) -> dict[str, int]:
    """MERGE ``source`` into the Parquet table at ``target_path``.

    Returns action counts ``{"inserted": n, "updated": n,
    "deleted": n, "kept": n}``.

    ``prune_partitions`` requires ``partition_col`` to be stable per
    key (a row never moves between partitions); pass False to scan
    the whole target when keys can change partition (full-table merge,
    like Delta without a partition predicate).
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore, got {when_not_matched!r}"
        )
    if validate_source_keys:
        _validate_unique_keys(source, keys)

    target = spark.read.parquet(target_path)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    cols = target.columns  # canonical order

    affected_parts: list | None = None
    if partition_col and prune_partitions:
        affected_parts = [
            r[0] for r in source.select(partition_col).distinct().collect()
        ]
        target = target.filter(F.col(partition_col).isin(affected_parts))

    resolved = resolve_merge_actions(
        target, source, keys,
        when_matched=when_matched,
        when_not_matched=when_not_matched,
        sequence_col=sequence_col,
        matched_condition=matched_condition,
        update_set=update_set,
    ).persist()
    try:
        counts = {
            r["_action"]: r["n"]
            for r in resolved.groupBy("_action")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out = resolved.filter(
            ~F.col("_action").isin("delete", "drop")
        ).select(*cols)

        staging = Path(target_path) / f"_merge_staging_{uuid.uuid4().hex[:8]}"
        writer = out.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(str(staging))
    finally:
        resolved.unpersist()

    _swap_in(Path(target_path), staging, partition_col, affected_parts)
    return {
        "inserted": counts.get("insert", 0),
        "updated": counts.get("update", 0),
        "deleted": counts.get("delete", 0),
        "kept": counts.get("keep", 0),
    }


def _swap_in(
    target: Path,
    staging: Path,
    partition_col: str | None,
    affected_parts: list | None,
) -> None:
    """Move merged output from staging into the target directory.

    Partitioned: replace each staged ``col=value`` directory (and
    remove affected partitions that became empty — all-deleted).
    Unpartitioned: replace the table's data files wholesale.
    Local-filesystem implementation; the operation set (list, delete,
    rename) maps 1:1 onto the Hadoop FileSystem API for cluster use.
    """
    if partition_col:
        staged_dirs = {
            d.name: d for d in staging.iterdir()
            if d.is_dir() and d.name.startswith(f"{partition_col}=")
        }
        # Partitions read into the merge but absent from the staged
        # output had every row deleted → remove them from the target.
        # ``affected_parts is None`` means the merge read the WHOLE
        # target (prune_partitions=False), so every existing partition
        # was in scope and any one missing from staging was emptied.
        for old in target.glob(f"{partition_col}=*"):
            if old.name in staged_dirs:
                continue
            value = old.name.split("=", 1)[1]
            if affected_parts is None or any(
                str(p) == value for p in affected_parts
            ):
                shutil.rmtree(old)
        for name, d in staged_dirs.items():
            dest = target / name
            if dest.exists():
                shutil.rmtree(dest)
            d.rename(dest)
        shutil.rmtree(staging)
    else:
        for f in list(target.iterdir()):
            if f == staging:
                continue
            if f.is_dir():
                shutil.rmtree(f)
            else:
                f.unlink()
        for f in list(staging.iterdir()):
            f.rename(target / f.name)
        staging.rmdir()
