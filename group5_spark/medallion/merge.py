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


def _normalize_matched_clauses(
    when_matched: str,
    matched_condition: str | None,
    update_set: dict[str, str] | None,
    matched_clauses: list[dict] | None,
) -> list[dict]:
    """Canonical ordered WHEN MATCHED clause list. The legacy scalar
    form (``when_matched`` + optional ``matched_condition`` /
    ``update_set``) synthesizes a single clause; ``matched_clauses``
    supersedes it and the two forms cannot be mixed."""
    if matched_clauses is not None:
        if (
            when_matched != "update"
            or matched_condition is not None
            or update_set
        ):
            raise ValueError(
                "pass matched_clauses= OR the scalar "
                "when_matched/matched_condition/update_set form, not both"
            )
        out = []
        for i, cl in enumerate(matched_clauses):
            action = cl.get("action")
            if action not in ("update", "delete"):
                raise ValueError(
                    f"matched_clauses[{i}].action must be update|delete, "
                    f"got {action!r}"
                )
            if action == "delete" and cl.get("set"):
                raise ValueError(
                    f"matched_clauses[{i}]: a delete clause takes no set="
                )
            out.append(
                {
                    "condition": cl.get("condition"),
                    "action": action,
                    "set": cl.get("set"),
                }
            )
        if not out:
            raise ValueError("matched_clauses must not be empty")
        return out
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"when_matched must be update|delete, got {when_matched!r}"
        )
    return [
        {
            "condition": matched_condition,
            "action": when_matched,
            "set": update_set or None,
        }
    ]


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
    matched_clauses: list[dict] | None = None,
    insert_values: dict[str, str] | None = None,
    when_not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | None = None,
    not_matched_by_source_set: dict[str, str] | None = None,
    passthrough_cols: list[str] | None = None,
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
      semantics — full-row replace is the ``None`` default). When
      ``sequence_col`` is set, the winning row always carries the
      SOURCE's sequence value even if the SET list omits it —
      otherwise a later replay whose sequence falls between the stale
      kept value and the applied one would pass the ``>=`` gate and
      regress the SET columns, breaking the no-replay-regression
      contract. Key columns cannot be SET: rewriting the match key
      mid-merge would silently break key-based file pruning and can
      mint duplicate keys.
    - ``matched_clauses`` — MULTIPLE ORDERED ``WHEN MATCHED [AND
      cond] THEN UPDATE SET …|DELETE`` clauses:
      ``[{"condition": sql|None, "action": "update"|"delete",
      "set": {...}|None}, ...]``. The FIRST clause whose condition
      passes wins (Delta's ordered-clause rule); no clause passing
      keeps the target row. Supersedes the scalar form above.
    - ``insert_values`` — ``WHEN NOT MATCHED THEN INSERT (cols)
      VALUES (exprs)``: inserted rows evaluate the listed
      ``{col: sql-over-src}`` expressions; UNLISTED columns become
      NULL (cast to the target type), Delta's column-subset INSERT.
      Key columns must be listed — an inserted row with a NULL merge
      key would be unfindable by every later merge.
    - ``when_not_matched_by_source`` — ``WHEN NOT MATCHED BY SOURCE
      [AND cond] THEN DELETE | UPDATE SET …`` (the full-sync CDC
      clause): target rows with NO source match are deleted, or
      updated via ``not_matched_by_source_set`` (exprs over ``tgt``),
      when ``not_matched_by_source_condition`` (over ``tgt``) passes
      or is None. NOTE for file-pruned callers: a by-source action
      can hit rows in files the source keys never touch — pruning is
      sound only when this clause is absent
      (``maintenance.snapshot_merge`` disables pruning accordingly).

    ``passthrough_cols``: extra TARGET-side columns (e.g. file/row
    lineage for the deletion-vector write path) carried through the
    resolution verbatim — NULL on insert rows, the target's value
    everywhere else. They ride after ``_action`` and are never
    touched by clause expressions.

    One shuffle on the key columns (a small source side broadcasts
    under AQE); the caller filters/counts the actions and owns the
    write protocol.
    """
    cols = [c for c in target.columns if c not in (passthrough_cols or [])]
    clauses = _normalize_matched_clauses(
        when_matched, matched_condition, update_set, matched_clauses
    )
    for i, cl in enumerate(clauses):
        if cl["set"]:
            bad = sorted(set(cl["set"]) - set(cols))
            if bad:
                raise ValueError(
                    f"matched clause {i} SET names unknown columns: {bad}"
                )
            keyed = sorted(set(cl["set"]) & set(keys))
            if keyed:
                raise ValueError(
                    f"matched clause {i} cannot SET key columns: {keyed}"
                )
    if when_not_matched_by_source not in (None, "update", "delete"):
        raise ValueError(
            "when_not_matched_by_source must be update|delete|None, "
            f"got {when_not_matched_by_source!r}"
        )
    if when_not_matched_by_source == "update":
        if not not_matched_by_source_set:
            raise ValueError(
                "when_not_matched_by_source='update' requires "
                "not_matched_by_source_set="
            )
        bad = sorted(set(not_matched_by_source_set) - set(cols))
        if bad:
            raise ValueError(
                f"not_matched_by_source_set names unknown columns: {bad}"
            )
        keyed = sorted(set(not_matched_by_source_set) & set(keys))
        if keyed:
            raise ValueError(
                f"not_matched_by_source_set cannot SET key columns: {keyed}"
            )
    if insert_values is not None:
        bad = sorted(set(insert_values) - set(cols))
        if bad:
            raise ValueError(f"insert_values names unknown columns: {bad}")
        missing_keys = sorted(set(keys) - set(insert_values))
        if missing_keys:
            raise ValueError(
                f"insert_values must include the merge keys: {missing_keys}"
            )
    needs_structs = (
        insert_values is not None
        or when_not_matched_by_source is not None
        or any(cl["condition"] is not None or cl["set"] for cl in clauses)
    )
    if needs_structs and ({"src", "tgt"} & set(cols)):
        # clause expressions address the two sides through struct
        # columns literally named src/tgt; a real column by either
        # name would be silently shadowed — refuse loudly instead
        raise ValueError(
            "clause expressions reserve the column names 'src' and "
            "'tgt'; rename the colliding target column(s): "
            f"{sorted({'src', 'tgt'} & set(cols))}"
        )

    src = source.select(
        [F.col(c).alias(f"_src_{c}") for c in cols]
        + [F.lit(True).alias("_has_src")]
    )
    join_cond = None
    for k in keys:
        c = target[k] == src[f"_src_{k}"]
        join_cond = c if join_cond is None else (join_cond & c)
    joined = target.join(src, join_cond, "full_outer")
    if needs_structs:
        # src/tgt structs give the clause expressions a stable SQL
        # namespace regardless of the internal column mangling
        joined = joined.withColumn(
            "src", F.struct(*[F.col(f"_src_{c}").alias(c) for c in cols])
        ).withColumn("tgt", F.struct(*[target[c].alias(c) for c in cols]))

    matched = F.col("_has_src").isNotNull() & target[keys[0]].isNotNull()
    src_only = F.col("_has_src").isNotNull() & target[keys[0]].isNull()
    tgt_only = F.col("_has_src").isNull()
    seq_ok = F.lit(True)
    if sequence_col is not None:
        seq_ok = F.col(f"_src_{sequence_col}") >= target[sequence_col]

    def _cond(expr: str | None):
        # NULL condition keeps the target row, like SQL WHERE
        return (
            F.lit(True)
            if expr is None
            else F.coalesce(F.expr(expr), F.lit(False))
        )

    # per-clause winning predicates, in clause order: the FIRST
    # matching WHEN in the chains below wins, which IS the ordered
    # Delta clause semantics
    clause_preds = [
        matched & seq_ok & _cond(cl["condition"]) for cl in clauses
    ]
    bysrc_pred = (
        tgt_only & _cond(not_matched_by_source_condition)
        if when_not_matched_by_source is not None
        else None
    )

    def _clause_value(cl: dict, c: str):
        st = cl["set"]
        if not st:
            return F.col(f"_src_{c}")  # full-row replace
        if c in st:
            return F.expr(st[c])
        if sequence_col is not None and c == sequence_col:
            # a winning row must carry the source's sequence even when
            # the SET list omits it (see docstring: replay regression)
            return F.col(f"_src_{c}")
        return target[c]  # Delta SET: unlisted columns keep target

    tgt_types = dict(target.dtypes)

    def _insert_value(c: str):
        if insert_values is None:
            return F.col(f"_src_{c}")
        if c in insert_values:
            return F.expr(insert_values[c])
        return F.lit(None).cast(tgt_types[c])

    def _value(c: str):
        v = F.when(src_only, _insert_value(c))
        for pred, cl in zip(clause_preds, clauses):
            v = v.when(pred, _clause_value(cl, c))
        if bysrc_pred is not None and when_not_matched_by_source == "update":
            v = v.when(
                bysrc_pred,
                F.expr(not_matched_by_source_set[c])
                if c in not_matched_by_source_set
                else target[c],
            )
        return v.otherwise(target[c]).alias(c)

    action = F.when(
        src_only,
        F.lit("insert" if when_not_matched == "insert" else "drop"),
    )
    for pred, cl in zip(clause_preds, clauses):
        action = action.when(pred, F.lit(cl["action"]))
    if bysrc_pred is not None:
        action = action.when(
            bysrc_pred, F.lit(when_not_matched_by_source)
        )
    action = action.otherwise(F.lit("keep"))
    return joined.select(
        *[_value(c) for c in cols],
        action.alias("_action"),
        *[target[c].alias(c) for c in (passthrough_cols or [])],
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
    matched_clauses: list[dict] | None = None,
    insert_values: dict[str, str] | None = None,
    when_not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | None = None,
    not_matched_by_source_set: dict[str, str] | None = None,
    prune_partitions: bool = True,
    validate_source_keys: bool = True,
) -> dict[str, int]:
    """MERGE ``source`` into the Parquet table at ``target_path``.

    Returns action counts ``{"inserted": n, "updated": n,
    "deleted": n, "kept": n}``.

    ``prune_partitions`` requires ``partition_col`` to be stable per
    key (a row never moves between partitions); pass False to scan
    the whole target when keys can change partition (full-table merge,
    like Delta without a partition predicate). A
    ``when_not_matched_by_source`` clause disables pruning outright:
    by-source actions hit target rows the source keys never name, so
    every partition is in scope by definition.
    """
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
    if (
        partition_col
        and prune_partitions
        and when_not_matched_by_source is None
    ):
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
        matched_clauses=matched_clauses,
        insert_values=insert_values,
        when_not_matched_by_source=when_not_matched_by_source,
        not_matched_by_source_condition=not_matched_by_source_condition,
        not_matched_by_source_set=not_matched_by_source_set,
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
