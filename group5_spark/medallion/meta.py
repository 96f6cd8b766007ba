"""Metadata introspection tables — the snapshot layer's equivalent of
Iceberg's ``.files``/``.history`` metadata tables and Delta's
``DESCRIBE HISTORY``: query a table's own manifests as DataFrames.

The reference pipeline exposes no operational surface at all (its ETL
writes fire-and-forget CSV); here every question an operator asks
before acting — "what landed last night", "which files would a
compaction touch", "how much merge-on-read rent has the CDC sink
accumulated" — is a DataFrame over KILOBYTES of manifest JSON, never a
data scan. Everything is driver-built from the same manifests the
planner already reads (bounded: one dict per file entry), then handed
to Spark so it composes with joins/filters/dashboards like any table.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    _lineage,
    _manifest_path,
    _current_version,
    snapshot_manifest,
)

__all__ = ["snapshot_files_df", "snapshot_history_df"]

_FILES_SCHEMA = (
    "path string, bytes long, rows long, seq long, "
    "partition string, partition_col string, "
    "has_dv boolean, dv_deleted long, "
    "stats_cols array<string>, bloom_cols array<string>"
)

_HISTORY_SCHEMA = (
    "version int, parent int, ts double, op string, "
    "n_files long, rows long, bytes long, "
    "eq_sidecars int, eq_masked_keys long, "
    "app_id string, batch_id long"
)


def snapshot_files_df(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """One row per data-file entry of a snapshot version (Iceberg's
    ``.files``): physical identity (path, bytes, rows, write
    sequence), layout (partition value/column), merge-on-read state
    (DV present and its masked-position count), and which columns
    carry pruning stats / bloom filters. The operator view behind
    "which files would this predicate prune" and "where does the DV
    rent sit"."""
    m = snapshot_manifest(path, version)
    rows = [
        (
            e["path"],
            int(e.get("bytes", 0)),
            int(e.get("rows", 0)),
            int(e.get("seq", 0)),
            e.get("partition"),
            e.get("partition_col"),
            bool(e.get("dv")),
            int((e.get("dv") or {}).get("deleted", 0)),
            sorted(e.get("stats") or {}),
            sorted(e.get("bloom") or {}),
        )
        for e in m["files"]
    ]
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def snapshot_history_df(spark: SparkSession, path: str) -> DataFrame:
    """One row per PUBLISHED version, newest first (Delta's DESCRIBE
    HISTORY): operation, file/row/byte footprint, equality-delete rent
    (sidecar count and masked-key total), and the streaming
    idempotency marker — the audit trail `snapshot log` prints, as a
    joinable DataFrame."""
    root = Path(path)
    head = _current_version(root)
    rows = []
    for v in _lineage(root, head):
        try:
            m = json.loads(_manifest_path(root, v).read_text())
        except (OSError, ValueError, json.JSONDecodeError):
            continue
        note = m.get("note") or {}
        # DML commits mark themselves with operation-specific note
        # keys rather than a uniform "op"; derive the display tag
        op = note.get("op")
        if op is None:
            for marker, tag in (
                ("delete_where", "delete"),
                ("update_where", "update"),
                ("merge", "merge"),
                ("compaction", "compact"),
                ("eq_upsert", "eq_upsert"),
                ("batch_id", "stream_batch"),
            ):
                if marker in note:
                    op = tag
                    break
        eq = m.get("eq_deletes") or []
        entries = m.get("files", [])
        rows.append(
            (
                int(m["version"]),
                int(m.get("parent", 0)),
                float(m.get("ts", 0.0)),
                op,
                len(entries),
                sum(int(e.get("rows", 0)) for e in entries),
                sum(int(e.get("bytes", 0)) for e in entries),
                len(eq),
                sum(int(d.get("rows", 0)) for d in eq),
                note.get("app_id"),
                (
                    int(note["batch_id"])
                    if note.get("batch_id") is not None
                    else None
                ),
            )
        )
    return spark.createDataFrame(rows, _HISTORY_SCHEMA)
