"""Slowly-Changing-Dimension Type 2 over partitioned Parquet.

The reference's star schema keeps natural-key dimensions
(``dim_customer``/``dim_product``, ``Stream_Analytics_Phase_2.md:
154-156``) with no history — every refresh overwrites the row. A
warehouse that answers "what segment was this customer in when they
placed the order?" needs Type-2 history: one row per (key, validity
interval), with ``valid_from``/``valid_to``/``is_current`` columns.

Scale design: the table is **partitioned by ``is_current``**.

- The history partition (``is_current=false``) is *append-only*:
  applying a snapshot appends newly-closed rows and never rewrites
  old ones. Ten years of history costs nothing per refresh.
- The current partition is rewritten via the same staging-swap used
  by :mod:`merge` (read and overwrite never race). Its size is one
  row per live key — the dimension's natural size, not its history.
- Change detection is a single full-outer join of the current
  partition against the snapshot, comparing tracked columns with a
  null-safe struct equality (JVM-side, no hashing collisions).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["scd2_init", "scd2_apply", "read_scd2"]

META = ["valid_from", "valid_to", "is_current"]


def read_scd2(spark: SparkSession, path: str) -> DataFrame:
    """Read an SCD2 table, normalizing the partition column's type.

    Spark's partition-value inference has no boolean rule, so the
    ``is_current=true`` directory name comes back as a STRING column —
    cast it back to the boolean the writers produced.
    """
    df = spark.read.parquet(path)
    return df.withColumn("is_current", F.col("is_current").cast("boolean"))


def scd2_init(snapshot: DataFrame, snapshot_ts: str) -> DataFrame:
    """Turn a first snapshot into SCD2 shape: every row current from
    ``snapshot_ts``, open-ended."""
    return snapshot.select(
        "*",
        F.lit(snapshot_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _write_partitioned(df: DataFrame, path: str, mode: str) -> None:
    df.write.mode(mode).partitionBy("is_current").parquet(path)


def scd2_apply(
    spark: SparkSession,
    target_path: str,
    snapshot: DataFrame,
    key: str,
    snapshot_ts: str,
    *,
    close_missing: bool = False,
) -> dict[str, int]:
    """Apply a full dimension snapshot taken at ``snapshot_ts``.

    - new keys → inserted as current rows;
    - keys whose tracked attributes changed → old row closed
      (``valid_to = snapshot_ts``) and appended to history, new
      current row opened;
    - unchanged keys → untouched;
    - keys absent from the snapshot → closed too when
      ``close_missing`` (a *full* snapshot implies deletion),
      kept current otherwise (incremental snapshot).

    Returns ``{"new": n, "changed": n, "unchanged": n, "closed": n}``
    where ``closed`` counts rows closed for absence.
    """
    attrs = [c for c in snapshot.columns if c != key]
    ts = F.lit(snapshot_ts).cast("timestamp")

    cur = (
        read_scd2(spark, target_path)
        .filter(F.col("is_current"))
        .drop(*META)
    )
    src = snapshot.select(
        F.col(key).alias("_src_key"),
        *[F.col(c).alias(f"_src_{c}") for c in attrs],
    )
    joined = cur.join(src, cur[key] == src["_src_key"], "full_outer")

    tgt_struct = F.struct(*[F.col(c) for c in attrs])
    src_struct = F.struct(*[F.col(f"_src_{c}") for c in attrs])
    is_new = F.col(key).isNull()
    is_missing = F.col("_src_key").isNull()
    changed = ~is_new & ~is_missing & ~tgt_struct.eqNullSafe(src_struct)

    status = (
        F.when(is_new, F.lit("new"))
        .when(is_missing, F.lit("missing"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    marked = joined.select(
        F.coalesce(F.col(key), F.col("_src_key")).alias(key),
        *[F.col(c) for c in attrs],
        *[F.col(f"_src_{c}") for c in attrs],
        status.alias("_status"),
    ).persist()
    try:
        counts = {
            r["_status"]: r["n"]
            for r in marked.groupBy("_status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

        # valid_from of surviving current rows must be preserved — read
        # it from the current partition (small) and join back by key.
        vf = (
            read_scd2(spark, target_path)
            .filter(F.col("is_current"))
            .select(key, "valid_from")
        )

        closing = F.col("_status").isin(
            *(["changed", "missing"] if close_missing else ["changed"])
        )
        closed_rows = (
            marked.filter(closing)
            .select(key, *attrs)
            .join(vf, key)
            .select(
                key,
                *attrs,
                "valid_from",
                ts.alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )

        fresh = marked.filter(F.col("_status").isin("new", "changed")).select(
            F.col(key),
            *[F.col(f"_src_{c}").alias(c) for c in attrs],
            ts.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        keep_status = ["unchanged"] if close_missing else ["unchanged", "missing"]
        kept = (
            marked.filter(F.col("_status").isin(*keep_status))
            .select(key, *attrs)
            .join(vf, key)
            .select(
                key,
                *attrs,
                "valid_from",
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
        new_current = fresh.unionByName(kept)

        # Stage the newly-closed history rows and the rebuilt current
        # partition in ONE write. The target is not touched until the
        # rename phase below, so a failure anywhere above leaves it
        # unchanged and a retry cannot duplicate history appends.
        staging = Path(target_path) / f"_scd_staging_{uuid.uuid4().hex[:8]}"
        _write_partitioned(
            closed_rows.unionByName(new_current), str(staging), "overwrite"
        )
    finally:
        marked.unpersist()

    target = Path(target_path)
    # History is append-only: move the staged closed-row files in
    # (Spark part-file names embed a UUID — no collisions).
    staged_hist = staging / "is_current=false"
    if staged_hist.exists():
        hist = target / "is_current=false"
        hist.mkdir(exist_ok=True)
        for f in staged_hist.iterdir():
            if f.is_file() and f.suffix == ".parquet":
                f.rename(hist / f.name)
    staged_cur = staging / "is_current=true"
    dest = target / "is_current=true"
    if dest.exists():
        shutil.rmtree(dest)
    if staged_cur.exists():
        staged_cur.rename(dest)
    shutil.rmtree(staging)

    return {
        "new": counts.get("new", 0),
        "changed": counts.get("changed", 0),
        "unchanged": counts.get("unchanged", 0),
        "closed": counts.get("missing", 0) if close_missing else 0,
    }
