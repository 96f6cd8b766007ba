"""Incremental materialized-aggregate maintenance.

The reference's gold layer rebuilds ``agg_daily_revenue`` wholesale on
every refresh (Snowflake Task chain, ``Stream_Analytics_Phase_2.md:
70-71``). At 100 TB a full rebuild rescans years of fact history to
refresh yesterday; the incremental form recomputes only the
partitions a change batch touched:

1. derive the affected partition values from the batch (driver-side
   list — dates, typically a handful);
2. recompute the aggregate *for those partitions only* — the
   partition filter prunes the fact scan to the touched dates;
3. swap exactly those partitions into the aggregate table
   (staging-rename, same pattern as :mod:`merge` — readers never see
   a half-written partition, untouched partitions are never opened).

Full-partition recompute (rather than delta-merging aggregate rows)
keeps every aggregate expressible — COUNT DISTINCT, percentiles, and
other non-subtractable aggregates are correct by construction, no
retraction logic. The cost model is: refresh ∝ changed-partition
volume, not table volume.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["replace_partitions", "refresh_aggregate"]


def replace_partitions(
    spark: SparkSession,
    target_path: str,
    fresh: DataFrame,
    partition_col: str,
) -> list[str]:
    """Overwrite only the partitions present in ``fresh``; leave every
    other partition physically untouched. Returns the replaced
    partition directory names.

    A partition present in the target but absent from ``fresh`` stays
    as-is — pass rows for every partition you mean to change, even if
    the new content is empty for one of them (an empty partition in
    ``fresh`` cannot be represented in a DataFrame; delete that
    directory explicitly if a partition must vanish).
    """
    root = Path(target_path)
    staging = root.parent / f".{root.name}_ipr_{uuid.uuid4().hex[:8]}"
    fresh.write.mode("overwrite").partitionBy(partition_col).parquet(str(staging))

    replaced: list[str] = []
    for d in sorted(staging.iterdir()):
        if not d.is_dir() or not d.name.startswith(f"{partition_col}="):
            continue
        dest = root / d.name
        if dest.exists():
            shutil.rmtree(dest)
        root.mkdir(parents=True, exist_ok=True)
        d.rename(dest)
        replaced.append(d.name)
    shutil.rmtree(staging)
    return replaced


def refresh_aggregate(
    spark: SparkSession,
    fact: DataFrame,
    agg_path: str,
    partition_col: str,
    build: "callable",
    changed_values: list,
) -> list[str]:
    """Recompute an aggregate table for the given partition values.

    ``build(df) -> DataFrame`` is the same aggregation used for the
    full build (it must output ``partition_col``); it runs over the
    fact rows filtered to ``changed_values`` — with a partitioned (or
    range-sorted) fact table that filter prunes the scan to the
    touched partitions.
    """
    pruned = fact.filter(F.col(partition_col).isin(changed_values))
    return replace_partitions(spark, agg_path, build(pruned), partition_col)
