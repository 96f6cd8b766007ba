"""Engine-portable bounded-space sketches (KMV distinct counting).

Why KMV and not approx_count_distinct: Spark's HLL++ is the right
production default, but its register layout is engine-internal — no
SQL oracle on another engine can replay it, so correctness evidence
degrades to "rows exist". KMV (k minimum values) over the portable
56-bit hash (`dedup.portable_hash56_sql`) has the same bounded-space,
mergeable, one-pass profile with a fully portable definition: the
sketch IS the k smallest distinct hash values, and the estimate is
``(k-1) · 2⁵⁶ / kth_min`` (exact count when fewer than k distincts
exist — the sketch then holds the whole distinct set). Standard error
≈ 1/√(k-2), ~12% at k=64, ~4% at k=1024.

Scale design: hashes dedup per group on 8-byte keys; the per-group
min-k is a rank window Spark rewrites to WindowGroupLimit (each map
partition keeps k rows per group before the shuffle). Merging unions
sketch rows and re-takes min-k — associative and commutative, so
partial sketches combine across partitions, days, or tables without
touching raw data (`kmv_merge(sketch(A), sketch(B)) ==
kmv_sketch(A ∪ B)` exactly, pinned in tests).

Reference parity: the reference has no approximate-distinct surface at
all (SURVEY §2 B30 is an exact COUNT DISTINCT); this is the 100 TB
"distinct users per anything" building block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash56_sql

__all__ = ["kmv_sketch", "kmv_estimate", "kmv_merge", "kmv_regroup"]

_HASH_SPACE = float(1 << 56)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Build per-group KMV sketches: the k smallest distinct portable
    hashes of ``value_col`` per group, as rows ``(group..., hv, rnk)``.
    """
    group_cols = group_cols or []
    h = df.select(
        *group_cols,
        F.expr(
            portable_hash56_sql(f"CAST({value_col} AS STRING)")
        ).alias("hv"),
    ).distinct()
    w = (
        Window.partitionBy(*group_cols).orderBy("hv")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("hv")
    )
    return (
        h.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimates from sketch rows: ``(k-1)·2⁵⁶/kth``
    when the sketch is full, else the exact count (a non-full sketch
    holds every distinct hash)."""
    group_cols = group_cols or []
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("hv").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.round(
            (F.col("n_hashes").cast("double") - 1)
            * F.lit(_HASH_SPACE)
            / F.col("kth_hash").cast("double"),
            4,
        )
    )
    return agg.select(
        *group_cols,
        F.col("n_hashes").cast("bigint").alias("n_hashes"),
        "kth_hash",
        est.alias("est_distinct"),
    )


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Merge two sketch tables: union rows, re-dedup hashes, re-take
    the per-group min-k. Associative + commutative — the property that
    lets partial sketches combine across partitions or time windows
    without rescanning data."""
    group_cols = group_cols or []
    u = a.select(*group_cols, "hv").unionByName(
        b.select(*group_cols, "hv")
    ).distinct()
    w = (
        Window.partitionBy(*group_cols).orderBy("hv")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("hv")
    )
    return (
        u.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def kmv_regroup(
    sketch: DataFrame,
    group_exprs: dict,
    k: int = 64,
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain WITHOUT raw
    data: relabel each sketch row by ``group_exprs`` ({new_col:
    Column}), pool the hashes per new group, and re-take min-k. This
    is the mergeable-sketch payoff — daily sketches persisted once
    answer weekly/monthly/all-time distinct questions forever, the
    exact rollup a stored COUNT DISTINCT can never do."""
    relabeled = sketch.select(
        *[expr.alias(name) for name, expr in group_exprs.items()], "hv"
    ).distinct()
    names = list(group_exprs)
    w = Window.partitionBy(*names).orderBy("hv")
    return (
        relabeled.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
