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

__all__ = [
    "kmv_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_regroup",
    "histogram_sketch",
    "histogram_merge",
    "histogram_percentiles",
    "kmv_set_estimates",
    "kmv_ndv_estimate_list",
]

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


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketches: the PERCENTILE companion to KMV.
# Exact percentiles need a global sort (or two-pass exact-percentile
# machinery) per question; a fixed-bin histogram is one-pass, constant
# space per group, mergeable across partitions/days/tables by adding
# bin counts, and — unlike t-digest/KLL — has a fully portable
# definition another engine replays bit-for-bit, so the oracle gate
# verifies values, not just row counts. Resolution is the bin width;
# the estimate returned for a quantile is the LOWER EDGE of the bin
# where the cumulative count crosses it (documented, deterministic —
# no interpolation FP to disagree on).
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: F.Column | float,
    width: F.Column | float,
    bins: int = 32,
) -> DataFrame:
    """One histogram row per (group, occupied bin): ``bin`` index and
    ``cnt``. ``lo``/``width`` may be literals or 1-row-derived columns
    (already joined onto ``df``). Values at/above the top edge clamp
    into the last bin, below ``lo`` into bin 0 — the sketch never
    drops a row, so merged totals always reconcile with COUNT(*)."""
    lo_c = lo if isinstance(lo, F.Column) else F.lit(float(lo))
    w_c = width if isinstance(width, F.Column) else F.lit(float(width))
    idx = F.greatest(
        F.lit(0),
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(value_col) - lo_c) / w_c).cast("int"),
        ),
    )
    return df.groupBy(*group_cols, idx.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_merge(sketch: DataFrame, group_exprs: dict) -> DataFrame:
    """Roll stored histograms to a coarser grain without raw data:
    relabel by ``group_exprs`` ({new_col: Column}) and ADD bin counts
    — the merge operation is plain integer addition, associative and
    commutative by construction."""
    relabeled = sketch.select(
        *[expr.alias(name) for name, expr in group_exprs.items()],
        "bin",
        "cnt",
    )
    names = list(group_exprs)
    return relabeled.groupBy(*names, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_percentiles(
    sketch: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    lo: F.Column | float,
    width: F.Column | float,
) -> DataFrame:
    """Estimate quantiles from (possibly merged) histogram rows: for
    each q, the lower edge ``lo + bin·width`` of the first bin whose
    cumulative count reaches ``q × total``. One cumulative window over
    the bins (≤ ``bins`` rows per group — trivial state) plus one
    aggregation; raw data is never touched."""
    lo_c = lo if isinstance(lo, F.Column) else F.lit(float(lo))
    w_c = width if isinstance(width, F.Column) else F.lit(float(width))
    win = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = sketch.withColumn("cum", F.sum("cnt").over(win)).withColumn(
        "total", F.sum("cnt").over(tot)
    )
    edge = lo_c + F.col("bin") * w_c
    aggs = [
        F.min(
            F.when(
                F.col("cum").cast("double") >= F.lit(q) * F.col("total"),
                edge,
            )
        ).alias(f"p{round(q * 100):02d}")
        for q in quantiles
    ]
    return cum.groupBy(*group_cols).agg(
        *aggs, F.max("total").alias("n_rows")
    )


def kmv_set_estimates(
    h_a: list[int], h_b: list[int], k: int = 256
) -> dict:
    """Union / intersection / Jaccard estimates from two stored KMV
    hash lists (the manifest `kmv` entries) — pure arithmetic on ≤2k
    ints, no data access.

    Standard KMV set algebra: pool both sketches and keep the k
    smallest — that IS the sketch of A∪B (pinned for the DataFrame
    form in tests) — then the fraction of the pooled sketch present
    in BOTH inputs estimates Jaccard, and intersection ≈ ρ·|A∪B|.
    When both sketches are non-full they hold their entire distinct
    hash sets and every figure is exact.
    """
    sa, sb = set(h_a), set(h_b)
    pooled = sorted(sa | sb)[:k]
    union_est = kmv_ndv_estimate_list(pooled, k)
    if not pooled:
        return {"union": 0.0, "intersection": 0.0, "jaccard": 0.0}
    in_both = sum(1 for h in pooled if h in sa and h in sb)
    jaccard = in_both / len(pooled)
    return {
        "union": union_est,
        "intersection": jaccard * union_est,
        "jaccard": jaccard,
    }


def kmv_ndv_estimate_list(hashes: list[int], k: int = 256) -> float:
    """NDV estimate from a sorted hash list: exact when not full,
    else ``(k-1)·2⁵⁶/kth`` (mirror of snapshots.kmv_ndv_estimate,
    importable without the medallion layer)."""
    if len(hashes) < k:
        return float(len(hashes))
    return (k - 1) * _HASH_SPACE / float(hashes[k - 1])
