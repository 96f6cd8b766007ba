"""Join operators (SURVEY §2 B1-B3; spec ``Stream_Analytics_Platform.md:84``).

Design for scale: fact↔dimension joins broadcast the dimension side
(the reference's dims are 1k/2k rows; TPC-H dims stay tiny relative to
facts at every SF), so the fact table never shuffles. Fact↔fact joins
rely on AQE for skew splitting; callers co-partition via bucketing
(see medallion.gold) when a join key is reused across stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join a fact table to a dimension, broadcasting the dimension.

    A broadcast hash join ships the dim to every executor once and
    streams the fact through map-side — zero shuffle of the fact table.
    At 100 TB the fact side never moves; only the few-MB dim does.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def inner_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Inner equi-join (B1)."""
    return left.join(right, on=on, how="inner")


def left_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Left outer equi-join (B2)."""
    return left.join(right, on=on, how="left")


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Left semi join: rows of ``left`` with ≥1 match (B3 complement).

    Semi joins only need the join keys from the right side, so project
    to the keys first — shrinks the shuffled/broadcast payload to the
    key column(s) and lets the exchange carry minimal bytes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right.select(*keys), on=keys, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Left anti join: rows of ``left`` with no match (B3).

    The spec's "anti join across event streams" — e.g. users with
    events but no purchase. Same key-projection trick as semi_join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right.select(*keys), on=keys, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row's
    columns from the latest ``right_ts`` <= ``left_ts`` per key.

    Spark has no built-in as-of join; the naive formulation is a range
    join (left.ts >= right.ts per key → O(n·m) per key, a broadcast
    nested loop at scale). This implementation is the single-shuffle
    rewrite: tag both sides, union them, and carry the right side's
    values forward with ``last(..., ignorenulls=True)`` over a
    per-key time-ordered running window; then keep only left rows.
    One shuffle on the key, linear work — the same trick a
    time-series engine's as-of executor performs, expressed in pure
    DataFrame ops (SURVEY §2 custom-operator policy (a)).

    Right-side value columns and ``right_ts`` must not collide with
    left column names (pre-project/rename on the caller side) —
    validated eagerly below. Ties (`right_ts == left_ts`) match: the
    right row sorts first at equal timestamps.
    """
    keys = [on] if isinstance(on, str) else list(on)
    val_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]

    left_cols = set(left.columns)
    clashes = (set(val_cols) | {right_ts}) & left_cols
    if clashes:
        raise ValueError(
            f"asof_join: right-side columns {sorted(clashes)} collide with "
            "left column names; rename them before joining"
        )
    reserved = {"_t", "_is_r"} | {f"_asof_{c}" for c in val_cols + [right_ts]}
    if reserved & left_cols:
        raise ValueError(
            f"asof_join: left columns {sorted(reserved & left_cols)} clash "
            "with internal working names; rename them before joining"
        )

    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[F.col(c) for c in val_cols],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_r"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(F.when(F.col("_is_r") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in val_cols
        ],
        F.last(F.when(F.col("_is_r") == 1, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias(f"_asof_{right_ts}"),
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_asof_{c}").alias(c) for c in val_cols
    ] + [F.col(f"_asof_{right_ts}").alias(right_ts)]
    return carried.filter(F.col("_is_r") == 0).select(*out_cols)


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Banded time join: pairs where |left_ts − right_ts| ≤ band.

    Spark's optimizer turns a pure inequality join condition into a
    nested-loop join — O(n·m) comparisons, unusable at scale. The
    classic rewrite buckets time into band-sized bins: a pair within
    the band is at most one bin apart, so exploding the left side
    into its bin and both neighbors turns the range condition into an
    *equi*-join on (keys…, bin) — a plain shuffled hash join, 3×
    left-side duplication, then an exact residual filter. Linear
    work, AQE-skew-splittable. (Same strategy as Databricks' range
    join optimization / Flink's interval join.)

    ``keys`` adds equi-key columns (e.g. a user id) to the join, which
    also bounds bucket width per key. Both timestamp columns must be
    TimestampType; right-side columns must not collide with left's.
    """
    keys = list(keys or [])
    clashes = set(right.columns) & set(left.columns) - set(keys)
    if clashes:
        raise ValueError(
            f"band_join: columns {sorted(clashes)} exist on both sides; "
            "rename them before joining"
        )
    lbin = (F.unix_timestamp(F.col(left_ts)) / F.lit(band_seconds)).cast("bigint")
    rbin = (F.unix_timestamp(F.col(right_ts)) / F.lit(band_seconds)).cast("bigint")
    l = left.withColumn(
        "_bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    r = right.withColumn("_bin", rbin)
    residual = (
        F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts)))
        <= band_seconds
    )
    return l.join(r, on=keys + ["_bin"], how="inner").filter(residual).drop("_bin")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Point-in-interval join: point rows matched to every interval
    with start ≤ point < end (half-open).

    Same bucketing strategy as :func:`band_join`, generalized to
    variable-length intervals: each interval explodes into every
    bucket it overlaps (``sequence()`` on bin numbers — JVM-side, no
    UDF), points map to exactly one bucket, and the equi-join on
    (keys…, bucket) replaces the nested loop. Choose
    ``bucket_seconds`` near the typical interval length: too small
    multiplies interval duplication, too large widens candidate sets.
    """
    keys = list(keys or [])
    clashes = set(intervals.columns) & set(points.columns) - set(keys)
    if clashes:
        raise ValueError(
            f"interval_join: columns {sorted(clashes)} exist on both sides; "
            "rename them before joining"
        )
    pbin = (F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_seconds)).cast("bigint")
    sbin = (F.unix_timestamp(F.col(start_ts)) / F.lit(bucket_seconds)).cast("bigint")
    ebin = (F.unix_timestamp(F.col(end_ts)) / F.lit(bucket_seconds)).cast("bigint")
    p = points.withColumn("_bin", pbin)
    i = intervals.withColumn("_bin", F.explode(F.sequence(sbin, ebin)))
    residual = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) < F.col(end_ts)
    )
    return p.join(i, on=keys + ["_bin"], how="inner").filter(residual).drop("_bin")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: identical results to
    ``big.join(small, key, how)``, but a hot key's rows spread over
    ``n_salts`` reducers instead of landing on one.

    The big side gets a deterministic per-row salt (xxhash64 of the
    whole row, mod ``n_salts`` — stable across task retries, unlike
    ``rand()``/``monotonically_increasing_id``); the small side
    replicates once per salt via ``explode`` (n_salts× duplication —
    keep the *smaller* relation on this side). Joining on
    ``(key, _salt)`` then makes every partition of a hot key an
    independent join task.

    When to reach for this instead of AQE's skew-join split: AQE only
    rebalances *sort-merge* join partitions at runtime and can't help
    a skewed shuffled-hash join, a skewed aggregation feeding a join,
    or stream-static joins. Salting is the plan-level fix that works
    everywhere. With ``how='inner'`` or ``'left'``, semantics are
    exactly the plain join's (each big-side row still meets every
    matching small-side row exactly once — in its own salt slice).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if key in ("_salt",) or "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("column _salt already exists")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return b.join(s, on=[key, "_salt"], how=how).drop("_salt")
