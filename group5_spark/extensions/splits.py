"""Deterministic dataset splitting for training pipelines.

A training-data pipeline needs train/val/test assignment that is
(1) deterministic — re-running the pipeline reproduces the split;
(2) stable under growth — adding documents never reassigns existing
ones (no `rand()`, no row-number modulo, both of which reshuffle on
re-partition or insert); (3) key-consistent — all rows of one
document/user land in the same split (no leakage between splits of
near-identical rows that share a key).

The standard construction: hash the key, map the hash into [0, 1),
cut at the cumulative split fractions. Implemented here over the
*hex string prefix* of md5 — lexicographic comparison of fixed-width
lowercase hex equals numeric comparison, is engine-portable (DuckDB
has md5 too — the registry query cross-checks it), and is a pure
codegen expression: zero shuffle, zero UDF, linear scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "split_bounds", "temperature_resample"]

_PREFIX_LEN = 8  # 32 bits of the digest: granularity 1/2^32


def split_bounds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative-fraction cut points as fixed-width hex strings.

    ``{"train": .8, "val": .1, "test": .1}`` →
    ``[("train", "cccccccc"), ("val", "e6666666"), ("test", "ffffffff")]``
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bounds = []
    acc = 0.0
    names = list(splits)
    hi = (1 << (4 * _PREFIX_LEN)) - 1
    for i, name in enumerate(names):
        acc += splits[name]
        # inclusive upper bound: bucket <= cut ⇔ bucket < acc·2³²
        cut = hi if i == len(names) - 1 else max(0, min(hi, int(acc * (hi + 1)) - 1))
        bounds.append((name, format(cut, f"0{_PREFIX_LEN}x")))
    return bounds


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _PREFIX_LEN
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashing ``key_col``.

    ``salt`` derives independent splits from the same keys (e.g. a
    fresh holdout per experiment) — change the salt, get a fresh
    uncorrelated assignment, still deterministic.
    """
    bucket = _bucket(F.col(key_col), salt)
    expr: Column | None = None
    for name, cut in split_bounds(splits):
        cond = bucket <= F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # numerically the last bound is the max hex value, so the chain is
    # exhaustive; otherwise() guards rounding pathologies only
    return df.withColumn(out_col, expr.otherwise(list(splits)[-1]))


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "",
    rate_col: str = "keep_rate",
) -> DataFrame:
    """Temperature-based corpus rebalancing: keep each row of stratum
    *l* with probability ``(p_l^(alpha-1)) / max_m(p_m^(alpha-1))``
    where ``p_l`` is the stratum's corpus share — the multilingual
    up/down-sampling rule (sampling ∝ p^alpha, rarest stratum kept in
    full). ``alpha=1`` keeps everything; ``alpha→0`` approaches
    uniform-over-strata.

    Deterministic: the keep/drop decision hashes ``key_col`` (same
    md5-prefix bucket as :func:`hash_split`), so re-runs and engine
    ports reproduce row-for-row. Two tiny aggregations compute the
    per-stratum rates (k rows — broadcast back); the corpus itself
    sees one broadcast join + map-side filter, no shuffle of data
    rows at any scale.

    For ``alpha=0.5`` the weight is computed as ``1/sqrt(p)`` —
    ``sqrt`` is IEEE correctly-rounded in every engine, while ``pow``
    may differ by 1 ulp across libm implementations, which would make
    boundary rows engine-dependent.
    """
    p = F.col("_n") / F.col("_total")
    if alpha == 0.5:
        weight = F.lit(1.0) / F.sqrt(p)
    else:
        weight = F.pow(p, F.lit(alpha - 1.0))
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").cast("double").alias("_total"))
    weighted = counts.crossJoin(F.broadcast(total)).select(
        strata_col, weight.alias("_w")
    )
    wmax = weighted.agg(F.max("_w").alias("_wmax"))
    rates = weighted.crossJoin(F.broadcast(wmax)).select(
        strata_col, (F.col("_w") / F.col("_wmax")).alias(rate_col)
    )
    u = F.conv(_bucket(F.col(key_col), salt), 16, 10).cast("bigint")
    return df.join(F.broadcast(rates), strata_col).filter(
        u < F.col(rate_col) * F.lit(float(1 << 32))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): each row kept
    with its stratum's probability. Map-only (no shuffle), one pass,
    deterministic for a fixed seed+partitioning — use for quick
    class-rebalanced subsets where approximate per-stratum counts are
    acceptable."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly-n-per-stratum sample, deterministic and seedable.

    Rows are ranked inside each stratum by the md5 hash of their key
    (+salt) — a uniform, reproducible shuffle order — and the first n
    kept. One shuffle on the stratum column; the sort is per-stratum.
    Unlike ``sampleBy`` this guarantees exact counts (class-balanced
    eval sets, per-language caps in corpus curation) and, like
    hash_split, never changes a row's fate when other rows arrive:
    membership only changes if a new row hashes into the top n.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
