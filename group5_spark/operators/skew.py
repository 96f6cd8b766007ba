"""Skew-handling operators (SURVEY §4: "Skew handling (hot users from
weighted generators) → AQE skew join").

AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`, on by
default in the session factory) is the first line of defense — it
splits oversized shuffle partitions after the map stage. Salting is
the *static* fallback for the cases AQE can't fix:

- a single join key so hot that even a split partition's build side
  overflows one task (AQE splits partitions, not keys);
- stateful/window operators where all rows of one key must meet in one
  task unless the computation is decomposed explicitly.

These helpers implement the decomposition: spread one logical key over
``n_salts`` physical keys, replicate the small side per salt, and (for
aggregation) recombine with a second reduce over the unsalted key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join where ``skewed`` has hot keys: salt the skewed
    side into ``n_salts`` buckets and replicate ``other`` once per
    bucket, so a hot key's rows land on ``n_salts`` tasks instead of
    one.

    Cost model: ``other`` is shuffled/built ``n_salts`` times — use
    only when the hot key's row count dwarfs ``other``'s total size
    (the classic power-law user_id case). For plain size skew prefer
    AQE's skew join; for small ``other`` prefer a broadcast join,
    which needs no salting at all.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, on=keys + [SALT_COL], how="inner").drop(
        SALT_COL
    )


def salted_sum_count(
    df: DataFrame,
    keys: str | Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation: SUM/COUNT per key with the first
    shuffle spread over ``(key, salt)``.

    Spark's hash aggregate already does map-side partial combine, so
    plain ``groupBy`` skew is rare — this explicit decomposition is
    for the residual case where one key's *partial* states are still
    too many for one reduce task (extreme cardinality × hot key).
    Output columns: ``sum_<col>`` per value column plus ``n_rows``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(SALT_COL, (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*key_list, SALT_COL).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )
    return partial.groupBy(*key_list).agg(
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("n_rows").alias("n_rows"),
    )
