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
