"""Set operators (SURVEY §2 B7-B9; spec ``Stream_Analytics_Platform.md:86``).

The reference's event schemas are sparse (conditional columns appear
only on some event types, ``user_events_producer.py:91-98``), so
positional ``union`` silently misaligns columns. ``union_by_name``
resolves by name and fills missing columns with nulls — the only safe
union over drifting schemas.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """Bag union of N frames, resolved by column name (B7)."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """SQL UNION (distinct) semantics."""
    return union_by_name(*dfs).dropDuplicates()


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    """Set intersection, distinct semantics (B8)."""
    return left.intersect(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Multiset difference — keeps duplicate multiplicity (B9)."""
    return left.exceptAll(right)


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """Set difference, distinct semantics (B9)."""
    return left.subtract(right)
