"""Column-manipulation operators (SURVEY §2 B10-B13, B17; spec
``Stream_Analytics_Platform.md:87,91``): add / remove / rename / cast,
plus the caching policy the reference spec requires but its code never
implemented (``etl_job.py`` runs 3 actions per entity with no cache —
the plan re-executes each time, SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType
from pyspark.storagelevel import StorageLevel


def add_column(df: DataFrame, name: str, expr: Column | str) -> DataFrame:
    """withColumn (B10); accepts a Column or a SQL expression string."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    return df.withColumn(name, col)


def drop_columns(df: DataFrame, *names: str) -> DataFrame:
    """drop (B11)."""
    return df.drop(*names)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Bulk rename (B12) in a single projection (one withColumnsRenamed
    call, not N chained withColumnRenamed — avoids N plan nodes)."""
    return df.withColumnsRenamed(dict(mapping))


def cast_columns(df: DataFrame, mapping: Mapping[str, DataType | str]) -> DataFrame:
    """Bulk cast (B13) in a single projection."""
    return df.withColumns(
        {name: F.col(name).cast(dtype) for name, dtype in mapping.items()}
    )


@contextmanager
def cached(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> Iterator[DataFrame]:
    """Caching policy (B17): persist for a multi-action scope, always
    unpersist on exit.

    Fixes the reference's triple plan re-execution
    (``etl_job.py:66-76``: count + write + head re-scan the input 3×).

    Usage::

        with cached(expensive_df) as df:
            n = df.count()
            df.write.parquet(path)
    """
    df.persist(level)
    try:
        yield df
    finally:
        df.unpersist()
