"""Window-function operators (SURVEY §2 B4-B6; spec
``Stream_Analytics_Platform.md:85``): ranking, running totals, moving
averages — plus gap-based sessionization as an engine extension.

Scale notes: every window here partitions by a key
(``partitionBy``) so state stays bounded per partition and the sort is
local to each key group after one hash shuffle. Un-partitioned windows
(``Window.orderBy`` with no partition) funnel all data through a
single task — the measure library only uses those on pre-aggregated
(tiny) inputs such as daily rollups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(spec: str | Sequence[str | Column]) -> list:
    return [spec] if isinstance(spec, str) else list(spec)


def with_rank(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: str | Sequence[str | Column],
    method: str = "row_number",
    out: str = "rank",
) -> DataFrame:
    """Ranking window (B4): row_number / rank / dense_rank.

    Callers should make ``order_by`` deterministic (add a unique
    tie-break column) when downstream filters on the rank.
    """
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    if method not in fns:
        raise ValueError(f"method must be one of {sorted(fns)}")
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return df.withColumn(out, fns[method]().over(w))


def top_n(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: str | Sequence[str | Column],
    n: int,
    out: str = "rank",
) -> DataFrame:
    """Top-N per group (B37): rank then filter.

    Catalyst rewrites rank-then-filter into a per-partition top-K sort
    (WindowGroupLimit in Spark 3.5+/4.x) so each task keeps only N rows
    per key — no full sort of the group at scale.
    """
    return with_rank(df, partition_by, order_by, "row_number", out).filter(
        F.col(out) <= n
    )


def running_total(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: str | Sequence[str | Column],
    value: str | Column,
    out: str = "running_total",
) -> DataFrame:
    """Running total (B5): unbounded-preceding → current-row sum."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def moving_average(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: str | Sequence[str | Column],
    value: str | Column,
    window_rows: int,
    out: str = "moving_avg",
) -> DataFrame:
    """Moving average (B6) over the trailing ``window_rows`` rows
    (current row inclusive)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    return df.withColumn(out, F.avg(value).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    out: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event for the same user exceeds ``gap_minutes``.

    Engine extension beyond reference parity (the reference carries a
    producer-generated ``session_id`` instead). One shuffle on the
    user key; the cumulative-sum-of-boundaries trick keeps everything
    in built-in window functions — no Python in the hot path.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_sec),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("_new_session", is_new).withColumn(
        out,
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")
