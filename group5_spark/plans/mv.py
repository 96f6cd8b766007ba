"""Materialized-view rewrite: answer aggregations from a pre-built
summary table whenever one matches — the OLAP acceleration behind
Calcite's materialized-view matching, Snowflake MVs, and BI cube
engines.

Why this matters at 100 TB: the measure library's dashboard queries
re-aggregate the same fact table along a handful of grouping columns
all day. A summary table grouped at the finest shared grain answers
every coarser query by RE-aggregating partial states — scanning the
~10⁵-row summary instead of the 100 TB fact. The rewrite is sound for
decomposable aggregates:

- ``SUM(x)``   = SUM of partial sums
- ``COUNT(*)`` = SUM of partial counts (declare as ``("count", "*")``)
- ``COUNT(x)`` = SUM of partial non-null counts (``("count", x)``)
- ``MIN/MAX``  = MIN/MAX of partial mins/maxs
- ``AVG(x)``   = SUM(sum_x) / SUM(count_x) — derived, so an MV serves
  AVG it never declared, but ONLY when it carries BOTH the sum and
  the *non-null count of the same column*. A row count is not a valid
  denominator: ``F.avg`` ignores NULLs, so SUM(x)/COUNT(*) diverges
  from AVG(x) on any nullable column. The matcher therefore refuses
  the AVG rewrite unless ``("count", x)`` itself is materialized.

Non-decomposable aggregates (COUNT DISTINCT, percentiles) correctly
refuse the rewrite and fall back to the base table. Freshness is the
deal you sign with any MV; pair with
:func:`group5_spark.medallion.incremental.refresh_aggregate` to keep
summaries current per changed partition.

Reference parity: the reference pre-aggregates ``agg_daily_revenue``
but every dashboard query still hand-picks its table; here the
*engine* routes automatically, so callers always ask the base question.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MVCatalog"]

_DECOMPOSABLE = {"sum", "count", "min", "max"}
_ROLLUP = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _base_agg(agg: str, col: str):
    if agg == "count":
        # "*" counts rows; a column name counts its non-null values
        # (the AVG-safe denominator).
        return F.count(F.lit(1)) if col == "*" else F.count(col)
    return getattr(F, agg)(col)


class MVCatalog:
    """Registry of summary tables + the query-rewrite matcher.

    A view is declared by its source table name, grouping columns, and
    measures ``{out_col: (agg, src_col)}`` with ``agg`` ∈
    sum|count|min|max (``count`` counts rows; pass ``"*"``).
    """

    def __init__(self) -> None:
        self._views: list[dict] = []

    def register(
        self,
        name: str,
        source: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str]],
        path: str,
    ) -> dict:
        for agg, _ in measures.values():
            if agg not in _DECOMPOSABLE:
                raise ValueError(
                    f"{agg!r} is not decomposable; an MV carrying it "
                    "could not serve coarser grains"
                )
        mv = {
            "name": name,
            "source": source,
            "group_cols": list(group_cols),
            "measures": dict(measures),
            "path": path,
        }
        self._views.append(mv)
        return mv

    def build(self, base_df: DataFrame, mv: dict) -> None:
        """Materialize the summary parquet from the base table (full
        build; incremental refresh via medallion.incremental)."""
        aggs = [
            _base_agg(agg, col).alias(out)
            for out, (agg, col) in mv["measures"].items()
        ]
        base_df.groupBy(*mv["group_cols"]).agg(*aggs).write.mode(
            "overwrite"
        ).parquet(mv["path"])

    # ---- matching ----

    def _serves(self, mv: dict, source: str, group_cols, measures) -> bool:
        if mv["source"] != source:
            return False
        if not set(group_cols) <= set(mv["group_cols"]):
            return False
        have = {(a, c) for a, c in mv["measures"].values()}
        for agg, col in measures.values():
            if (agg, col) in have:
                continue
            if agg == "avg" and ("sum", col) in have and ("count", col) in have:
                # AVG derivable only from sum + NON-NULL count of the
                # SAME column; a row count would miscount NULLs.
                continue
            return False
        return True

    def _mv_col(self, mv: dict, agg: str, col: str) -> str:
        for out, (a, c) in mv["measures"].items():
            if (a, c) == (agg, col):
                return out
        raise KeyError((agg, col))

    def aggregate(
        self,
        spark: SparkSession,
        source: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, str]],
        base_df: DataFrame,
    ) -> tuple[DataFrame, str | None]:
        """Answer ``SELECT group_cols, measures FROM source GROUP BY
        group_cols`` — from a matching summary table when one exists,
        else from ``base_df``. Returns ``(result, mv_name_or_None)``
        so callers/tests can see which path served the query.
        """
        for mv in self._views:
            if not Path(mv["path"]).exists():
                continue
            if not self._serves(mv, source, group_cols, measures):
                continue
            summary = spark.read.parquet(mv["path"])
            outs = []
            for out, (agg, col) in measures.items():
                if agg == "avg":
                    s = self._mv_col(mv, "sum", col)
                    n = self._mv_col(mv, "count", col)
                    outs.append(
                        (F.sum(s) / F.sum(n)).alias(out)
                    )
                else:
                    outs.append(
                        _ROLLUP[agg](self._mv_col(mv, agg, col)).alias(out)
                    )
            return summary.groupBy(*group_cols).agg(*outs), mv["name"]
        aggs = []
        for out, (agg, col) in measures.items():
            if agg == "avg":
                aggs.append(F.avg(col).alias(out))
            else:
                aggs.append(_base_agg(agg, col).alias(out))
        return base_df.groupBy(*group_cols).agg(*aggs), None
