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

Two further match shapes (Calcite's "union of views" cousins):

- **Filtered-MV subsumption.** An MV built over ``WHERE P_mv`` serves a
  query ``WHERE P_q`` when the MV's row set contains the query's —
  every MV conjunct is implied by a query conjunct on the same column
  (``x >= '1997'`` implies ``x >= '1996'``) — AND every query conjunct
  not already enforced by the MV references a *grouping* column, so the
  residual filter can run against the summary rows. A residual on a
  non-grouped column is unanswerable post-aggregation and refuses.
- **Join-MV (pre-joined star).** A summary over ``fact ⋈ dims`` is
  declared with :func:`join_source`, which canonicalizes (table set,
  equi-key set) into the MV's ``source`` string. A query over the same
  join shape canonicalizes identically and all grain/measure/predicate
  matching applies unchanged — at 100 TB this erases both the fact
  scan and the join.

Reference parity: the reference pre-aggregates ``agg_daily_revenue``
but every dashboard query still hand-picks its table; here the
*engine* routes automatically, so callers always ask the base question.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MVCatalog", "join_source"]

_DECOMPOSABLE = {"sum", "count", "min", "max"}
_ROLLUP = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def join_source(tables: list[str], on: list[tuple[str, str]]) -> str:
    """Canonical source id for a pre-joined star: order-insensitive
    over both the table set and the equi-key pairs, so
    ``join_source(["orders","customer"], [("o_custkey","c_custkey")])``
    and the flipped spelling name the same MV."""
    t = ",".join(sorted(tables))
    k = ",".join(sorted("=".join(sorted(pair)) for pair in on))
    return f"join({t};{k})"


# Predicate conjuncts are (col, op, value) with op ∈ =, >=, >, <=, <, in.
# Values must be of one comparable type per column (numbers, or ISO
# strings for dates — same normalization the snapshot pruner uses).
_OPS = {"=", ">=", ">", "<=", "<", "in"}


def _implies(q: tuple, m: tuple) -> bool:
    """True iff query conjunct q guarantees MV conjunct m (same col).

    Sound, not complete: unhandled op pairs return False and the
    rewrite falls back to base — never an incorrect serve.
    """
    qc, qop, qv = q
    mc, mop, mv = m
    if qc != mc:
        return False
    if (qop, qv) == (mop, mv):
        return True
    try:
        if mop == ">=":
            return (qop in (">=", ">") and qv >= mv) or (qop == "=" and qv >= mv)
        if mop == ">":
            return (qop == ">" and qv >= mv) or (qop == ">=" and qv > mv) or (
                qop == "=" and qv > mv
            )
        if mop == "<=":
            return (qop in ("<=", "<") and qv <= mv) or (qop == "=" and qv <= mv)
        if mop == "<":
            return (qop == "<" and qv <= mv) or (qop == "<=" and qv < mv) or (
                qop == "=" and qv < mv
            )
        if mop == "in":
            if qop == "=":
                return qv in mv
            if qop == "in":
                return set(qv) <= set(mv)
    except TypeError:
        return False
    return False


def _conjunct_expr(c: tuple):
    col, op, val = c
    if op == "in":
        return F.col(col).isin(list(val))
    return {
        "=": F.col(col) == F.lit(val),
        ">=": F.col(col) >= F.lit(val),
        ">": F.col(col) > F.lit(val),
        "<=": F.col(col) <= F.lit(val),
        "<": F.col(col) < F.lit(val),
    }[op]


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
        predicate: list[tuple] | None = None,
    ) -> dict:
        for agg, _ in measures.values():
            if agg not in _DECOMPOSABLE:
                raise ValueError(
                    f"{agg!r} is not decomposable; an MV carrying it "
                    "could not serve coarser grains"
                )
        for c in predicate or []:
            if c[1] not in _OPS:
                raise ValueError(f"unsupported predicate op {c[1]!r}")
        mv = {
            "name": name,
            "source": source,
            "group_cols": list(group_cols),
            "measures": dict(measures),
            "path": path,
            "predicate": [tuple(c) for c in predicate or []],
        }
        self._views.append(mv)
        return mv

    def build(self, base_df: DataFrame, mv: dict) -> None:
        """Materialize the summary parquet from the base table (full
        build; incremental refresh via medallion.incremental). For a
        join-MV, pass the pre-joined DataFrame."""
        df = base_df
        for c in mv["predicate"]:
            df = df.filter(_conjunct_expr(c))
        aggs = [
            _base_agg(agg, col).alias(out)
            for out, (agg, col) in mv["measures"].items()
        ]
        df.groupBy(*mv["group_cols"]).agg(*aggs).write.mode(
            "overwrite"
        ).parquet(mv["path"])

    # ---- matching ----

    def _serves(self, mv: dict, source: str, group_cols, measures, predicate):
        """Return the residual conjuncts to apply on the summary, or
        None if this MV cannot serve the query."""
        if mv["source"] != source:
            return None
        if not set(group_cols) <= set(mv["group_cols"]):
            return None
        have = {(a, c) for a, c in mv["measures"].values()}
        for agg, col in measures.values():
            if (agg, col) in have:
                continue
            if agg == "avg" and ("sum", col) in have and ("count", col) in have:
                # AVG derivable only from sum + NON-NULL count of the
                # SAME column; a row count would miscount NULLs.
                continue
            return None
        # Subsumption: the MV's row set must contain the query's —
        # every MV conjunct implied by some query conjunct...
        query = [tuple(c) for c in predicate or []]
        for m in mv["predicate"]:
            if not any(_implies(q, m) for q in query):
                return None
        # ...and every query conjunct the MV hasn't already enforced
        # must be applicable to the summary rows (grouping column).
        residual = [q for q in query if q not in mv["predicate"]]
        if any(q[0] not in mv["group_cols"] for q in residual):
            return None
        return residual

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
        predicate: list[tuple] | None = None,
    ) -> tuple[DataFrame, str | None]:
        """Answer ``SELECT group_cols, measures FROM source [WHERE
        predicate] GROUP BY group_cols`` — from a matching summary
        table when one exists, else from ``base_df``. Returns
        ``(result, mv_name_or_None)`` so callers/tests can see which
        path served the query. For a join query, pass
        ``source=join_source(...)`` and the joined df as ``base_df``.
        """
        for mv in self._views:
            if not Path(mv["path"]).exists():
                continue
            residual = self._serves(mv, source, group_cols, measures, predicate)
            if residual is None:
                continue
            summary = spark.read.parquet(mv["path"])
            for c in residual:
                summary = summary.filter(_conjunct_expr(c))
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
        fallback = base_df
        for c in predicate or []:
            fallback = fallback.filter(_conjunct_expr(c))
        aggs = []
        for out, (agg, col) in measures.items():
            if agg == "avg":
                aggs.append(F.avg(col).alias(out))
            else:
                aggs.append(_base_agg(agg, col).alias(out))
        return fallback.groupBy(*group_cols).agg(*aggs), None
