"""Declarative data-quality constraint checks (Deequ-lite): not-null,
uniqueness, accepted values, numeric ranges, regex shape — the
validation layer a medallion pipeline runs between silver and gold
(generalizes the reference's row-count output validation,
reference `Assets/Jobs/etl_job.py:66-76` count-after-write checks,
into named, per-constraint verdicts).

Scale design: every row-local check (not_null / accepted_values /
range / regex) compiles into one conditional-sum column of a SINGLE
aggregation over one scan — adding checks never adds scans. Only
uniqueness checks shuffle (one hash aggregation on the checked key
each), and their result is reduced map-side first. Output is one tiny
row per check, never row-level violation dumps (collecting violating
rows at 100 TB is a job, not a report — use the returned predicate
columns to write a quarantine table if needed).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "not_null", "unique", "accepted_values", "in_range",
           "matches", "run_checks"]


@dataclass(frozen=True)
class Check:
    """One named constraint over one column."""

    name: str
    column: str
    kind: str  # not_null | unique | accepted_values | in_range | matches
    params: tuple = field(default_factory=tuple)

    def violation_predicate(self) -> Column:
        """Row-level predicate marking a VIOLATION (row-local kinds)."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "accepted_values":
            return ~c.isin(list(self.params)) | c.isNull()
        if self.kind == "in_range":
            lo, hi = self.params
            pred = F.lit(False)
            if lo is not None:
                pred = pred | (c < F.lit(lo))
            if hi is not None:
                pred = pred | (c > F.lit(hi))
            return pred | c.isNull()
        if self.kind == "matches":
            (pattern,) = self.params
            return ~c.rlike(pattern) | c.isNull()
        raise ValueError(f"{self.kind} has no row-level predicate")


def not_null(column: str, name: str | None = None) -> Check:
    return Check(name or f"{column}_not_null", column, "not_null")


def unique(column: str, name: str | None = None) -> Check:
    return Check(name or f"{column}_unique", column, "unique")


def accepted_values(column: str, values: tuple, name: str | None = None) -> Check:
    return Check(name or f"{column}_accepted", column, "accepted_values", values)


def in_range(
    column: str, lo=None, hi=None, name: str | None = None
) -> Check:
    return Check(name or f"{column}_range", column, "in_range", (lo, hi))


def matches(column: str, pattern: str, name: str | None = None) -> Check:
    return Check(name or f"{column}_shape", column, "matches", (pattern,))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks; one output row per check:
    ``(check_name, col_name, kind, n_violations, passed)``.

    Row-local checks share one aggregation pass; each uniqueness check
    adds one keyed aggregation. Results union into a tiny report frame
    (rows = number of checks).
    """
    local = [c for c in checks if c.kind != "unique"]
    uniques = [c for c in checks if c.kind == "unique"]
    parts: list[DataFrame] = []
    if local:
        aggs = [
            F.sum(c.violation_predicate().cast("bigint")).alias(c.name)
            for c in local
        ]
        row = df.agg(*aggs)
        # unpivot the single agg row into one row per check
        stacked = row.unpivot(
            ids=[], values=[c.name for c in local],
            variableColumnName="check_name", valueColumnName="n_violations",
        )
        meta = [(c.name, c.column, c.kind) for c in local]
        meta_df = df.sparkSession.createDataFrame(
            meta, ["check_name", "col_name", "kind"]
        )
        parts.append(stacked.join(F.broadcast(meta_df), "check_name"))
    for c in uniques:
        dupes = (
            df.groupBy(c.column)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias(
                "n_violations"))
            .select(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("col_name"),
                F.lit(c.kind).alias("kind"),
                F.col("n_violations").cast("bigint"),
            )
        )
        parts.append(dupes)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name", "col_name", "kind",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
