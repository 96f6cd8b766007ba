"""Physical-plan inspection utilities (SURVEY §4 scale contract).

Codifies "is this the plan you'd want at 100 TB?" as assertions the
test suite runs on every headline query:

- filters reach the parquet scan (``PushedFilters``),
- scans read only referenced columns (``ReadSchema`` width),
- dimension joins broadcast (no fact-side shuffle),
- shuffle (Exchange) count stays at the plan's theoretical minimum,
- whole-stage codegen covers the hot path.

These run against the *executed* plan string — the same thing a human
reads from ``df.explain("formatted")`` — so regressions in partition
strategy or join selection fail CI instead of surfacing as a 10× slowdown
at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain output (analysis-time physical plan)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads."""
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    return [
        [c.split(":")[0] for c in s.split(",") if c.strip()] for s in schemas
    ]


def num_shuffles(df: DataFrame) -> int:
    """Count of shuffle exchanges (excludes broadcast exchanges):
    the formatted plan prints one ``(N) Exchange`` header per shuffle."""
    return len(
        re.findall(r"^\(\d+\) Exchange\s*$", formatted_plan(df), flags=re.M)
    )


def num_broadcast_joins(df: DataFrame) -> int:
    """One ``(N) BroadcastHashJoin`` header per join node (the tree
    summary at the top repeats names — count headers only)."""
    return len(
        re.findall(
            r"^\(\d+\) BroadcastHashJoin", formatted_plan(df), flags=re.M
        )
    )


def num_sort_merge_joins(df: DataFrame) -> int:
    return len(
        re.findall(r"^\(\d+\) SortMergeJoin", formatted_plan(df), flags=re.M)
    )


def has_codegen(df: DataFrame) -> bool:
    """Whole-stage codegen check: execute (finalizing the adaptive
    plan), then look for the ``*(n)`` codegen-stage markers."""
    df.collect()
    plan = simple_plan(df)
    return "*(" in plan


def assert_scan_pruned(df: DataFrame, table_cols: int, max_cols: int) -> None:
    """Fail when any scan reads more than ``max_cols`` columns of a
    ``table_cols``-wide table (column pruning regression)."""
    widths = [len(s) for s in read_schemas(df)]
    assert widths, "no parquet scans found in plan"
    worst = max(widths)
    assert worst <= max_cols, (
        f"scan reads {worst}/{table_cols} columns, expected ≤ {max_cols}: "
        f"{read_schemas(df)}"
    )


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Fail unless some pushed filter mentions ``fragment``."""
    pushed = pushed_filters(df)
    assert any(fragment in p for p in pushed), (
        f"no pushed filter contains {fragment!r}; pushed={pushed}"
    )


def assert_no_fact_shuffle_join(df: DataFrame) -> None:
    """Dimension joins must broadcast: zero SortMergeJoin in the plan."""
    smj = num_sort_merge_joins(df)
    assert smj == 0, f"expected broadcast-only joins, found {smj} SortMergeJoin(s)"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    actual = num_shuffles(df)
    assert actual <= n, (
        f"plan has {actual} shuffles, budget is {n}:\n{formatted_plan(df)[:2000]}"
    )
