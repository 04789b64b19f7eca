"""Physical-plan inspection helpers.

The 100 TB design discipline is enforceable: these helpers let tests
assert that a filter reached the parquet scan, a dimension join went
broadcast, a projection pruned the scan schema, and a pipeline didn't
pick up gratuitous exchanges. Used by tests/test_plans.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the formatted plan shows non-empty PushedFilters
    containing every needle (column names, typically)."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    if not pushed.strip():
        return False
    return all(n in pushed for n in needles)


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Column names in the parquet scan's ReadSchema (pruning check)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(f.split(":")[0].strip() for f in m.group(1).split(",") if f)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (AQE may
    remove some at runtime; this is the static upper bound)."""
    return explain_str(df, "simple").count("Exchange")
