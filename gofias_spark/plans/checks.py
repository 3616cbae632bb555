"""Physical-plan assertions — keep Catalyst doing what we designed for.

SURVEY.md §4.3: the engine relies on (not re-implements) predicate pushdown,
partition pruning, broadcast joins, and TakeOrderedAndProject. These helpers
make those properties testable so a regression (e.g. a filter that stops
reaching the parquet scan) fails CI instead of silently costing 100x at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (e.g. a column name)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read by the (first) parquet scan — column-pruning
    check."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            return [c.split(":")[0] for c in inner.split(",") if c]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)
