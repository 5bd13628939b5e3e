"""Physical-plan introspection helpers.

The 100 TB design intent is encoded in the *plan*, not just the results:
dims must broadcast, filters must reach the parquet scan, hot expressions
must stay inside whole-stage codegen.  These helpers turn those properties
into assertions so plan regressions fail tests, not production runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "has_sort_merge_join",
    "wholestage_codegen_spans",
]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines from every parquet scan node."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


import re


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count plan nodes inside whole-stage codegen.  In 'formatted' explain
    output codegen membership is the ``*`` prefix on tree nodes (e.g.
    ``+- * HashAggregate (9)``), not a literal WholeStageCodegen node."""
    return len(re.findall(r"^\s*(?:[+:|\\-]+\s)?\* \w", formatted_plan(df), re.M))
