"""Physical-plan shape assertions.

Correctness says the answer is right; these checks say the *plan* is
the one that survives 100 TB (SURVEY.md §4.2): filters and column
pruning reach the parquet scan, small sides broadcast, sort+limit
compiles to TakeOrderedAndProject, expressions stay inside
whole-stage codegen. Used by tests/test_plan_shapes.py so plan
regressions fail CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    # Wrap in a no-op projection (collapsed by the optimizer) so the
    # explain always renders the *initial* physical plan: the shared
    # prepared-plan DataFrame may already have executed, and explain
    # on an executed AQE plan shows the final adaptive rewrite
    # (ShuffleQueryStage/AQEShuffleRead) instead of the shape under test.
    fresh = df.select("*")
    return fresh._sc._jvm.PythonSQLUtils.explainString(
        fresh._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"plan missing {needle!r}:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"plan should not contain {needle!r}:\n{plan}"
    return plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] line(s) of the scan nodes."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema_width(df: DataFrame) -> list[str]:
    """ReadSchema lines — how many columns actually leave parquet."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    ]
