"""Physical-plan inspection helpers — the scale-readiness feedback loop.

Used by tests to assert plan properties that matter at 100 TB:
filters pushed to the parquet scan, small joins broadcast, aggregates
split partial/final, no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"{needle!r} not in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"unwanted {needle!r} in plan:\n{plan}"
