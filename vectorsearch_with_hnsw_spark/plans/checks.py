"""Physical-plan assertions: the engine's scale contract, testable.

``explain("formatted")`` text is stable enough to assert the properties
that matter at 100 TB: filters reaching the parquet scan (PushedFilters),
column pruning (ReadSchema), broadcast joins for dimension tables, and
whole-stage codegen coverage. tests/test_plans.py uses these to fail the
build if a plan regresses into a full-scan or a sort-merge join of a
small dim table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some parquet scan pushes a filter mentioning fragment."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line and "[]" not in line.split("PushedFilters")[-1][:4]
        for line in plan.splitlines()
    )


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan (pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            out.append([f.split(":")[0].strip() for f in inner.split(",") if f])
    return out


def count_occurrences(df: DataFrame, token: str) -> int:
    return formatted_plan(df).count(token)


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_occurrences(df, "BroadcastHashJoin") > 0


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans in the *executed* plan (AQE hides them
    in the formatted pre-execution plan, so materialize first)."""
    df.foreach(lambda _: None)  # force execution so AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("WholeStageCodegen") + plan.count("*(")
