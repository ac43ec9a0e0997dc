"""Physical-plan assertions used by tests and perf iteration.

The 100 TB checklist (applied per operator before it's called done):
filters pushed to the scan, columns pruned, small dims broadcast, no
Python eval nodes in hot paths, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_python_eval(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BatchEvalPython" in plan or ("ArrowEvalPython" in plan)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters/ReadSchema section of the formatted plan — eyeball
    (or assert) that predicates and pruning reached the parquet scan."""
    plan = explain_str(df, "formatted")
    return "\n".join(
        line for line in plan.splitlines() if "PushedFilters" in line or "ReadSchema" in line
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_cartesian(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
