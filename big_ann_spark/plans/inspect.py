"""Physical-plan inspection helpers — used by the plan-shape tests and
for interactive `.explain` iteration (the build rule: after an operator
works, explain it and iterate until it's the plan you'd want)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Executed-plan tree as text. Note: under AQE the final plan (with
    codegen stage markers ``*(n)``) only exists after an action."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text: shows PushedFilters / PartitionFilters
    / ReadSchema per scan — the pushdown audit surface."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_no_shuffle_below_join(plan: str) -> None:
    join_idx = plan.index("Join")
    assert "Exchange hashpartitioning" not in plan[join_idx:], plan


def count_exchanges(plan: str) -> int:
    return plan.count("Exchange ")
