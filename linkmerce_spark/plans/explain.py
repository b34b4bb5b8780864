"""Physical-plan inspection helpers.

Performance is a correctness dimension at 100 TB: a query whose filters
don't reach the parquet scan, or that shuffles a broadcastable dim, is
wrong even when the rows are right. These helpers turn ``.explain``
output into assertable facts so tests can pin the plan shape (tests/
test_plans.py does exactly that).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "count_shuffles",
    "count_keyed_shuffles",
    "has_broadcast_join",
    "pushed_filters",
]


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"\bExchange\b", plan))


def count_keyed_shuffles(df: DataFrame) -> int:
    """Exchange operators that move data BY KEY (hash/range).

    Excludes round-robin repartitions — those are ``widen_scan``'s
    scan-parallelism adjustments (no-ops at real scale, where the scan
    already has enough splits), not part of an operator's data-keyed
    shuffle budget. Plan pins on shuffle counts should use this.
    """
    plan = physical_plan(df, "simple")
    total = len(re.findall(r"\bExchange\b", plan))
    rr = len(re.findall(r"Exchange RoundRobinPartitioning", plan))
    return total - rr


def has_broadcast_join(df: DataFrame) -> bool:
    """True when the plan contains a BroadcastHashJoin."""
    return "BroadcastHashJoin" in physical_plan(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every file scan in the plan."""
    plan = physical_plan(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
