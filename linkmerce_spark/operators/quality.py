"""Declarative data-quality checks — the dbt schema-test vocabulary.

The reference ships dbt projects whose ``tests/`` dirs are empty
(dbt_postgres/tests/.gitkeep) — the four canonical dbt schema tests
(not_null, unique, accepted_values, relationships) are the missing
piece a warehouse user adds on day one. This module provides them as
engine operators: each check compiles to a small aggregate, all checks
union into one violations report, and the whole report is a single
Spark job (Catalyst merges the shared scans).

Scale shape: every check is a filter+count or groupBy at most — fully
map-side-combinable, no driver round-trips; the relationships check is
a broadcast-able left-anti join when the referenced dim is small and a
plain shuffle join otherwise (AQE decides).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "unique",
    "accepted_values",
    "relationships",
    "run_checks",
]


def not_null(df: DataFrame, col: str) -> DataFrame:
    """Violations: rows where ``col`` IS NULL."""
    return df.filter(F.col(col).isNull()).agg(
        F.lit(f"not_null:{col}").alias("rule"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def unique(df: DataFrame, cols: Sequence[str] | str) -> DataFrame:
    """Violations: surplus rows inside duplicate key groups
    (``sum(cnt - 1)`` over groups with cnt > 1 — 0 when unique)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    grouped = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return grouped.filter(F.col("__c") > 1).agg(
        F.lit("unique:" + ",".join(cols)).alias("rule"),
        F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).cast("long").alias(
            "n_violations"
        ),
    )


def accepted_values(df: DataFrame, col: str, values: Sequence[str]) -> DataFrame:
    """Violations: non-null values outside the accepted set."""
    return df.filter(
        F.col(col).isNotNull() & ~F.col(col).isin(list(values))
    ).agg(
        F.lit(f"accepted_values:{col}").alias("rule"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def relationships(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Violations: non-null foreign keys with no referenced row
    (orphans) — dbt's relationships test, as a left-anti join."""
    orphans = df.filter(F.col(col).isNotNull()).join(
        ref.select(F.col(ref_col).alias(col)).distinct(), col, "left_anti"
    )
    return orphans.agg(
        F.lit(f"relationships:{col}").alias("rule"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the per-check reports into one (rule, n_violations) frame."""
    return reduce(lambda a, b: a.unionByName(b), checks)
